package graft.fit

import graft.slope._

/** Driver-side scorer over encoded flat arrays — the in-memory twin of
  * [[SlopeModel.score]] (reference R/score.R:29-166), used by the local CV
  * substrate so a sub-threshold cross-validation never launches per-measure
  * cluster jobs. Measure formulas, clamps, link guards and tie handling
  * mirror the DataFrame implementation exactly (same `MathUtil` guards, same
  * first-max argmax, same average-rank Wilcoxon AUC).
  *
  * Labels arrive ENCODED as the estimator stores them: gaussian/poisson raw,
  * binomial ±1 over sorted classes, multinomial one-hot over the first m−1
  * sorted classes (all-zeros row = reference class).
  */
object LocalScore {

  def score(model: SlopeModel, yEnc: Array[Double], x: Array[Double],
            n: Int, pFeat: Int, measure: String): Array[Double] = {
    val fam = model.family
    val betas = model.coef()
    val ic = if (model.fit.intercept) 1 else 0
    val mT = betas.head.cols

    def link(i: Int, b: breeze.linalg.DenseMatrix[Double], j: Int): Double = {
      var acc = if (ic == 1) b(0, j) else 0.0
      var c = 0
      while (c < pFeat) { acc += x(i * pFeat + c) * b(ic + c, j); c += 1 }
      acc
    }

    measure match {
      case "auc" =>
        require(fam == Binomial, "auc is binomial-only")
        betas.indices.map { k =>
          val b = betas(k)
          val probs = Array.tabulate(n)(i => MathUtil.sigmoid(link(i, b, 0)))
          auc(probs, Array.tabulate(n)(i => if (yEnc(i) > 0) 1.0 else 0.0))
        }.toArray
      case _ =>
        betas.indices.map { k =>
          val b = betas(k)
          var acc = 0.0
          var i = 0
          while (i < n) {
            acc += rowScore(fam, measure, i, b, link, yEnc, mT)
            i += 1
          }
          acc / n.toDouble
        }.toArray
    }
  }

  private def rowScore(fam: Family, measure: String, i: Int,
                       b: breeze.linalg.DenseMatrix[Double],
                       link: (Int, breeze.linalg.DenseMatrix[Double], Int) => Double,
                       yEnc: Array[Double], mT: Int): Double = fam match {
    case Multinomial =>
      // softmax over m−1 targets + implicit 0 reference class, then the
      // reference's class-mean mse/mae, capped deviance, first-max misclass
      val lps = Array.tabulate(mT)(j => link(i, b, j))
      val lse = MathUtil.logSumExp0(lps)
      val nCls = mT + 1
      val probs = Array.tabulate(nCls)(j =>
        if (j < mT) math.exp(lps(j) - lse) else math.exp(-lse))
      var refHot = 1.0
      val y = Array.tabulate(nCls) { j =>
        if (j < mT) { val v = yEnc(i * mT + j); refHot -= v; v } else refHot
      }
      measure match {
        case "mse" =>
          var s = 0.0; var j = 0
          while (j < nCls) { val d = y(j) - probs(j); s += d * d; j += 1 }
          s / nCls.toDouble
        case "mae" =>
          var s = 0.0; var j = 0
          while (j < nCls) { s += math.abs(y(j) - probs(j)); j += 1 }
          s / nCls.toDouble
        case "deviance" =>
          var s = 0.0; var j = 0
          while (j < nCls) {
            val pc = MathUtil.clamp(probs(j), 1e-5, 1.0 - 1e-5)
            s += -2.0 * y(j) * math.log(pc)
            j += 1
          }
          s
        case "misclass" =>
          // first index attaining the max (array_position semantics)
          var mx = probs(0); var j = 1
          while (j < nCls) { if (probs(j) > mx) mx = probs(j); j += 1 }
          var best = 0
          while (probs(best) != mx) best += 1
          if (y(best) == 1.0) 0.0 else 1.0
        case other => throw new IllegalArgumentException(s"measure $other")
      }
    case Binomial =>
      val p2 = MathUtil.sigmoid(link(i, b, 0))
      val y2 = if (yEnc(i) > 0) 1.0 else 0.0
      val y1 = 1.0 - y2
      measure match {
        case "mse" =>
          val a = p2 + y1 - 1.0; val c = p2 - y2
          a * a + c * c
        case "mae" => math.abs(p2 + y1 - 1.0) + math.abs(p2 - y2)
        case "deviance" =>
          val pc = MathUtil.clamp(p2, 1e-5, 1.0 - 1e-5)
          -2.0 * (y1 * math.log(1.0 - pc) + y2 * math.log(pc))
        case "misclass" =>
          y1 * (if (p2 > 0.5) 1.0 else 0.0) + y2 * (if (p2 <= 0.5) 1.0 else 0.0)
        case other => throw new IllegalArgumentException(s"measure $other")
      }
    case _ =>
      val pred = fam match {
        case Poisson => math.exp(link(i, b, 0))
        case _       => link(i, b, 0)
      }
      val err = pred - yEnc(i)
      measure match {
        case "mse" => err * err
        case "mae" => math.abs(err)
        case other => throw new IllegalArgumentException(s"measure $other")
      }
  }

  /** Average-rank Wilcoxon AUC — same math as SlopeModel.aucAllSteps. */
  private[fit] def auc(probs: Array[Double], y: Array[Double]): Double = {
    val n = probs.length
    val order = Array.range(0, n).sortBy(probs(_))
    var rankSum = 0.0
    var n1 = 0.0
    var i = 0
    while (i < n) {
      // tie group [i, j) over equal probs: average rank over the group
      var j = i
      while (j < n && probs(order(j)) == probs(order(i))) j += 1
      val avgRank = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1 .. j
      var k = i
      var n1In = 0.0
      while (k < j) { n1In += y(order(k)); k += 1 }
      rankSum += avgRank * n1In
      n1 += n1In
      i = j
    }
    val n0 = n.toDouble - n1
    val u = rankSum - n1 * (n1 + 1.0) / 2.0
    math.exp(math.log(u) - math.log(n1) - math.log(n0))
  }

  /** Case-weighted tie-averaged Wilcoxon AUC (reference R/score.R:152-164;
    * the reference RANDOMIZES tie order — we tie-average deterministically,
    * a documented deviation). Weights live on the Det 1e-6 integer grid so
    * every intermediate is exact and the result is bit-identical to the
    * distributed path in [[SlopeModel]]:
    * `2U = Σ_groups w1g·(2·cumW0_before + w0g)`, `auc = 2U / (2·W1·W0)`
    * assembled through the same exp/log form as the unweighted statistic.
    */
  private[fit] def aucWeighted(probs: Array[Double], y: Array[Double],
                               w: Array[Double]): Double = {
    import java.math.BigDecimal
    val n = probs.length
    val order = Array.range(0, n).sortBy(probs(_))
    def grid(v: Double): Long = {
      require(java.lang.Double.isFinite(v) && v >= 0.0,
        s"auc: case weights must be finite and non-negative, got $v")
      val g = math.floor(v * 1e6 + 0.5)
      require(g < 9.223372036854776e18, s"auc: weight $v overflows the grid")
      g.toLong
    }
    var u2 = BigDecimal.ZERO // 2·U in grid² units
    var w1 = 0L
    var w0 = 0L
    var i = 0
    while (i < n) {
      // tie group [i, j) over equal probs
      var j = i
      while (j < n && probs(order(j)) == probs(order(i))) j += 1
      var w1g = 0L
      var w0g = 0L
      var k = i
      while (k < j) {
        val g = grid(w(order(k)))
        if (y(order(k)) > 0) w1g = Math.addExact(w1g, g)
        else w0g = Math.addExact(w0g, g)
        k += 1
      }
      u2 = u2.add(BigDecimal.valueOf(w1g).multiply(
        BigDecimal.valueOf(w0).multiply(BigDecimal.valueOf(2))
          .add(BigDecimal.valueOf(w0g))))
      w1 = Math.addExact(w1, w1g)
      w0 = Math.addExact(w0, w0g)
      i = j
    }
    math.exp(math.log(u2.doubleValue()) - math.log(2.0) -
      math.log(w1.toDouble) - math.log(w0.toDouble))
  }
}
