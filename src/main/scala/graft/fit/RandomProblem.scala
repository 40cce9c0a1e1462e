package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector}
import scala.util.Random
import graft.slope._

/** Seeded synthetic-problem generator, the reference's `randomProblem`
  * (R/utils.R:15-76): gaussian (optionally sparse / equicorrelated) design,
  * planted signs on a q-fraction support, responses drawn per family.
  * Deterministic given the seed — used as the test fixture generator
  * (SURVEY.md §5).
  */
object RandomProblem {

  final case class Problem(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double], // preprocessed layout (1 col; m−1 one-hot for multinomial)
      rawLabels: Array[String], // class labels for binomial/multinomial
      beta: DenseMatrix[Double])

  def apply(n: Int,
            p: Int,
            q: Double = 0.2,
            density: Double = 1.0,
            rho: Double = 0.0,
            amplitude: Double = 3.0,
            family: Family = Gaussian,
            nTargets: Int = 1,
            seed: Long = 42L): Problem = {
    val rng = new Random(seed)
    val x = DenseMatrix.zeros[Double](n, p)
    val common = DenseVector.fill(n)(rng.nextGaussian())
    for (i <- 0 until n; j <- 0 until p) {
      val v = if (density >= 1.0 || rng.nextDouble() < density) rng.nextGaussian() else 0.0
      x(i, j) = if (rho > 0) math.sqrt(1 - rho) * v + math.sqrt(rho) * common(i) else v
    }

    val m = if (family == Multinomial) nTargets else 1
    val beta = DenseMatrix.zeros[Double](p, m)
    val support = rng.shuffle((0 until p).toList).take(math.max(1, (q * p).toInt))
    for (j <- support; t <- 0 until m)
      beta(j, t) = amplitude * (if (rng.nextBoolean()) 1.0 else -1.0)

    val lin = x * beta
    family match {
      case Gaussian =>
        val y = DenseMatrix.tabulate[Double](n, 1)((i, _) => lin(i, 0) + rng.nextGaussian())
        Problem(x, y, Array.empty, beta)
      case Binomial =>
        val labels = new Array[String](n)
        val y = DenseMatrix.zeros[Double](n, 1)
        for (i <- 0 until n) {
          val prob = MathUtil.sigmoid(lin(i, 0))
          val one = rng.nextDouble() < prob
          labels(i) = if (one) "b" else "a"
          y(i, 0) = if (one) 1.0 else -1.0
        }
        Problem(x, y, labels, beta)
      case Poisson =>
        val y = DenseMatrix.zeros[Double](n, 1)
        for (i <- 0 until n) {
          val rate = math.exp(MathUtil.clamp(lin(i, 0), -10, 10))
          // inverse-CDF Poisson draw
          var k = 0
          var acc = math.exp(-rate)
          var cum = acc
          val uDraw = rng.nextDouble()
          while (cum < uDraw && k < 1000) {
            k += 1
            acc = acc * rate / k
            cum += acc
          }
          y(i, 0) = k.toDouble
        }
        Problem(x, y, Array.empty, beta)
      case Multinomial =>
        val labels = new Array[String](n)
        val y = DenseMatrix.zeros[Double](n, m)
        val names = (0 to m).map(i => ('a' + i).toChar.toString).toArray
        for (i <- 0 until n) {
          val lp = Array.tabulate(m)(j => lin(i, j))
          val lse = MathUtil.logSumExp0(lp)
          val probs = Array.tabulate(m + 1)(j =>
            if (j < m) math.exp(lp(j) - lse) else math.exp(-lse))
          val uDraw = rng.nextDouble()
          var cum = 0.0
          var cls = m
          var j = 0
          var found = false
          while (j <= m && !found) {
            cum += probs(j)
            if (uDraw < cum) { cls = j; found = true }
            j += 1
          }
          labels(i) = names(cls)
          for (t <- 0 until m) y(i, t) = if (cls == t) 1.0 else 0.0
        }
        Problem(x, y, labels, beta)
    }
  }

  /** Standardize a local design like the estimator would, returning
    * (LocalOps-ready X incl. intercept col, centers, scales).
    */
  def standardizeLocal(x: DenseMatrix[Double], intercept: Boolean,
                       center: Boolean, scale: String)
    : (DenseMatrix[Double], Array[Double], Array[Double]) = {
    val n = x.rows
    val p = x.cols
    val ctr = Array.tabulate(p)(j =>
      if (center) breeze.linalg.sum(x(::, j)) / n.toDouble else 0.0)
    val scl = Array.tabulate(p) { j =>
      val c = x(::, j).toArray.map(_ - ctr(j))
      val s = scale match {
        case "none" => 1.0
        case "l2"   => math.sqrt(c.map(v => v * v).sum)
        case "l1"   => c.map(math.abs).sum
        case "sd"   =>
          val mu = x(::, j).toArray.sum / n
          math.sqrt(x(::, j).toArray.map(v => (v - mu) * (v - mu)).sum / (n - 1.0))
        case "max"  => c.max
      }
      if (s == 0.0) 1.0 else s
    }
    val ic = if (intercept) 1 else 0
    val out = DenseMatrix.zeros[Double](n, p + ic)
    for (i <- 0 until n) {
      // unit-norm intercept column — the BatchOps preconditioning contract
      // (see RddOps.interceptNorm); SlopePath unscales the solution
      if (intercept) out(i, 0) = 1.0 / math.sqrt(n.toDouble)
      for (j <- 0 until p) out(i, j + ic) = (x(i, j) - ctr(j)) / scl(j)
    }
    (out, ctr, scl)
  }
}
