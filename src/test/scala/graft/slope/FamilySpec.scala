package graft.slope

import org.scalatest.funsuite.AnyFunSuite

class FamilySpec extends AnyFunSuite {
  private val eps = 1e-10

  test("gaussian: primal/dual/gradient/null") {
    val y = Array(2.0); val lp = Array(0.5)
    assert(math.abs(Gaussian.rowPrimal(y, lp) - 0.5 * 1.5 * 1.5) < eps)
    assert(math.abs(Gaussian.rowDual(y, lp) - (0.5 * 4.0 - 0.5 * 0.25)) < eps)
    assert(math.abs(Gaussian.rowPseudoGradient(y, lp)(0) - (-1.5)) < eps)
    assert(Gaussian.nullModelFromMeans(Array(3.25))(0) == 3.25)
  }

  test("binomial: y ∈ {−1,+1} logistic loss with overflow guards") {
    val lp = Array(0.7)
    // primal = log(1 + exp(−y·lp))
    assert(math.abs(Binomial.rowPrimal(Array(1.0), lp) - math.log1p(math.exp(-0.7))) < eps)
    assert(math.abs(Binomial.rowPrimal(Array(-1.0), lp) - math.log1p(math.exp(0.7))) < eps)
    // pseudo-gradient = −y/(1+exp(y·lp))
    assert(math.abs(Binomial.rowPseudoGradient(Array(1.0), lp)(0) -
      (-1.0 / (1.0 + math.exp(0.7)))) < eps)
    // no overflow at extreme linear predictors
    assert(!Binomial.rowPrimal(Array(1.0), Array(-1e4)).isInfinite)
    assert(!Binomial.rowPrimal(Array(-1.0), Array(1e4)).isInfinite)
    // null model: mean of {−1,+1} = 0.2 → μ = 0.6 → logit
    val b0 = Binomial.nullModelFromMeans(Array(0.2))(0)
    assert(math.abs(b0 - math.log(0.6 / 0.4)) < eps)
  }

  test("poisson: log-link loss includes lgamma normalizer") {
    val y = Array(3.0); val lp = Array(1.2)
    val expected = -(3.0 * 1.2 - math.exp(1.2) - MathUtil.logGamma(4.0))
    assert(math.abs(Poisson.rowPrimal(y, lp) - expected) < eps)
    assert(math.abs(Poisson.rowPseudoGradient(y, lp)(0) - (math.exp(1.2) - 3.0)) < eps)
    assert(math.abs(Poisson.nullModelFromMeans(Array(2.5))(0) - math.log(2.5)) < eps)
    // lgamma(1) = 0 for y=0
    assert(math.abs(Poisson.rowPrimal(Array(0.0), Array(0.0)) - 1.0) < eps)
  }

  test("multinomial: m−1 full-rank softmax with implicit zero reference class") {
    // m = 2 targets (3 classes). lse = log(1 + e^a + e^b).
    val lp = Array(1.0, -0.5)
    val lse = math.log(1.0 + math.exp(1.0) + math.exp(-0.5))
    val y = Array(1.0, 0.0)
    assert(math.abs(Multinomial.rowPrimal(y, lp) - (lse - 1.0)) < eps)
    val g = Multinomial.rowPseudoGradient(y, lp)
    assert(math.abs(g(0) - (math.exp(1.0 - lse) - 1.0)) < eps)
    assert(math.abs(g(1) - math.exp(-0.5 - lse)) < eps)
    // probabilities sum to < 1, remainder is the reference class
    val pSum = math.exp(1.0 - lse) + math.exp(-0.5 - lse)
    assert(pSum < 1.0 && math.abs(pSum + math.exp(-lse) - 1.0) < eps)
  }

  test("multinomial null model is the EXACT softmax inverse") {
    // class probabilities (0.5, 0.3) with reference class 0.2: η_k must
    // satisfy softmax0(η) = μ exactly — the intercept-only MLE (deliberate
    // non-port: the reference's fitNullModel centered-log formula is not
    // the inverse and its path driver never uses it; ours warm-starts the
    // intercept AT the MLE, so exactness is load-bearing — see SlopePath)
    val out = Multinomial.nullModelFromMeans(Array(0.5, 0.3))
    assert(math.abs(out(0) - math.log(0.5 / 0.2)) < eps)
    assert(math.abs(out(1) - math.log(0.3 / 0.2)) < eps)
    val lse = MathUtil.logSumExp0(out)
    assert(math.abs(math.exp(out(0) - lse) - 0.5) < 1e-12)
    assert(math.abs(math.exp(out(1) - lse) - 0.3) < 1e-12)
    assert(math.abs(math.exp(-lse) - 0.2) < 1e-12)
    // a class absent from the data clamps instead of producing -Inf
    val degenerate = Multinomial.nullModelFromMeans(Array(0.0, 0.5))
    assert(degenerate.forall(v => !v.isInfinite && !v.isNaN))
  }

  test("logSumExp0 is stable at extremes") {
    assert(math.abs(MathUtil.logSumExp0(Array(1000.0)) - 1000.0) < 1e-9)
    // all-negative row: reference class dominates, lse → log(1) = 0
    assert(math.abs(MathUtil.logSumExp0(Array(-500.0)) - 0.0) < 1e-9)
    assert(math.abs(MathUtil.logSumExp0(Array(0.0)) - math.log(2.0)) < 1e-12)
  }

  test("truncExp/truncLog saturation matches Armadillo semantics") {
    assert(MathUtil.truncExp(1e6) == Double.MaxValue)
    assert(MathUtil.truncExp(0.0) == 1.0)
    assert(MathUtil.truncLog(0.0) == MathUtil.LogMin)
    assert(MathUtil.truncLog(Double.PositiveInfinity) == MathUtil.LogMax)
    assert(MathUtil.truncLog(math.E) == 1.0)
  }

  test("rowFusedInto is BIT-identical to composing the three row methods (all families)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 2000) {
      val (fam, m): (Family, Int) = rnd.nextInt(4) match {
        case 0 => (Gaussian, 1)
        case 1 => (Binomial, 1)
        case 2 => (Poisson, 1)
        case _ => (Multinomial, 1 + rnd.nextInt(4))
      }
      val y: Array[Double] = fam match {
        case Binomial => Array(if (rnd.nextBoolean()) 1.0 else -1.0)
        case Poisson  => Array(rnd.nextInt(20).toDouble)
        case Multinomial =>
          val k = rnd.nextInt(m + 1) // last class = all-zeros row
          Array.tabulate(m)(j => if (j == k) 1.0 else 0.0)
        case _ => Array(rnd.nextGaussian() * 10)
      }
      // include extreme linear predictors — the truncExp/truncLog
      // saturation branches must fuse identically too
      val lp = Array.fill(m)(rnd.nextInt(10) match {
        case 0 => 800.0 * (if (rnd.nextBoolean()) 1 else -1)
        case _ => rnd.nextGaussian() * 5
      })
      val gOut = new Array[Double](m)
      val acc = new Array[Double](2)
      fam.rowFusedInto(y, lp, gOut, acc)
      val g = fam.rowPseudoGradient(y, lp)
      assert(acc(0) == fam.rowPrimal(y, lp), s"$fam primal: y=${y.toSeq} lp=${lp.toSeq}")
      assert(acc(1) == fam.rowDual(y, lp), s"$fam dual: y=${y.toSeq} lp=${lp.toSeq}")
      assert(gOut.toSeq == g.toSeq, s"$fam gradient: y=${y.toSeq} lp=${lp.toSeq}")
    }
  }

  test("family factory") {
    assert(Family("gaussian") == Gaussian)
    assert(Family("binomial") == Binomial)
    assert(Family("poisson") == Poisson)
    assert(Family("multinomial") == Multinomial)
    assert(Family("anything-else") == Gaussian)
  }
}
