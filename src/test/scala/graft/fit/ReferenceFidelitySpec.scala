package graft.fit

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite
import graft.slope._

/** Remaining reference-behavior mirrors: support recovery under
  * regularization (test-binomial.R:25-44) and coef() interpolation semantics
  * (test-coef.R:1-47).
  */
class ReferenceFidelitySpec extends AnyFunSuite {

  private def fitLocal(x: DenseMatrix[Double], y: DenseMatrix[Double],
                       cfg: SlopeConfig): SlopeFit = {
    val family = Family(cfg.family)
    val (xs, ctr, scl) = RandomProblem.standardizeLocal(x, cfg.intercept,
      cfg.center, cfg.scale)
    val yCenter: Array[Double] =
      if (family == Gaussian) Array.tabulate(y.cols)(j =>
        breeze.linalg.sum(y(::, j)) / y.rows.toDouble)
      else Array.fill(y.cols)(0.0)
    val yc = y.copy
    for (i <- 0 until y.rows; j <- 0 until y.cols) yc(i, j) -= yCenter(j)
    SlopePath.fit(new LocalOps(xs, yc, family, cfg.intercept), cfg,
      ctr, scl, yCenter, Array.fill(y.cols)(1.0))
  }

  test("regularized binomial SLOPE recovers the planted support (test-binomial.R:25-44)") {
    val n = 400
    val p = 12
    val rng = new scala.util.Random(8)
    val x = DenseMatrix.tabulate[Double](n, p)((_, _) => rng.nextGaussian())
    val support = Set(1, 4, 9)
    val beta = DenseMatrix.zeros[Double](p, 1)
    support.foreach(j => beta(j, 0) = 2.0)
    val y = DenseMatrix.tabulate[Double](n, 1) { (i, _) =>
      val lp = (0 until p).map(j => x(i, j) * beta(j, 0)).sum
      if (rng.nextDouble() < MathUtil.sigmoid(lp)) 1.0 else -1.0
    }
    val fit = fitLocal(x, y, SlopeConfig(family = "binomial", nSigma = 30))
    // at some mid-path step the selected support is exactly the planted one
    val recovered = fit.betas.exists { b =>
      val sel = (1 to p).filter(j => b(j, 0) != 0.0).map(_ - 1).toSet
      sel == support
    }
    assert(recovered, "no path step selected exactly the planted support")
  }

  test("coef(): exact path sigmas return stored betas; off-path sigmas interpolate") {
    val prob = RandomProblem(n = 120, p = 4, family = Gaussian, seed = 3L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 8))
    val model = new SlopeModel(fit, Array.tabulate(4)(i => s"f$i"), Array.empty)
    assert(fit.sigma.length >= 3, "need a few path steps")

    // exact match returns the stored matrix
    val exact = model.coef(Array(fit.sigma(1)))
    assert(exact.head == fit.betas(1))

    // off-path sigma lies between neighbours, coordinatewise
    val mid = math.exp((math.log(fit.sigma(1)) + math.log(fit.sigma(2))) / 2)
    val ip = model.coef(Array(mid)).head
    for (j <- 0 until ip.rows) {
      val lo = math.min(fit.betas(1)(j, 0), fit.betas(2)(j, 0))
      val hi = math.max(fit.betas(1)(j, 0), fit.betas(2)(j, 0))
      assert(ip(j, 0) >= lo - 1e-12 && ip(j, 0) <= hi + 1e-12,
        s"coef $j = ${ip(j, 0)} outside [$lo, $hi]")
    }

    // clamping beyond the path returns the endpoints
    assert(model.coef(Array(fit.sigma.head * 10)).head == fit.betas.head)
    assert(model.coef(Array(fit.sigma.last / 10)).head == fit.betas.last)
  }
}
