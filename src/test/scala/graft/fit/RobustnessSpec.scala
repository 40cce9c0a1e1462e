package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import org.scalatest.funsuite.AnyFunSuite
import graft.slope._

/** Shape/robustness sweep (reference test-gaussian.R:19-36: n×p grid ×
  * density fits silently) plus the poisson unregularized-limit oracle.
  */
class RobustnessSpec extends AnyFunSuite {

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

  test("gaussian fits across the n×p×density grid, wide data included") {
    for (n <- Seq(50, 100); p <- Seq(50, 100); density <- Seq(1.0, 0.5)) {
      val prob = RandomProblem(n = n, p = p, density = density,
        family = Gaussian, seed = (n * p + (density * 10).toInt).toLong)
      val fit = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 10))
      assert(fit.betas.nonEmpty, s"n=$n p=$p density=$density produced no path")
      assert(fit.devianceRatios.forall(r => !r.isNaN))
      // wide data (n <= p) must route to FISTA (no n×n/Woodbury branch)
      assert(fit.betas.head.rows == p + 1)
    }
  }

  test("all four families fit the same 60×6 design silently") {
    for ((name, fam, nT) <- Seq(("gaussian", Gaussian, 1), ("binomial", Binomial, 1),
      ("poisson", Poisson, 1), ("multinomial", Multinomial, 2))) {
      val prob = RandomProblem(n = 60, p = 6, family = fam, nTargets = nT,
        amplitude = 0.8, seed = 31L)
      val fit = fitLocal(prob.x, prob.y, SlopeConfig(family = name, nSigma = 8))
      assert(fit.betas.nonEmpty && fit.devianceRatios.forall(!_.isNaN), name)
    }
  }

  test("bh and oscar lambda types run end-to-end") {
    val prob = RandomProblem(n = 80, p = 5, family = Gaussian, seed = 3L)
    for (lt <- Seq("bh", "oscar")) {
      val fit = fitLocal(prob.x, prob.y, SlopeConfig(lambdaType = lt, nSigma = 8))
      assert(fit.betas.nonEmpty, lt)
      assert(fit.lambda.zip(fit.lambda.tail).forall { case (a, b) => a >= b }, lt)
    }
  }

  test("poisson sigma→0 limit matches a Newton GLM oracle") {
    val prob = RandomProblem(n = 250, p = 3, family = Poisson, amplitude = 0.4,
      seed = 19L)
    val fit = fitLocal(prob.x, prob.y,
      SlopeConfig(family = "poisson", sigma = Array(1e-8)))
    val beta = fit.betas.head

    val n = prob.x.rows
    val xi = DenseMatrix.horzcat(DenseMatrix.ones[Double](n, 1), prob.x)
    var b = DenseVector.zeros[Double](4)
    b(0) = math.log(breeze.linalg.sum(prob.y(::, 0)) / n) // null start
    for (_ <- 0 until 50) {
      val eta = xi * b
      val mu = eta.map(math.exp)
      val grad = xi.t * (prob.y(::, 0) - mu)
      val wx = DenseMatrix.tabulate[Double](n, 4)((i, j) => xi(i, j) * mu(i))
      val hess = xi.t * wx
      b = b + inv(hess) * grad
    }
    for (j <- 0 until 4)
      assert(math.abs(beta(j, 0) - b(j)) < 2e-3, s"coef $j: ${beta(j, 0)} vs ${b(j)}")
  }
}
