package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import org.scalatest.funsuite.AnyFunSuite
import graft.slope._

/** Path-fit oracles mirroring the reference's testthat strategy (SURVEY §5):
  * unregularized limits vs closed forms, constant-λ lasso semantics on an
  * orthonormal design, screening invariance, and path behavior.
  */
class SlopePathSpec extends AnyFunSuite {

  private def localOps(x: DenseMatrix[Double], y: DenseMatrix[Double],
                       family: Family, intercept: Boolean,
                       center: Boolean, scale: String)
    : (LocalOps, Array[Double], Array[Double], Array[Double]) = {
    val (xs, ctr, scl) = RandomProblem.standardizeLocal(x, intercept, center, scale)
    val yCenter: Array[Double] =
      if (family == Gaussian) Array.tabulate(y.cols)(j =>
        breeze.linalg.sum(y(::, j)) / y.rows.toDouble)
      else Array.fill(y.cols)(0.0)
    val yc = y.copy
    for (i <- 0 until y.rows; j <- 0 until y.cols) yc(i, j) -= yCenter(j)
    (new LocalOps(xs, yc, family, intercept), ctr, scl, yCenter)
  }

  private def fitLocal(x: DenseMatrix[Double], y: DenseMatrix[Double],
                       cfg: SlopeConfig): SlopeFit = {
    val family = Family(cfg.family)
    val (ops, ctr, scl, yCenter) = localOps(x, y, family, cfg.intercept, cfg.center, cfg.scale)
    SlopePath.fit(ops, cfg, ctr, scl, yCenter, Array.fill(y.cols)(1.0))
  }

  test("gaussian sigma→0 limit matches the OLS closed form (reference test-gaussian.R:1-17)") {
    val prob = RandomProblem(n = 80, p = 5, family = Gaussian, seed = 7L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(sigma = Array(1e-9)))
    // OLS with intercept on the raw design
    val xi = DenseMatrix.horzcat(DenseMatrix.ones[Double](prob.x.rows, 1), prob.x)
    val ols = inv(xi.t * xi) * (xi.t * prob.y(::, 0))
    val beta = fit.betas.head
    for (j <- 0 until 6)
      assert(math.abs(beta(j, 0) - ols(j)) < 1e-3, s"coef $j: ${beta(j, 0)} vs ${ols(j)}")
  }

  test("gaussian sigma→0 without intercept/standardization also matches OLS on centered y") {
    // the reference centers the gaussian response unconditionally
    // (R/preProcessResponse.R:10-13); without an intercept the offset cannot
    // be restored, so the no-intercept fit targets centered y.
    val prob = RandomProblem(n = 60, p = 4, family = Gaussian, seed = 11L)
    val fit = fitLocal(prob.x, prob.y,
      SlopeConfig(sigma = Array(1e-9), intercept = false, center = false, scale = "none"))
    val yBar = breeze.linalg.sum(prob.y(::, 0)) / 60.0
    val yc = prob.y(::, 0).map(_ - yBar)
    val ols = inv(prob.x.t * prob.x) * (prob.x.t * yc)
    val beta = fit.betas.head
    for (j <- 0 until 4) assert(math.abs(beta(j, 0) - ols(j)) < 1e-3)
  }

  test("constant lambda on an orthonormal design = soft-thresholded OLS (lasso semantics)") {
    // build orthonormal X via QR of a random matrix
    val rng = new scala.util.Random(5)
    val raw = DenseMatrix.tabulate[Double](50, 6)((_, _) => rng.nextGaussian())
    val qr = breeze.linalg.qr.reduced(raw)
    val x = qr.q
    val trueBeta = DenseVector(3.0, -2.0, 0.0, 1.5, 0.0, -0.5)
    val fitted: DenseVector[Double] = x * trueBeta
    val y = DenseMatrix.tabulate[Double](50, 1)((i, _) =>
      fitted(i) + 0.01 * rng.nextGaussian())

    val sigma = 0.004
    val n = x.rows
    val cfg = SlopeConfig(intercept = false, center = false, scale = "none",
      lambdaType = "user", userLambda = Array.fill(6)(1.0), sigma = Array(sigma))
    val fit = fitLocal(x, y, cfg)
    // user λ is scaled by n (regularizationPath.h:52-55): effective penalty
    // per coordinate = n·σ. With XᵀX = I the solution is S(Xᵀyc, n·σ) where
    // yc is the (unconditionally) centered gaussian response.
    val yBar = breeze.linalg.sum(y(::, 0)) / n.toDouble
    val xty = x.t * y(::, 0).map(_ - yBar)
    val expected = xty.toArray.map(v =>
      math.signum(v) * math.max(math.abs(v) - n * sigma, 0.0))
    val beta = fit.betas.head
    for (j <- 0 until 6)
      assert(math.abs(beta(j, 0) - expected(j)) < 1e-3,
        s"coef $j: ${beta(j, 0)} vs ${expected(j)}")
  }

  test("binomial sigma→0 limit matches unregularized logistic regression (Newton oracle)") {
    val prob = RandomProblem(n = 200, p = 3, family = Binomial, amplitude = 1.0, seed = 13L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(family = "binomial", sigma = Array(1e-7)))

    // Newton–Raphson logistic on raw design with intercept, y ∈ {-1,1}
    val xi = DenseMatrix.horzcat(DenseMatrix.ones[Double](prob.x.rows, 1), prob.x)
    var b = DenseVector.zeros[Double](4)
    for (_ <- 0 until 60) {
      val eta = xi * b
      val mu = eta.map(e => 1.0 / (1.0 + math.exp(-e)))
      val y01 = DenseVector.tabulate(prob.y.rows)(i => if (prob.y(i, 0) > 0) 1.0 else 0.0)
      val w = mu.map(p => math.max(p * (1 - p), 1e-10))
      val grad = xi.t * (y01 - mu)
      // Hessian = Xᵀ W X
      val wx = DenseMatrix.tabulate[Double](xi.rows, xi.cols)((i, j) => xi(i, j) * w(i))
      val hess = xi.t * wx
      b = b + inv(hess) * grad
    }
    val beta = fit.betas.head
    for (j <- 0 until 4)
      assert(math.abs(beta(j, 0) - b(j)) < 2e-3, s"coef $j: ${beta(j, 0)} vs ${b(j)}")
  }

  test("screening on == screening off (reference test-screening-rules.R:1-22) and saves passes") {
    for ((fam, name) <- Seq((Gaussian, "gaussian"), (Binomial, "binomial"))) {
      val prob = RandomProblem(n = 100, p = 20, q = 0.15, amplitude = 1.0,
        family = fam, seed = 216L)
      val cfgOn = SlopeConfig(family = name, nSigma = 20, screening = true)
      val cfgOff = cfgOn.copy(screening = false)
      val fitOn = fitLocal(prob.x, prob.y, cfgOn)
      val fitOff = fitLocal(prob.x, prob.y, cfgOff)
      assert(fitOn.betas.length == fitOff.betas.length, s"$name path lengths")
      // screening must actually PRUNE (reference test-screening-rules.R:
      // "screening actually prunes"): early path steps solve on a strict
      // subset of the 21 columns. (Pass COUNTS can go either way — subset
      // passes are cheaper, not fewer, and KKT repairs add full-gradient
      // passes, exactly as in the reference.)
      val p = fitOn.betas.head.rows
      assert(fitOn.activeSets.take(3).exists(_.length < p),
        s"$name screening never pruned")
      for (k <- fitOn.betas.indices; j <- 0 until fitOn.betas(k).rows) {
        val d = math.abs(fitOn.betas(k)(j, 0) - fitOff.betas(k)(j, 0))
        assert(d < 1e-3, s"$name step $k coef $j differs by $d")
      }
    }
  }

  test("default path terminates early on deviance plateau and respects max_variables") {
    val prob = RandomProblem(n = 100, p = 10, family = Gaussian, seed = 21L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 100))
    assert(fit.sigma.length < 100, "early termination should trigger")
    assert(fit.sigma.length == fit.betas.length)
    // deviance ratios are non-decreasing along the path
    fit.devianceRatios.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-8)
      case _           =>
    }
    // max_variables caps the path
    val fit2 = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 50, maxVariables = 2))
    assert(fit2.betas.forall { b =>
      val uniq = b.data.filter(_ != 0.0).map(math.abs).distinct.length
      uniq <= 2
    })
  }

  test("first path step at sigma_max has all penalized coefficients zero") {
    val prob = RandomProblem(n = 80, p = 8, family = Gaussian, seed = 31L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 10))
    val b0 = fit.betas.head
    for (j <- 1 until b0.rows) assert(math.abs(b0(j, 0)) < 1e-8)
  }

  test("multinomial fits and improves deviance along the path") {
    val prob = RandomProblem(n = 150, p = 4, family = Multinomial, nTargets = 2,
      amplitude = 1.5, seed = 41L)
    val fit = fitLocal(prob.x, prob.y,
      SlopeConfig(family = "multinomial", nSigma = 15))
    assert(fit.betas.head.cols == 2)
    assert(fit.devianceRatios.last > 0.1, s"dev ratio ${fit.devianceRatios.last}")
  }

  test("poisson fits and improves deviance along the path") {
    val prob = RandomProblem(n = 150, p = 4, family = Poisson, amplitude = 0.5, seed = 51L)
    val fit = fitLocal(prob.x, prob.y, SlopeConfig(family = "poisson", nSigma = 15))
    assert(fit.devianceRatios.last > 0.1)
  }

  test("FISTA stall guard: a sub-floating-point tolRelGap terminates at the numerical floor") {
    // tolRelGap=0 is unreachable by definition; without the feasible-stall
    // guard FISTA would burn maxPasses full data passes making no
    // representable progress (measured 30+ min of 6M-row treeAggregates on
    // the saturating-sigma binomial anchor at x10 scale). The guard must
    // stop within ~stall-window passes of hitting the gap floor, and the
    // returned iterate must still be the numerical optimum.
    val prob = RandomProblem(n = 120, p = 3, family = Binomial, seed = 13L)
    val fit = fitLocal(prob.x, prob.y,
      SlopeConfig(family = "binomial", sigma = Array(1e6), lambdaType = "user",
        userLambda = Array.fill(3)(1.0),
        solver = SolverConfig(tolRelGap = 0.0, tolInfeas = 1e-10,
          maxPasses = 100000)))
    assert(fit.passes.sum < 5000,
      s"stall guard failed to bound passes: ${fit.passes.sum}")
    // saturating sigma: the numerical optimum is still the null model
    for (j <- 1 until fit.betas.head.rows)
      assert(fit.betas.head(j, 0) == 0.0)
    // the exit kind surfaces per kept step (ADVICE r7)
    assert(fit.stallExits.length == fit.sigma.length && fit.stallExits.head,
      "floor-stalled step must be flagged in SlopeFit.stallExits")
  }

  test("sigmaRatios resolves against sigma_max identically to an explicit user grid") {
    // the certificate queries' probe-free shape: ratios resolve inside the
    // path driver against the same sigma_max a separate probe fit would
    // have read — grids and solutions must be bit-identical
    val prob = RandomProblem(n = 80, p = 5, family = Gaussian, seed = 17L)
    val probe = fitLocal(prob.x, prob.y, SlopeConfig(nSigma = 1, lambdaMinRatio = 1.0))
    val sMax = probe.sigma(0)
    val ratios = Array(0.6, 0.2, 0.05)
    val viaRatios = fitLocal(prob.x, prob.y, SlopeConfig(sigmaRatios = ratios))
    val viaAbs = fitLocal(prob.x, prob.y, SlopeConfig(sigma = ratios.map(_ * sMax)))
    assert(viaRatios.sigma.toSeq == viaAbs.sigma.toSeq)
    assert(viaRatios.sigma.length == ratios.length, "ratio grid must disable early stop")
    viaRatios.betas.zip(viaAbs.betas).foreach { case (a, b) => assert(a == b) }
    // precedence: an absolute grid wins when both are set (TrainSlope cells)
    val both = fitLocal(prob.x, prob.y,
      SlopeConfig(sigma = Array(sMax * 0.3), sigmaRatios = ratios))
    assert(both.sigma.toSeq == Seq(sMax * 0.3))
  }

  test("localFitThreshold is driver-heap-gated (ADVICE r7: no silent OOM on small drivers)") {
    // the effective cut never exceeds 1/8 of max heap as flat doubles —
    // a 64M-element default tuned for the 32 GiB bench box must not make a
    // 1 GiB library driver collect() itself to death
    val heapCap = Runtime.getRuntime.maxMemory() / 64L
    assert(SlopeConfig(localFitThreshold = Long.MaxValue).effectiveLocalFitThreshold == heapCap)
    assert(SlopeConfig(localFitThreshold = 1000L).effectiveLocalFitThreshold == 1000L)
    assert(SlopeConfig(localFitThreshold = 0L).effectiveLocalFitThreshold == 0L)
  }

  test("FISTA stall exit is flagged and returns the best-gap feasible iterate") {
    // momentum is non-monotone: at stall time the CURRENT iterate can sit
    // above the plateau's best. The guard must return the best-gap feasible
    // snapshot — indistinguishable from a converged solve at any realistic
    // tolerance — and record the exit kind in SolveResult.
    val prob = RandomProblem(n = 100, p = 3, family = Gaussian, seed = 29L)
    val (ops, _, _, _) = localOps(prob.x, prob.y, Gaussian,
      intercept = true, center = true, scale = "l2")
    val lambda = Array(30.0, 20.0, 10.0)
    val ref = Fista.fit(ops, DenseMatrix.zeros[Double](ops.p, 1), lambda,
      SolverConfig(tolRelGap = 1e-10, tolInfeas = 1e-8))
    assert(!ref.stallExit, "a reachable tolerance must not stall-exit")
    val stalled = Fista.fit(ops, DenseMatrix.zeros[Double](ops.p, 1), lambda,
      SolverConfig(tolRelGap = 0.0, tolInfeas = 1e-8, maxPasses = 100000))
    assert(stalled.stallExit, "tolRelGap=0 must exit through the stall guard")
    assert(stalled.passes < 100000, "stall guard must bound passes")
    for (i <- 0 until ops.p)
      assert(math.abs(stalled.beta(i, 0) - ref.beta(i, 0)) < 1e-6,
        s"coef $i: ${stalled.beta(i, 0)} vs ${ref.beta(i, 0)}")
  }
}
