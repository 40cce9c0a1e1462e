package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.slope._

/** User-facing fit configuration; defaults mirror the reference's
  * (R/owl.R:271-291). Negative sentinel = "auto" (resolved against n/p).
  */
final case class SlopeConfig(
    family: String = "gaussian",
    intercept: Boolean = true,
    center: Boolean = true,
    scale: String = "l2",
    nSigma: Int = 100,
    sigma: Array[Double] = Array.empty, // user σ grid (disables early stop)
    /** User σ grid as RATIOS of the data's σmax — resolved inside the path
      * driver (which computes σmax from its own λmax pass anyway), with the
      * same semantics as `sigma` (fixed step count, no early stop). This is
      * the certificate queries' shape; resolving it here removes the
      * separate nSigma=1 "probe" fit they used to pay (a full
      * standardize+collect+solve) just to read σmax. `sigma` wins when both
      * are set (TrainSlope cells inherit the full fit's ABSOLUTE grid).
      */
    sigmaRatios: Array[Double] = Array.empty,
    lambdaType: String = "gaussian",
    userLambda: Array[Double] = Array.empty,
    lambdaMinRatio: Double = -1.0, // auto: 1e-2 if n<p else 1e-4
    q: Double = -1.0, // auto: 0.1·min(1, n/p)
    screening: Boolean = true,
    tolDevChange: Double = 1e-5,
    tolDevRatio: Double = 0.995,
    maxVariables: Long = -1L, // auto: n·m
    solver: SolverConfig = SolverConfig(),
    diagnostics: Boolean = false,
    /** Record per-step KKT-certificate state (full-space gradient at the
      * final β of every kept path step, the standardized β, and the step's
      * absolute λ·σ sequence) into [[SlopeFit.kktState]]. Costs one extra
      * data pass per step only on the no-screening branch (the screened
      * branch's repair loop already evaluated exactly this gradient).
      */
    kktExport: Boolean = false,
    /** Widest active set for which the gaussian ADMM/Gram fast path is used;
      * beyond this, FISTA (no p×p driver matrix). Ours, not the reference's:
      * the reference always builds the Gram for gaussian, which cannot work
      * at 100 TB-scale p.
      */
    maxGramCols: Int = 2048,
    /** When n·p is below this, the estimator collects the (standardized)
      * data to the driver and solves with LocalOps — single-node speed for
      * problems the reference would also solve in-memory, while large data
      * takes the distributed treeAggregate path. LocalOps ≡ RddOps is
      * pinned by SparkFitSpec. Set to 0 to force the distributed path.
      *
      * Default 64M elements ≈ 512 MB of doubles — comfortably driver-held,
      * and the measured per-pass crossover on a 32-core box: below it one
      * in-memory pass beats a treeAggregate job's fixed ~0.1–0.3 s launch
      * cost (a tight-tolerance solve runs hundreds of passes, so crossing
      * to the distributed substrate too early costs 10–30× wall — the
      * round-7 ×10 rehearsal measured exactly that at the old 4M cut).
      *
      * The EFFECTIVE cut is `min(this, maxHeap/64)` — see
      * [[effectiveLocalFitThreshold]]: the 64M default is tuned for the
      * 32 GiB bench heap, and on a default-sized driver (1 GiB) a 64M-element
      * collect (~512 MB raw + transient Row copies) is a silent OOM, not a
      * fast path. Callers who really want a bigger local solve raise the
      * driver heap, not just this number.
      */
    localFitThreshold: Long = 64000000L) {

  /** Heap-gated local-fit cut: at most 1/8 of the driver's max heap held
    * as flat doubles (maxMemory/8 bytes-per-double/8 headroom ⇒ /64),
    * leaving room for the ~2–3× transient of the collect itself plus
    * solver state. On the 32 GiB bench heap this resolves to ~536M
    * elements (the configured 64M wins); on a 1 GiB default driver it
    * resolves to ~16M (the gate wins) instead of OOMing.
    */
  def effectiveLocalFitThreshold: Long =
    math.min(localFitThreshold, Runtime.getRuntime.maxMemory() / 64L)
}

/** Full-path fit output (standardized-scale coefficients are already
  * back-transformed; reference src/rescale.h:8-31 applied).
  */
final case class SlopeFit(
    betas: IndexedSeq[DenseMatrix[Double]], // (p+intercept)×m per kept σ
    sigma: Array[Double],
    lambda: Array[Double], // divided by n, as returned to R (owl.cpp:380)
    nullDeviance: Double,
    deviances: Array[Double],
    devianceRatios: Array[Double],
    passes: Array[Int],
    activeSets: IndexedSeq[Array[Int]],
    diagnostics: IndexedSeq[(List[Double], List[Double], List[Double])],
    nUnique: Array[Int],
    violations: IndexedSeq[Array[Int]],
    family: String,
    intercept: Boolean,
    dataPasses: Long,
    /** Per kept step: (full-space smooth-loss gradient at the final
      * standardized β, that β, absolute λ·σ_k). Empty unless the fit ran
      * with `kktExport` (see [[KktCertificate]]).
      */
    kktState: IndexedSeq[(DenseMatrix[Double], DenseMatrix[Double], Array[Double])] =
      IndexedSeq.empty,
    /** Per kept step: TRUE when the step's (final) solve exited through
      * the FISTA numerical-floor stall guard rather than the relative
      * duality-gap test ([[SolveResult.stallExit]]) — "stopped at the
      * floating-point floor with the best-gap feasible iterate", reported
      * so callers and certificates can tell it apart from a tolRelGap
      * convergence. ADMM steps are always false (residual stopping rule).
      */
    stallExits: Array[Boolean] = Array.empty) {
  def nonzeros(k: Int): Int = {
    val b = betas(k)
    val skip = if (intercept) 1 else 0
    (skip until b.rows).count(i => (0 until b.cols).exists(j => b(i, j) != 0.0))
  }
}

/** The path driver — the Spark-side re-expression of the reference's
  * `owlCpp` orchestration (reference src/owl.cpp:14-396): penalty-path
  * construction, per-σ {strong-rule screen → solve on the working set →
  * KKT check/repair}, warm starts, and early termination. All state here is
  * driver-local (β, active sets, λ/σ); the data is only touched through
  * `BatchOps` passes.
  */
object SlopePath {

  def fit(ops: BatchOps,
          cfg: SlopeConfig,
          xCenter: Array[Double],
          xScale: Array[Double],
          yCenter: Array[Double],
          yScale: Array[Double]): SlopeFit = {
    val family = ops.family
    val n = ops.n
    val p = ops.p // incl. intercept col
    val m = ops.m
    val ic = if (cfg.intercept) 1 else 0
    val pFeat = p - ic

    // ---- resolved defaults (R/owl.R:279-282) ----
    val q = if (cfg.q > 0) cfg.q else 0.1 * math.min(1.0, n.toDouble / pFeat)
    val lambdaMinRatio =
      if (cfg.lambdaMinRatio > 0) cfg.lambdaMinRatio
      else if (n < pFeat) 1e-2 else 1e-4
    val userSigma = cfg.sigma.nonEmpty || cfg.sigmaRatios.nonEmpty
    // user-supplied σ disables early path termination (R/owl.R:386-390)
    val tolDevChange = if (userSigma) 0.0 else cfg.tolDevChange
    val tolDevRatio = if (userSigma) 1.0 else cfg.tolDevRatio
    val maxVariables =
      if (userSigma) (pFeat + ic).toLong * m
      else if (cfg.maxVariables > 0) cfg.maxVariables
      else n * m

    // ---- λ sequence and σ grid (src/regularizationPath.h:9-72) ----
    val nLambda = pFeat * m
    if (cfg.lambdaType == "user")
      require(cfg.userLambda.length == nLambda,
        s"lambda sequence must be as long as there are variables " +
          s"(${cfg.userLambda.length} != $nLambda)")
    val lambda = LambdaSequence.build(cfg.lambdaType, nLambda, q, n, cfg.userLambda)
    val gradMax = ops.lambdaMaxVec() // one data pass
    val sigmaMax = LambdaSequence.sigmaMax(gradMax, lambda)
    val sigma: Array[Double] =
      if (cfg.sigma.nonEmpty) cfg.sigma.clone()
      else if (cfg.sigmaRatios.nonEmpty) cfg.sigmaRatios.map(_ * sigmaMax)
      else LambdaSequence.sigmaGrid(sigmaMax, lambdaMinRatio, cfg.nSigma)
    val nSigma = sigma.length

    // ---- null deviance at β = 0 (src/owl.cpp:94-96) ----
    val nullDeviance = 2.0 * ops.primal(DenseMatrix.zeros[Double](p, m))
    // per-iteration primal/dual/wall-clock traces (M16; family.h:119-130)
    val solverCfg =
      if (cfg.diagnostics) cfg.solver.copy(diagnostics = true) else cfg.solver

    // ---- path state ----
    var beta = DenseMatrix.zeros[Double](p, m)
    if (cfg.intercept && family != Gaussian) {
      // warm-start the (unpenalized) intercept at the family's exact
      // intercept-only MLE (reference fitNullModel, binomial.h:31-39 /
      // poisson.h:30-33; multinomial uses the true softmax inverse — see
      // Family.scala). The reference inits at zero and lets the solver
      // walk there — for exp-link families that costs hundreds of extra
      // distributed passes for the same optimum (measured 2.5-3x fewer
      // passes). It is also a CORRECTNESS fix at fully-screened path
      // steps: the binomial/multinomial duality-gap estimate COINCIDES
      // with the primal at lp = 0 (both reduce to n·ln(#classes)), so a
      // solve initialized exactly at β = 0 sees a zero gap and terminates
      // without moving — the reference's λmax-end intercepts are
      // therefore 0 (a uniform-probability model) instead of the base-rate
      // MLE. Warm-starting AT the MLE makes the gap certificate legitimate
      // where it fires. Gaussian's null intercept is 0 (centered y).
      // Scaled by √n for the unit-norm intercept column convention.
      val interceptScale = math.sqrt(n.toDouble)
      val nullInts = family.nullModelFromMeans(ops.yMeans)
      var j = 0
      while (j < m) { beta(0, j) = nullInts(j) * interceptScale; j += 1 }
    }
    var betaPrev = beta.copy
    var screening = cfg.screening
    var everActive: Array[Int] = if (cfg.intercept) Array(0) else Array.empty
    var activeSet: Array[Int] = Array.range(0, p)
    var strongSet: Array[Int] = Array.empty
    var lastFullGradient: Option[DenseMatrix[Double]] = None
    // FISTA step size carried across path steps / repair rounds (the
    // Lipschitz constant of the smooth part is lambda-independent)
    var fistaLr = 1.0

    // gaussian ADMM state (src/owl.cpp:122-140)
    val z = DenseVector.zeros[Double](p)
    val u = DenseVector.zeros[Double](p)
    var fullFactor: Option[AdmmGaussian.Factor] = None

    val betas = IndexedSeq.newBuilder[DenseMatrix[Double]]
    val kktOut =
      IndexedSeq.newBuilder[(DenseMatrix[Double], DenseMatrix[Double], Array[Double])]
    val activeSets = IndexedSeq.newBuilder[Array[Int]]
    val violationsOut = IndexedSeq.newBuilder[Array[Int]]
    val diagOut = IndexedSeq.newBuilder[(List[Double], List[Double], List[Double])]
    val devs = Array.newBuilder[Double]
    val devRatios = Array.newBuilder[Double]
    val passesOut = Array.newBuilder[Int]
    val nUniqueOut = Array.newBuilder[Int]
    val stallOut = Array.newBuilder[Boolean]

    val deviancesSeen = scala.collection.mutable.ArrayBuffer.empty[Double]
    var k = 0
    var kept = 0
    var stop = false

    def useAdmm(cols: Int): Boolean =
      family == Gaussian && cols <= n && cols <= cfg.maxGramCols

    while (k < nSigma && !stop) {
      val lamK = lambda.map(_ * sigma(k))
      val violations = scala.collection.mutable.ArrayBuffer.empty[Int]

      if (screening) {
        // strong set from the gradient at β_prev (src/owl.cpp:150-161).
        // The final KKT pass of the previous step evaluated exactly this
        // gradient, so reuse it instead of spending another data pass.
        val gradPrev = lastFullGradient.getOrElse(ops.lossGrad(betaPrev)._3)
        val sigmaPrev = if (k == 0) sigmaMax else sigma(k - 1)
        strongSet = Screening.strongSet(
          gradPrev, lamK, lambda.map(_ * sigmaPrev), cfg.intercept)

        // working set = ever-active ∪ previously-nonzero (src/owl.cpp:163-168)
        val prevActive = (0 until p).filter(i =>
          (0 until m).exists(j => betaPrev(i, j) != 0.0)).toArray
        everActive = Sets.union(everActive, prevActive)
        activeSet = everActive
      }

      var res: SolveResult = null

      if (activeSet.length == p / m || !screening) {
        // all features active → stop screening for good (src/owl.cpp:171-215)
        screening = false
        activeSet = Array.range(0, p)
        if (useAdmm(p)) {
          if (fullFactor.isEmpty) fullFactor = Some(AdmmGaussian.factorize(ops))
          res = AdmmGaussian.fit(ops, fullFactor.get, z, u, lamK, solverCfg)
          beta = res.beta.copy
        } else {
          res = Fista.fit(ops, beta, lamK, solverCfg, fistaLr)
          fistaLr = res.learningRate
          beta = res.beta.copy
        }
        lastFullGradient = None
      } else {
        // subset solve + KKT repair loop (src/owl.cpp:218-311)
        var kktViolation = true
        while (kktViolation) {
          if (activeSet.isEmpty) {
            beta = DenseMatrix.zeros[Double](p, m)
            res = SolveResult(DenseMatrix.zeros[Double](0, m), 0, Nil, Nil, Nil,
              deviance = 2.0 * ops.primal(beta))
          } else {
            val subOps = ops.subset(activeSet)
            val nActive = (activeSet.length - ic) * m
            val lamSub = lamK.take(nActive)

            val subRes =
              if (useAdmm(activeSet.length)) {
                val factor = AdmmGaussian.factorize(subOps)
                val zSub = DenseVector.tabulate(activeSet.length)(r => z(activeSet(r)))
                val uSub = DenseVector.tabulate(activeSet.length)(r => u(activeSet(r)))
                val r0 = AdmmGaussian.fit(subOps, factor, zSub, uSub, lamSub, solverCfg)
                var r = 0
                while (r < activeSet.length) {
                  z(activeSet(r)) = zSub(r); u(activeSet(r)) = uSub(r); r += 1
                }
                r0
              } else {
                // warm-start coefficients from the current full-space beta
                // (tabulated only on this branch — ADMM warm-starts from z/u)
                val betaSub = DenseMatrix.tabulate[Double](activeSet.length, m)(
                  (r, j) => beta(activeSet(r), j))
                val r0 = Fista.fit(subOps, betaSub, lamSub, solverCfg, fistaLr)
                fistaLr = r0.learningRate
                r0
              }

            var r = 0
            while (r < activeSet.length) {
              var j = 0
              while (j < m) { beta(activeSet(r), j) = subRes.beta(r, j); j += 1 }
              r += 1
            }
            // clear rows that left the active set implicitly stay as-is:
            // the reference only writes beta.rows(active_set); rows outside
            // the working set keep their previous (zero) values.
            res = subRes
          }

          // full-space gradient for the KKT check (one data pass)
          val grad = ops.lossGrad(beta)._3
          lastFullGradient = Some(grad)
          val possibleFailures =
            Screening.kktCheck(grad, beta, lamK, solverCfg.tolInfeas, cfg.intercept)
          val strongFailures = Sets.intersect(possibleFailures, strongSet)
          var checkFailures = Sets.diff(strongFailures, activeSet)
          kktViolation = checkFailures.nonEmpty
          violations += checkFailures.length
          if (!kktViolation) {
            checkFailures = Sets.diff(possibleFailures, activeSet)
            kktViolation = checkFailures.nonEmpty
            violations += checkFailures.length
          }
          activeSet = Sets.union(checkFailures, activeSet)
        }
      }

      // record step (src/owl.cpp:313-348)
      val deviance = res.deviance
      val devianceRatio = 1.0 - deviance / nullDeviance
      val devianceChange =
        if (deviancesSeen.nonEmpty)
          math.abs((deviancesSeen.last - deviance) / deviancesSeen.last)
        else 0.0
      deviancesSeen += deviance

      val nUnique = {
        val nz = scala.collection.mutable.HashSet.empty[Double]
        var i = 0
        while (i < p) {
          var j = 0
          while (j < m) {
            if (beta(i, j) != 0.0) nz += math.abs(beta(i, j)); j += 1
          }
          i += 1
        }
        nz.size
      }
      val nCoefs = (0 until p).count(i => (0 until m).exists(j => beta(i, j) != 0.0))

      // Termination order mirrors src/owl.cpp:350-359 exactly: the
      // deviance-plateau stop fires FIRST and KEEPS the current step
      // (`k++; break`); only then does max_variables fire and DROP it
      // (`break` before k++ → resize discards the slice). When both hold in
      // the same iteration the reference keeps the step.
      val earlyStop = nCoefs > 0 && k > 0 &&
        (devianceChange < tolDevChange || devianceRatio > tolDevRatio)
      val dropForMaxVars = !earlyStop && nUnique > maxVariables

      if (!dropForMaxVars) {
        if (cfg.kktExport) {
          // the screened branch's final repair round evaluated the gradient
          // at exactly this β; the no-screening branch pays one extra pass
          val grad = lastFullGradient.getOrElse(ops.lossGrad(beta)._3)
          kktOut += ((grad.copy, beta.copy, lamK))
        }
        betas += beta.copy
        betaPrev = beta.copy
        activeSets += activeSet
        violationsOut += violations.toArray
        diagOut += ((res.primals, res.duals, res.times))
        devs += deviance
        devRatios += devianceRatio
        passesOut += res.passes
        nUniqueOut += nUnique
        stallOut += res.stallExit
        kept += 1
      }
      if (earlyStop || dropForMaxVars) stop = true
      k += 1
    }

    // back-transform to original scale (src/rescale.h:8-31). The ops present
    // the intercept column at unit l2 norm (preconditioning; see
    // RddOps.interceptNorm), so the intercept row is unscaled by √n first.
    val interceptNorm = math.sqrt(n.toDouble)
    val rescaled = betas.result().map { b0 =>
      val b = b0.copy
      if (cfg.intercept) {
        var j = 0
        while (j < b.cols) { b(0, j) /= interceptNorm; j += 1 }
      }
      Rescale(b, xCenter, xScale, yCenter, yScale, cfg.intercept)
    }

    SlopeFit(
      betas = rescaled,
      sigma = sigma.take(kept),
      lambda = lambda.map(_ / n), // standardized back (src/owl.cpp:380)
      nullDeviance = nullDeviance,
      deviances = devs.result(),
      devianceRatios = devRatios.result(),
      passes = passesOut.result(),
      activeSets = activeSets.result(),
      nUnique = nUniqueOut.result(),
      violations = violationsOut.result(),
      diagnostics = diagOut.result(),
      family = family.name,
      intercept = cfg.intercept,
      dataPasses = ops.dataPasses,
      kktState = kktOut.result(),
      stallExits = stallOut.result())
  }
}

/** Coefficient back-transform from standardized to original scale
  * (reference src/rescale.h:8-31): β_j ← β_j·y_scale/x_scale_j; the
  * intercept absorbs y_center − Σ x̄_j·β_j.
  */
object Rescale {
  def apply(betaStd: DenseMatrix[Double],
            xCenter: Array[Double],
            xScale: Array[Double],
            yCenter: Array[Double],
            yScale: Array[Double],
            intercept: Boolean): DenseMatrix[Double] = {
    val b = betaStd.copy
    val ic = if (intercept) 1 else 0
    var jT = 0
    while (jT < b.cols) {
      var acc = 0.0
      var j = ic
      while (j < b.rows) {
        b(j, jT) = b(j, jT) * yScale(jT) / xScale(j - ic)
        acc += xCenter(j - ic) * b(j, jT)
        j += 1
      }
      if (intercept)
        b(0, jT) = b(0, jT) * yScale(jT) + yCenter(jT) - acc
      jT += 1
    }
    b
  }
}
