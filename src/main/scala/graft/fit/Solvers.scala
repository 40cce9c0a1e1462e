package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector, cholesky}
import graft.slope._

/** Per-solve result (reference src/results.h:8-30). */
final case class SolveResult(
    beta: DenseMatrix[Double],
    passes: Int,
    primals: List[Double],
    duals: List[Double],
    times: List[Double],
    deviance: Double,
    /** Final FISTA step size, for warm-starting the next solve on the same
      * data (the smooth-part Lipschitz constant is λ-independent, so the
      * accepted rate from one path step is a valid start for the next —
      * re-deriving it costs one distributed primal pass per halving).
      */
    learningRate: Double = 1.0,
    /** TRUE when the solve exited through the numerical-floor stall guard
      * (returning the best-gap feasible iterate) rather than the relative
      * duality-gap test — callers and certificates can distinguish "gap hit
      * its floating-point floor" from "converged to tolRelGap".
      */
    stallExit: Boolean = false)

final case class SolverConfig(
    maxPasses: Int = 1000000,
    tolRelGap: Double = 1e-5,
    tolInfeas: Double = 1e-3,
    tolAbs: Double = 1e-5,
    tolRel: Double = 1e-4,
    diagnostics: Boolean = false)

/** FISTA with backtracking line search and Nesterov momentum — the generic
  * solver for all families (reference src/families/family.h:87-223).
  *
  * The loop is driver-side; each iteration costs one `lossGrad` data pass
  * plus one `primal` pass per line-search candidate. The learning rate only
  * ever shrinks within a solve (matching the reference) AND the accepted
  * rate is threaded across solves by the path driver (our addition — the
  * smooth-part Lipschitz constant is λ-independent), so over a whole path
  * the extra line-search passes are bounded by log₂ of the Lipschitz
  * constant once, not per σ step — the property that keeps this viable when
  * a pass means a cluster-wide treeAggregate (SURVEY.md §4.3).
  */
object Fista {

  def fit(ops: BatchOps,
          beta0: DenseMatrix[Double],
          lambda: Array[Double],
          cfg: SolverConfig,
          initialLearningRate: Double = 1.0): SolveResult = {
    val p = beta0.rows
    val m = beta0.cols
    val pRows = if (lambda.length > 0) lambda.length / m else 0 // penalized rows

    var beta = beta0.copy
    var betaTilde = beta0.copy
    var betaTildeOld = beta0.copy

    var learningRate = initialLearningRate
    val eta = 0.5
    var t = 1.0

    var primals = List.empty[Double]
    var duals = List.empty[Double]
    var times = List.empty[Double]
    val t0 = System.nanoTime()

    val small = math.sqrt(MathUtil.Eps)
    var lastPrimal = 0.0
    var passes = 0
    var done = false
    // numerical-floor stall guard (ours; the reference loops to max_passes):
    // a tolerance below what double-precision objective/gap estimates can
    // resolve at this n must degrade to "stopped at the numerical floor",
    // NOT an unbounded loop of full data passes. At 6M rows a 1e-12
    // RELATIVE gap is below the accumulated-sum noise of the primal/dual
    // estimates, and without this guard the solver burns one distributed
    // pass per iteration making zero representable progress (measured:
    // the saturating-σ binomial anchor ran >30 min of 6M-row passes).
    // The guard arms only on FEASIBLE iterates (dual infeasibility already
    // under tolInfeas — the condition the path's KKT layer actually needs)
    // and fires on gap STAGNATION, not strict non-improvement: 30
    // consecutive feasible iterations whose cumulative relative-gap
    // improvement since the arm point is under 0.01% ⇒ the gap has hit its
    // floating-point floor. (Strict non-improvement with a 100-iteration
    // window let sub-noise "improvements" re-arm the counter for hundreds
    // of full-data passes — measured ~2× suite cost on the MLE anchors.)
    // FISTA's momentum is non-monotone, so the CURRENT iterate at stall
    // time can be worse than the best one seen: the solve returns the
    // BEST-GAP FEASIBLE iterate (snapshotted below) and flags the exit in
    // `SolveResult.stallExit`. Infeasible iterates never count toward the
    // stall, so a solve still working toward feasibility is untouched
    // however its objective oscillates under momentum.
    var bestGap = Double.MaxValue
    var bestBeta: DenseMatrix[Double] = null
    var bestPrimal = 0.0
    var armGap = Double.MaxValue
    var stalled = 0
    val stallBand = 1e-4
    val stallWindow = 30
    var stallExit = false

    while (passes < cfg.maxPasses && !done) {
      val (g0, dualVal, grad) = ops.lossGrad(beta)
      lastPrimal = g0
      val h = SortedL1.penalty(tailFlat(beta, pRows), lambda)
      val f = g0 + h
      val infeas =
        if (lambda.length > 0)
          SortedL1.infeasibility(tailFlat(grad, pRows), lambda)
        else 0.0

      val optimal = math.abs(f - dualVal) / math.max(small, math.abs(f)) < cfg.tolRelGap
      val feasible =
        if (lambda.length > 0) infeas <= math.max(small, cfg.tolInfeas * lambda(0))
        else true

      val gap = math.abs(f - dualVal) / math.max(small, math.abs(f))
      if (!feasible) { stalled = 0; armGap = Double.MaxValue }
      else {
        if (gap < bestGap) { bestGap = gap; bestBeta = beta.copy; bestPrimal = g0 }
        if (gap < armGap * (1.0 - stallBand)) { armGap = gap; stalled = 0 }
        else stalled += 1
      }

      if (cfg.diagnostics) {
        times ::= (System.nanoTime() - t0) / 1e9
        primals ::= f
        duals ::= dualVal
      }

      if ((optimal && feasible) || stalled >= stallWindow) {
        done = true
        stallExit = !(optimal && feasible)
      } else {
        betaTildeOld = betaTilde
        val gOld = g0
        val tOld = t

        // backtracking line search (halving; candidates cost one pass each)
        var searching = true
        while (searching) {
          betaTilde = beta - (grad * learningRate)
          if (pRows > 0) setTail(betaTilde, pRows,
            SortedL1.prox(tailFlat(betaTilde, pRows), lambda.map(_ * learningRate)))

          val d = (betaTilde - beta)
          val gNew = ops.primal(betaTilde)
          lastPrimal = gNew

          var dotGd = 0.0
          var dd = 0.0
          var j = 0
          while (j < m) {
            var i = 0
            while (i < p) {
              dotGd += d(i, j) * grad(i, j)
              dd += d(i, j) * d(i, j)
              i += 1
            }
            j += 1
          }
          val q = gOld + dotGd + dd / (2.0 * learningRate)
          if (q >= gNew * (1.0 - 1e-12)) searching = false
          else {
            learningRate *= eta
            // divergence guard: a non-finite objective (overflowed linear
            // predictor) can never satisfy the sufficient-decrease test, and
            // each retry costs a distributed pass — fail loudly instead of
            // spinning (the reference only had checkUserInterrupt here)
            if (learningRate < 1e-30)
              throw new IllegalStateException(
                s"FISTA line search diverged (primal=$gNew); data may need rescaling")
          }
        }

        t = 0.5 * (1.0 + math.sqrt(1.0 + 4.0 * tOld * tOld))
        beta = betaTilde + ((betaTilde - betaTildeOld) * ((tOld - 1.0) / t))
        passes += 1
      }
    }

    // the reference returns the momentum point (the iterate the convergence
    // test was evaluated at), src/families/family.h:210-218. A stall exit
    // instead returns the best-gap FEASIBLE iterate: momentum is
    // non-monotone, so the current iterate at stall time can be worse than
    // the plateau's best.
    if (stallExit && bestBeta != null)
      SolveResult(bestBeta, passes, primals.reverse, duals.reverse, times.reverse,
        deviance = 2.0 * bestPrimal, learningRate = learningRate, stallExit = true)
    else
      SolveResult(beta, passes, primals.reverse, duals.reverse, times.reverse,
        deviance = 2.0 * lastPrimal, learningRate = learningRate,
        stallExit = stallExit)
  }

  /** Last `pRows` rows of a p×m matrix, flattened column-major (the
    * penalized coefficients; intercept rows excluded).
    */
  private[fit] def tailFlat(mat: DenseMatrix[Double], pRows: Int): Array[Double] = {
    val skip = mat.rows - pRows
    val out = new Array[Double](pRows * mat.cols)
    var j = 0
    while (j < mat.cols) {
      var i = 0
      while (i < pRows) { out(i + j * pRows) = mat(skip + i, j); i += 1 }
      j += 1
    }
    out
  }

  private[fit] def setTail(mat: DenseMatrix[Double], pRows: Int, values: Array[Double]): Unit = {
    val skip = mat.rows - pRows
    var j = 0
    while (j < mat.cols) {
      var i = 0
      while (i < pRows) { mat(skip + i, j) = values(i + j * pRows); i += 1 }
      j += 1
    }
  }
}

/** ADMM for the gaussian family (reference src/families/gaussian.h:48-139,
  * tall-data branch): β-update through a cached Cholesky of XᵀX+ρI,
  * over-relaxation α=1.5, sorted-L1 prox on z, primal/dual-residual
  * stopping. Only used when the active set is small enough for a driver-side
  * p×p Gram (the Woodbury n<p branch needs an n×n factor and is not
  * distributable — FISTA covers wide data; SURVEY.md §4.1).
  *
  * ρ: the reference's heuristic at src/owl.cpp:196-203 computes
  * `pow(eigmax, 1/3) * pow(σλmax, 2/3)` with INTEGER exponents 1/3 = 2/3 = 0,
  * so the shipped binary always runs with ρ = 1. We match that behavior
  * (and skip the dead eigendecomposition).
  */
object AdmmGaussian {
  val alpha = 1.5
  val rho = 1.0

  /** Cached factorization state carried across path steps
    * (reference `factorized` flag, src/owl.cpp:140,178-203).
    */
  final case class Factor(l: DenseMatrix[Double], xty: DenseVector[Double])

  def factorize(ops: BatchOps): Factor = {
    val (gram, xty) = ops.gramXty()
    val a = gram.copy
    var i = 0
    while (i < a.rows) { a(i, i) += rho; i += 1 }
    Factor(cholesky(a), xty(::, 0).copy)
  }

  /** Solve (LLᵀ)x = b given lower-triangular L. */
  private def cholSolve(l: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val n = l.rows
    val y = b.copy
    // forward substitution L y = b
    var i = 0
    while (i < n) {
      var s = y(i)
      var k = 0
      while (k < i) { s -= l(i, k) * y(k); k += 1 }
      y(i) = s / l(i, i)
      i += 1
    }
    // back substitution Lᵀ x = y
    i = n - 1
    while (i >= 0) {
      var s = y(i)
      var k = i + 1
      while (k < n) { s -= l(k, i) * y(k); k += 1 }
      y(i) = s / l(i, i)
      i -= 1
    }
    y
  }

  def fit(ops: BatchOps,
          factor: Factor,
          z: DenseVector[Double],
          u: DenseVector[Double],
          lambda: Array[Double],
          cfg: SolverConfig): SolveResult = {
    val p = factor.xty.length
    val nL = lambda.length
    var passes = 0
    var primals = List.empty[Double]
    var duals = List.empty[Double]
    var times = List.empty[Double]
    val t0 = System.nanoTime()

    var beta = DenseVector.zeros[Double](p)
    var done = false
    while (passes < cfg.maxPasses && !done) {
      passes += 1
      val q = factor.xty + ((z - u) * rho)
      beta = cholSolve(factor.l, q)

      val zOld = z.copy
      val betaHat = (beta * alpha) + (zOld * (1.0 - alpha))

      val zNew = betaHat + u
      if (nL > 0) {
        val tail = new Array[Double](nL)
        var i = 0
        while (i < nL) { tail(i) = zNew(p - nL + i); i += 1 }
        val proxed = SortedL1.prox(tail, lambda.map(_ / rho))
        i = 0
        while (i < nL) { zNew(p - nL + i) = proxed(i); i += 1 }
      }
      z := zNew
      u += betaHat - z

      val rNorm = breeze.linalg.norm(beta - z)
      val sNorm = breeze.linalg.norm((z - zOld) * rho)
      val epsPrimal = math.sqrt(ops.n.toDouble) * cfg.tolAbs +
        cfg.tolRel * math.max(breeze.linalg.norm(beta), breeze.linalg.norm(z))
      val epsDual = math.sqrt(ops.n.toDouble) * cfg.tolAbs +
        cfg.tolRel * breeze.linalg.norm(u * rho)

      if (cfg.diagnostics) {
        primals ::= rNorm
        duals ::= sNorm
        times ::= (System.nanoTime() - t0) / 1e9
      }
      if (rNorm < epsPrimal && sNorm < epsDual) done = true
    }

    val betaOut = new DenseMatrix(p, 1, z.toArray.clone())
    val deviance = 2.0 * ops.primal(betaOut)
    SolveResult(betaOut, passes, primals.reverse, duals.reverse, times.reverse, deviance)
  }
}
