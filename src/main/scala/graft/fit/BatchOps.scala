package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.slope._

/** Data-pass interface for the SLOPE solvers.
  *
  * The solvers (FISTA / ADMM path driver) are pure driver-side loops; every
  * touch of the data goes through this interface so the same orchestration
  * code runs against an in-memory matrix (tests, small problems) and a
  * Spark-cached RDD (`RddOps`, one `treeAggregate` per call). Column index 0
  * is the unpenalized intercept column of ones when `intercept` is set
  * (reference cbind(1, x) at R/owl.R:444-445); features are standardized
  * on the fly via (x−center)/scale so sparse inputs are never densified
  * (reference src/standardize.h:42-71 keeps sparse uncentered).
  */
trait BatchOps {
  def n: Long

  /** Total columns including the intercept column when present. */
  def p: Int

  /** Targets (m−1 classes for multinomial, else 1). */
  def m: Int
  def intercept: Boolean
  def family: Family

  /** Column means of the (preprocessed) response. */
  def yMeans: Array[Double]

  /** One data pass: (primal loss, Fenchel dual, full gradient p×m) at β. */
  def lossGrad(beta: DenseMatrix[Double]): (Double, Double, DenseMatrix[Double])

  /** One (lighter) data pass: primal loss at β, for the line search. */
  def primal(beta: DenseMatrix[Double]): Double

  /** |Xᵀ t(y)| flattened column-major, excluding the intercept row — the
    * family-specific null-model gradient magnitude used for σ_max
    * (reference src/lambdaMax.h:8-60).
    */
  def lambdaMaxVec(): Array[Double]

  /** View of this data restricted to the given (ascending, full-space)
    * column indices; index 0 = intercept when present.
    */
  def subset(cols: Array[Int]): BatchOps

  /** One data pass: (XᵀX, Xᵀy) over this ops' standardized columns, for the
    * small-p gaussian ADMM fast path.
    */
  def gramXty(): (DenseMatrix[Double], DenseMatrix[Double])

  /** Number of data passes issued so far (shared with subset views). */
  def dataPasses: Long
}

/** In-memory implementation over breeze matrices. X must already contain the
  * intercept column (if any) and be standardized; Y preprocessed
  * (centered / {−1,+1} / one-hot m−1 / counts).
  *
  * Data passes run blocked-parallel over row ranges (common ForkJoinPool):
  * the adaptive substrate routes problems up to ~10⁶ cells here, where a
  * FISTA solve means hundreds of passes — single-threaded row loops were
  * the measured bottleneck of every local fit. Block partials combine in
  * fixed index order, so results are deterministic for a given block count.
  */
final class LocalOps(
    xMat: DenseMatrix[Double],
    yMat: DenseMatrix[Double],
    val family: Family,
    val intercept: Boolean,
    passCounter: java.util.concurrent.atomic.AtomicLong =
      new java.util.concurrent.atomic.AtomicLong(0L)
) extends BatchOps {
  require(!xMat.isTranspose && !yMat.isTranspose,
    "LocalOps needs column-major (non-transposed) matrices")

  def n: Long = xMat.rows.toLong
  def p: Int = xMat.cols
  def m: Int = yMat.cols
  def dataPasses: Long = passCounter.get()

  lazy val yMeans: Array[Double] =
    Array.tabulate(m)(j => breeze.linalg.sum(yMat(::, j)) / n.toDouble)

  /** Row blocks sized so each is worth a task (≥ ~16k rows). */
  private val nBlocks: Int = {
    val cores = Runtime.getRuntime.availableProcessors()
    math.max(1, math.min(cores, xMat.rows / 16384))
  }
  private def blockLo(b: Int): Int = (b.toLong * xMat.rows / nBlocks).toInt
  private def blockHi(b: Int): Int = ((b + 1).toLong * xMat.rows / nBlocks).toInt

  private def parBlocks[T: scala.reflect.ClassTag](f: Int => T): Array[T] = {
    val out = new Array[T](nBlocks)
    if (nBlocks == 1) out(0) = f(0)
    else java.util.stream.IntStream.range(0, nBlocks).parallel()
      .forEach(((b: Int) => out(b) = f(b)): java.util.function.IntConsumer)
    out
  }

  /** (primal, dual, Xᵀpg partial) over rows [lo, hi): a hand-blocked gemm
    * for the linear predictor (column-major-friendly), the fused row loop
    * with reused buffers, then the gradient block-gemm — no n-sized
    * allocations beyond the block.
    */
  private def blockLossGrad(lo: Int, hi: Int, beta: DenseMatrix[Double],
                            wantDualPg: Boolean): (Double, Double, Array[Double]) = {
    val rows = hi - lo
    val pC = xMat.cols
    val mC = yMat.cols
    val xd = xMat.data; val xoff = xMat.offset; val xms = xMat.majorStride
    val yd = yMat.data; val yoff = yMat.offset; val yms = yMat.majorStride
    // lp(r, j) for block rows, column-major over the block
    val lp = new Array[Double](rows * mC)
    var j = 0
    while (j < mC) {
      var c = 0
      while (c < pC) {
        val bcj = beta(c, j)
        if (bcj != 0.0) {
          val base = xoff + c * xms + lo
          val lpBase = j * rows
          var r = 0
          while (r < rows) { lp(lpBase + r) += xd(base + r) * bcj; r += 1 }
        }
        c += 1
      }
      j += 1
    }
    val yRow = new Array[Double](mC)
    val lpRow = new Array[Double](mC)
    val gRow = new Array[Double](mC)
    val accPD = new Array[Double](2) // (primal, dual) fused accumulator
    val pg = if (wantDualPg) new Array[Double](rows * mC) else null
    var primalAcc = 0.0
    var dualAcc = 0.0
    var r = 0
    while (r < rows) {
      var j2 = 0
      while (j2 < mC) {
        yRow(j2) = yd(yoff + j2 * yms + lo + r)
        lpRow(j2) = lp(j2 * rows + r)
        j2 += 1
      }
      if (wantDualPg) {
        // fused triple: one transcendental pass, no per-row allocation
        // (bit-identical to the three row methods — see Family.rowFusedInto)
        family.rowFusedInto(yRow, lpRow, gRow, accPD)
        j2 = 0
        while (j2 < mC) { pg(j2 * rows + r) = gRow(j2); j2 += 1 }
      } else {
        primalAcc += family.rowPrimal(yRow, lpRow)
      }
      r += 1
    }
    if (!wantDualPg) return (primalAcc, 0.0, null)
    primalAcc = accPD(0)
    dualAcc = accPD(1)
    // grad partial: gP(c, j) = Σ_r x(lo+r, c) · pg(r, j)
    val gP = new Array[Double](pC * mC)
    j = 0
    while (j < mC) {
      var c = 0
      while (c < pC) {
        val base = xoff + c * xms + lo
        val pgBase = j * rows
        var acc = 0.0
        var r2 = 0
        while (r2 < rows) { acc += xd(base + r2) * pg(pgBase + r2); r2 += 1 }
        gP(c + j * pC) += acc
        c += 1
      }
      j += 1
    }
    (primalAcc, dualAcc, gP)
  }

  def lossGrad(beta: DenseMatrix[Double]): (Double, Double, DenseMatrix[Double]) = {
    passCounter.incrementAndGet()
    val parts = parBlocks(b => blockLossGrad(blockLo(b), blockHi(b), beta, wantDualPg = true))
    val pC = xMat.cols
    val mC = yMat.cols
    val grad = DenseMatrix.zeros[Double](pC, mC)
    var primalAcc = 0.0
    var dualAcc = 0.0
    var b = 0
    while (b < parts.length) {
      val (pr, du, gP) = parts(b)
      primalAcc += pr
      dualAcc += du
      var j = 0
      while (j < mC) {
        var c = 0
        while (c < pC) { grad(c, j) += gP(c + j * pC); c += 1 }
        j += 1
      }
      b += 1
    }
    (primalAcc, dualAcc, grad)
  }

  def primal(beta: DenseMatrix[Double]): Double = {
    passCounter.incrementAndGet()
    val parts = parBlocks(b => blockLossGrad(blockLo(b), blockHi(b), beta, wantDualPg = false))
    var acc = 0.0
    var b = 0
    while (b < parts.length) { acc += parts(b)._1; b += 1 }
    acc
  }

  def lambdaMaxVec(): Array[Double] = {
    passCounter.incrementAndGet()
    val skip = if (intercept) 1 else 0
    // LocalOps holds y already centered (gaussian) → zero yCenter here
    val t = LambdaMaxTransform(family, yMeans, Array.fill(m)(0.0))
    val pf = p - skip
    val acc = new Array[Double](pf * m)
    val yRow = new Array[Double](m)
    // row-outer with one reused label buffer (no per-cell allocations)
    var r = 0
    while (r < xMat.rows) {
      var k = 0
      while (k < m) { yRow(k) = yMat(r, k); k += 1 }
      var j = 0
      while (j < m) {
        val tj = t(yRow, j)
        var c = 0
        while (c < pf) { acc(c + j * pf) += xMat(r, skip + c) * tj; c += 1 }
        j += 1
      }
      r += 1
    }
    var i = 0
    while (i < acc.length) { acc(i) = math.abs(acc(i)); i += 1 }
    acc
  }

  def subset(cols: Array[Int]): BatchOps = {
    val sub = DenseMatrix.zeros[Double](xMat.rows, cols.length)
    var j = 0
    while (j < cols.length) { sub(::, j) := xMat(::, cols(j)); j += 1 }
    new LocalOps(sub, yMat, family, intercept, passCounter)
  }

  def gramXty(): (DenseMatrix[Double], DenseMatrix[Double]) = {
    passCounter.incrementAndGet()
    (xMat.t * xMat, xMat.t * yMat)
  }
}

/** The family-specific response transform of `lambdaMax`
  * (reference src/lambdaMax.h:15-53). Values are per-row; means come from a
  * prior stats pass. For multinomial the z-scoring by y_std cancels against
  * the post-multiplication in the reference, leaving plain centering.
  *
  * `yCenter` is the response centering that has NOT yet been applied to the
  * stored labels (RddOps keeps raw labels; LocalOps pre-centers and passes
  * zeros) — the reference computes gaussian lambdaMax on the CENTERED y, and
  * without this the result is only accidentally right when xCenter happens
  * to equal the column means (it broke for center=false).
  */
object LambdaMaxTransform {
  def apply(family: Family, yMeans: Array[Double],
            yCenter: Array[Double]): (Array[Double], Int) => Double =
    family match {
      case Binomial =>
        // y ∈ {−1,+1} → (y+1)/2, centered by its mean
        val c = (yMeans(0) + 1.0) / 2.0
        (y, _) => (y(0) + 1.0) / 2.0 - c
      case Multinomial =>
        (y, j) => y(j) - yMeans(j)
      case Poisson =>
        (y, _) => 1.0 - y(0)
      case Gaussian =>
        val c = yCenter(0)
        (y, _) => y(0) - c
    }
}
