package graft.slope

import breeze.linalg.DenseMatrix
import MathUtil._

/** The pluggable GLM loss interface (reference src/families/family.h:41-56):
  * primal loss, Fenchel dual (for the duality-gap stopping rule), the
  * pseudo-gradient (residual-space; the full gradient is Xᵀ·pseudoGradient),
  * and the intercept-only null model.
  *
  * Everything is expressed as PER-ROW contributions over (y-row, linpred-row)
  * pairs so the distributed `treeAggregate` passes can sum them partition by
  * partition (map-side partial aggregation); the matrix forms below just loop
  * the row forms and are used by the in-memory test harness and small-data
  * fast path. m > 1 only for multinomial's m−1 full-rank parametrization
  * (NOT MLlib's pivoted m-class softmax — output equivalence requires the
  * reference's layout, SURVEY.md §2.2 G4).
  */
sealed trait Family extends Serializable {
  def name: String

  /** Loss contribution of one row. */
  def rowPrimal(y: Array[Double], lp: Array[Double]): Double

  /** Fenchel-dual contribution of one row. */
  def rowDual(y: Array[Double], lp: Array[Double]): Double

  /** Residual-space gradient of one row (length m); full gradient is
    * Σ_rows x_i ⊗ rowPseudoGradient_i.
    */
  def rowPseudoGradient(y: Array[Double], lp: Array[Double]): Array[Double]

  /** Intercept-only model from the column means of y
    * (all four references' null models depend on y only through its means).
    */
  def nullModelFromMeans(yMean: Array[Double]): Array[Double]

  /** Fused per-row evaluation — ONE transcendental pass for the whole
    * (primal, dual, pseudo-gradient) triple: adds this row's primal into
    * acc(0) and dual into acc(1), writes the pseudo-gradient into `gOut`
    * (length m), allocates nothing. The three separate row methods each
    * recompute the expensive intermediate (logsumexp for multinomial,
    * exp(y·lp) for binomial, exp(lp) for poisson); the overrides compute
    * it once and feed the SAME arithmetic expressions, so results are
    * bit-identical to composing the methods — which is also what the
    * default here does for any family without an override. This is the
    * hot path of every iterative solve: LocalOps' blocked pass and
    * RddOps' treeAggregate call it once per row per iteration.
    */
  def rowFusedInto(y: Array[Double], lp: Array[Double], gOut: Array[Double],
      acc: Array[Double]): Unit = {
    acc(0) += rowPrimal(y, lp)
    acc(1) += rowDual(y, lp)
    val g = rowPseudoGradient(y, lp)
    var j = 0
    while (j < g.length) { gOut(j) = g(j); j += 1 }
  }

  // ---- matrix forms (rows = observations), driver/test-side ----

  final def primal(y: DenseMatrix[Double], lp: DenseMatrix[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < y.rows) { acc += rowPrimal(rowOf(y, i), rowOf(lp, i)); i += 1 }
    acc
  }

  final def dual(y: DenseMatrix[Double], lp: DenseMatrix[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < y.rows) { acc += rowDual(rowOf(y, i), rowOf(lp, i)); i += 1 }
    acc
  }

  final def pseudoGradient(y: DenseMatrix[Double], lp: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](y.rows, y.cols)
    var i = 0
    while (i < y.rows) {
      val g = rowPseudoGradient(rowOf(y, i), rowOf(lp, i))
      var j = 0
      while (j < y.cols) { out(i, j) = g(j); j += 1 }
      i += 1
    }
    out
  }

  protected final def rowOf(m: DenseMatrix[Double], i: Int): Array[Double] = {
    val out = new Array[Double](m.cols)
    var j = 0
    while (j < m.cols) { out(j) = m(i, j); j += 1 }
    out
  }
}

/** Gaussian/OLS: ½‖y−Xβ‖² (reference src/families/gaussian.h:21-45). */
case object Gaussian extends Family {
  val name = "gaussian"
  def rowPrimal(y: Array[Double], lp: Array[Double]): Double = {
    val r = y(0) - lp(0); 0.5 * r * r
  }
  def rowDual(y: Array[Double], lp: Array[Double]): Double =
    0.5 * y(0) * y(0) - 0.5 * lp(0) * lp(0)
  def rowPseudoGradient(y: Array[Double], lp: Array[Double]): Array[Double] =
    Array(lp(0) - y(0))
  def nullModelFromMeans(yMean: Array[Double]): Array[Double] = yMean.clone()
  override def rowFusedInto(y: Array[Double], lp: Array[Double],
      gOut: Array[Double], acc: Array[Double]): Unit = {
    val r = y(0) - lp(0)
    acc(0) += 0.5 * r * r
    acc(1) += 0.5 * y(0) * y(0) - 0.5 * lp(0) * lp(0)
    gOut(0) = lp(0) - y(0)
  }
}

/** Binomial with y ∈ {−1,+1} (reference src/families/binomial.h:15-39;
  * recoding per R/preProcessResponse.R:42).
  */
case object Binomial extends Family {
  val name = "binomial"
  def rowPrimal(y: Array[Double], lp: Array[Double]): Double =
    truncLog(1.0 + truncExp(-y(0) * lp(0)))
  def rowDual(y: Array[Double], lp: Array[Double]): Double = {
    val r = 1.0 / (1.0 + truncExp(y(0) * lp(0)))
    (r - 1.0) * truncLog(1.0 - r) - r * truncLog(r)
  }
  def rowPseudoGradient(y: Array[Double], lp: Array[Double]): Array[Double] =
    Array(-y(0) / (1.0 + truncExp(y(0) * lp(0))))
  override def rowFusedInto(y: Array[Double], lp: Array[Double],
      gOut: Array[Double], acc: Array[Double]): Unit = {
    // dual and gradient share exp(y·lp); the primal's exp(−y·lp) is NOT
    // bit-identical to its reciprocal, so it stays its own call (2 exps
    // for the triple instead of 3, zero allocations)
    val e = truncExp(y(0) * lp(0))
    acc(0) += truncLog(1.0 + truncExp(-y(0) * lp(0)))
    val r = 1.0 / (1.0 + e)
    acc(1) += (r - 1.0) * truncLog(1.0 - r) - r * truncLog(r)
    gOut(0) = -y(0) / (1.0 + e)
  }
  def nullModelFromMeans(yMean: Array[Double]): Array[Double] = {
    val pmin = 1e-9
    val mu = clamp(0.5 * yMean(0) + 0.5, pmin, 1.0 - pmin)
    Array(truncLog(mu / (1.0 - mu)))
  }
}

/** Poisson log-link (reference src/families/poisson.h:15-33). */
case object Poisson extends Family {
  val name = "poisson"
  def rowPrimal(y: Array[Double], lp: Array[Double]): Double =
    -(y(0) * lp(0) - truncExp(lp(0)) - logGamma(y(0) + 1.0))
  def rowDual(y: Array[Double], lp: Array[Double]): Double =
    -(truncExp(lp(0)) * (lp(0) - 1.0) - logGamma(y(0) + 1.0))
  def rowPseudoGradient(y: Array[Double], lp: Array[Double]): Array[Double] =
    Array(truncExp(lp(0)) - y(0))
  def nullModelFromMeans(yMean: Array[Double]): Array[Double] =
    Array(truncLog(yMean(0)))
  override def rowFusedInto(y: Array[Double], lp: Array[Double],
      gOut: Array[Double], acc: Array[Double]): Unit = {
    // all three outputs share exp(lp); primal and dual share logΓ(y+1)
    val e = truncExp(lp(0))
    val lg = logGamma(y(0) + 1.0)
    acc(0) += -(y(0) * lp(0) - e - lg)
    acc(1) += -(e * (lp(0) - 1.0) - lg)
    gOut(0) = e - y(0)
  }
}

/** Multinomial, m−1 full-rank softmax with logsumexp stabilization
  * (reference src/families/multinomial.h:15-51).
  */
case object Multinomial extends Family {
  val name = "multinomial"
  def rowPrimal(y: Array[Double], lp: Array[Double]): Double = {
    var dot = 0.0
    var j = 0
    while (j < lp.length) { dot += y(j) * lp(j); j += 1 }
    logSumExp0(lp) - dot
  }
  def rowDual(y: Array[Double], lp: Array[Double]): Double = {
    val lse = logSumExp0(lp)
    var acc = 0.0
    var j = 0
    while (j < lp.length) { acc += lp(j) * truncExp(lp(j) - lse); j += 1 }
    lse - acc
  }
  def rowPseudoGradient(y: Array[Double], lp: Array[Double]): Array[Double] = {
    val lse = logSumExp0(lp)
    val out = new Array[Double](lp.length)
    var j = 0
    while (j < lp.length) { out(j) = truncExp(lp(j) - lse) - y(j); j += 1 }
    out
  }
  override def rowFusedInto(y: Array[Double], lp: Array[Double],
      gOut: Array[Double], acc: Array[Double]): Unit = {
    // ONE logsumexp + m exps for the whole triple (vs 3 lse + 3m exps
    // composing the row methods): primal, dual and gradient all consume
    // the same lse and the same per-class softmax term
    val lse = logSumExp0(lp)
    var dot = 0.0
    var lpe = 0.0
    var j = 0
    while (j < lp.length) {
      val e = truncExp(lp(j) - lse)
      dot += y(j) * lp(j)
      lpe += lp(j) * e
      gOut(j) = e - y(j)
      j += 1
    }
    acc(0) += lse - dot
    acc(1) += lse - lpe
  }
  /** Exact intercept-only MLE in the m−1 logsumexp0 parametrization:
    * η_k = ln(μ_k / μ_last), the softmax inverse with the implicit-zero
    * reference class. DELIBERATE NON-PORT: the reference's fitNullModel
    * (multinomial.h:43-51) subtracts a mean-of-logits correction that is
    * NOT the softmax inverse (its softmax0 does not reproduce μ) and is
    * never used by the reference's own path driver (owl.cpp inits β=0);
    * this engine warm-starts intercepts at the true null MLE (see
    * SlopePath), so the formula here must be the exact inverse. Class
    * shares are clamped like binomial's so a class absent from a fold
    * cannot produce ±∞.
    */
  def nullModelFromMeans(yMean: Array[Double]): Array[Double] = {
    val pmin = 1e-9
    val muLast = clamp(1.0 - yMean.sum, pmin, 1.0 - pmin)
    yMean.map(mu => truncLog(clamp(mu, pmin, 1.0 - pmin)) - truncLog(muLast))
  }
}

object Family {
  /** Family factory (reference src/families/families.h:15-27). */
  def apply(name: String): Family = name match {
    case "binomial"    => Binomial
    case "poisson"     => Poisson
    case "multinomial" => Multinomial
    case _             => Gaussian
  }
}
