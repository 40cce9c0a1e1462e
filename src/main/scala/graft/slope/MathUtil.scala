package graft.slope

/** Scalar numerics shared by the SLOPE engine.
  *
  * The overflow-guarded exp/log match the reference's Armadillo
  * `trunc_exp`/`trunc_log` semantics (used throughout the reference's
  * family headers under src/families/): exp saturates at the largest finite double;
  * log of a non-positive input saturates at log of the smallest normalized
  * positive double; log(+inf) saturates at log of the largest finite double.
  * These guards determine oracle-agreement tolerances (SURVEY.md §4.1), so
  * they are replicated exactly rather than approximated.
  */
object MathUtil {
  /** Machine epsilon for doubles (Armadillo `datum::eps`). */
  val Eps: Double = 2.220446049250313e-16

  /** log(largest finite double) ≈ 709.78 (Armadillo `datum::log_max`). */
  val LogMax: Double = math.log(Double.MaxValue)

  /** log(smallest normalized positive double) ≈ −708.40 (`datum::log_min`). */
  val LogMin: Double = math.log(java.lang.Double.MIN_NORMAL)

  def truncExp(x: Double): Double =
    if (x >= LogMax) Double.MaxValue else math.exp(x)

  def truncLog(x: Double): Double =
    if (x == Double.PositiveInfinity) LogMax
    else if (x <= 0.0) LogMin
    else math.log(x)

  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  def clamp(x: Double, lo: Double, hi: Double): Double =
    math.min(math.max(x, lo), hi)

  /** Standard-normal quantile Φ⁻¹ via commons-math3 (ships in
    * /opt/spark/jars). Matches R's qnorm to ~1e-15 relative. One shared
    * stateless instance (rng-free constructor) — λ-sequence construction
    * calls this p·m times per fit.
    */
  private val stdNormal =
    new org.apache.commons.math3.distribution.NormalDistribution(null, 0.0, 1.0)

  def qnorm(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  def logGamma(x: Double): Double =
    org.apache.commons.math3.special.Gamma.logGamma(x)

  /** The reference multinomial's logsumexp with the implicit reference-class
    * zero entry (reference src/families/multinomial.h:15-22):
    * `log(exp(-max) + Σ exp(x_i - max)) + max`, max over x only.
    */
  def logSumExp0(row: Array[Double]): Double = {
    var mx = row(0)
    var i = 1
    while (i < row.length) { if (row(i) > mx) mx = row(i); i += 1 }
    var s = math.exp(-mx)
    i = 0
    while (i < row.length) { s += truncExp(row(i) - mx); i += 1 }
    truncLog(s) + mx
  }
}
