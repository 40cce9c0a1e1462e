package graft.fit

import java.math.{BigDecimal => JBigDecimal}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.slope._

/** The loss+gradient reduce as a typed Dataset `Aggregator` — the UDAF
  * face of the engine's core pass (SURVEY §2.5: the gradient reduce "could
  * also be expressed as a TypedImperativeAggregate"; `RddOps` owns the hot
  * path via `treeAggregate`, this Aggregator makes the same computation
  * SQL-visible and composable with `groupBy`, e.g. per-segment gradient
  * diagnostics).
  *
  * Accumulation is EXACT: each addend is fixed to an integer grid with
  * `floor(v·10^s + 0.5)` and summed as BigDecimal (the `Det` recipe —
  * rounding the same IEEE double with the same function in both engines,
  * so agreement with the DuckDB oracle is structural), making the result
  * invariant to partitioning, AQE re-plans and speculative retries.
  * BigDecimal (not long) accumulation keeps the TOTAL overflow-safe at
  * 100 TB row counts.
  */
final case class GradState(loss: JBigDecimal, gradSum: Array[JBigDecimal])

/** Aggregator output: total loss + [intercept, feature...] gradient. */
final case class GradResult(loss: Double, grads: Array[Double])

class GradientAggregator(
    beta0: Double, // intercept (raw scale)
    betas: Array[Double], // feature coefficients (raw scale)
    family: Family,
    lossScale: Int = 3,
    gradScale: Int = 6)
  extends Aggregator[(Double, Array[Double]), GradState, GradResult] {

  private val p = betas.length

  def zero: GradState =
    GradState(JBigDecimal.ZERO, Array.fill(p + 1)(JBigDecimal.ZERO))

  private val lossM = math.pow(10, lossScale)
  private val gradM = math.pow(10, gradScale)

  // the Det floor-grid addend: an exact integer, cheap to build and to add.
  // Non-finite input must fail LOUDLY (as the previous BigDecimal.valueOf
  // path and the DuckDB oracle's BIGINT cast both do) — floor(NaN).toLong
  // would silently contribute 0 and the aggregate would disagree with the
  // oracle while looking plausible
  private def dec(v: Double, m: Double): JBigDecimal = {
    if (!java.lang.Double.isFinite(v))
      throw new ArithmeticException(s"non-finite addend in exact aggregation: $v")
    val g = Math.floor(v * m + 0.5)
    // magnitude guard: .toLong silently clamps at ±Long.MaxValue (and
    // Spark's non-ANSI cast clamps the same way) while the DuckDB oracle's
    // BIGINT cast ERRORS — an out-of-range addend must fail loudly here
    // too, not produce a plausible-looking wrong sum
    if (Math.abs(g) >= 9.223372036854776e18)
      throw new ArithmeticException(s"addend overflows the 1e$gradScale grid: $v")
    JBigDecimal.valueOf(g.toLong)
  }

  def reduce(b: GradState, row: (Double, Array[Double])): GradState = {
    val (y, x) = row
    var lp = beta0
    var j = 0
    while (j < p) { lp += betas(j) * x(j); j += 1 }
    val ya = Array(y)
    val lpa = Array(lp)
    val loss = b.loss.add(dec(family.rowPrimal(ya, lpa), lossM))
    val g = family.rowPseudoGradient(ya, lpa)(0)
    val gs = b.gradSum.clone()
    gs(0) = gs(0).add(dec(g, gradM)) // intercept gradient
    j = 0
    while (j < p) { gs(j + 1) = gs(j + 1).add(dec(x(j) * g, gradM)); j += 1 }
    GradState(loss, gs)
  }

  def merge(a: GradState, b: GradState): GradState =
    GradState(a.loss.add(b.loss),
      Array.tabulate(p + 1)(j => a.gradSum(j).add(b.gradSum(j))))

  def finish(r: GradState): GradResult =
    // grid-integer totals back to value scale; the double division mirrors
    // the oracle's `::DOUBLE / 1e{s}` exactly
    GradResult(r.loss.doubleValue() / lossM, r.gradSum.map(_.doubleValue() / gradM))

  def bufferEncoder: Encoder[GradState] = Encoders.kryo[GradState]
  def outputEncoder: Encoder[GradResult] = Encoders.product[GradResult]
}
