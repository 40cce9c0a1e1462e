package graft.fit

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
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
  * Accumulation is EXACT: each addend is rounded to a fixed decimal scale
  * and summed as BigDecimal (the `Det` recipe), so the result is
  * bit-identical to a DuckDB oracle and invariant to partitioning,
  * AQE re-plans and speculative retries.
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

  private def dec(v: Double, scale: Int): JBigDecimal =
    // valueOf goes through Double.toString — the same path Spark's
    // double→decimal cast takes, so addends match the Det/DuckDB recipe
    JBigDecimal.valueOf(v).setScale(scale, RoundingMode.HALF_UP)

  def reduce(b: GradState, row: (Double, Array[Double])): GradState = {
    val (y, x) = row
    var lp = beta0
    var j = 0
    while (j < p) { lp += betas(j) * x(j); j += 1 }
    val ya = Array(y)
    val lpa = Array(lp)
    val loss = b.loss.add(dec(family.rowPrimal(ya, lpa), lossScale))
    val g = family.rowPseudoGradient(ya, lpa)(0)
    val gs = b.gradSum.clone()
    gs(0) = gs(0).add(dec(g, gradScale)) // intercept gradient
    j = 0
    while (j < p) { gs(j + 1) = gs(j + 1).add(dec(x(j) * g, gradScale)); j += 1 }
    GradState(loss, gs)
  }

  def merge(a: GradState, b: GradState): GradState =
    GradState(a.loss.add(b.loss),
      Array.tabulate(p + 1)(j => a.gradSum(j).add(b.gradSum(j))))

  def finish(r: GradState): GradResult =
    GradResult(r.loss.doubleValue(), r.gradSum.map(_.doubleValue()))

  def bufferEncoder: Encoder[GradState] = Encoders.kryo[GradState]
  def outputEncoder: Encoder[GradResult] = Encoders.product[GradResult]
}
