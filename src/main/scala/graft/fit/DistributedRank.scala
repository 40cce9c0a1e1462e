package graft.fit

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global ranking without a single-partition window.
  *
  * `Window.orderBy(x)` with no partition key moves EVERY row into one task
  * (Spark warns exactly this) — a guaranteed single-executor OOM at the
  * 100 TB design point. The scalable form: callers first reduce to one row
  * per distinct order key (a map-side-combinable groupBy), then
  * [[withPrefixSum]] adds the running total of a weight column over the
  * range-sorted distinct table — two lightweight jobs sharing one shuffle,
  * fully parallel. Average ranks for ties follow in closed form:
  * `avg_rank = cum_before + (cnt + 1) / 2` (the mean of `cnt` consecutive
  * integers starting after the strictly-smaller rows).
  */
object DistributedRank {

  /** Appends `cum_before`: the sum of `weightCol` (a LONG column) over all
    * rows STRICTLY before this row in ascending `orderCols` order.
    *
    * Physical shape: one range shuffle of the (pre-aggregated) input; job 1
    * collects per-partition weight totals (#partitions longs — the same
    * count job `zipWithIndex` runs, but summing weights so the input can be
    * a grouped table instead of raw rows); job 2 re-reads the shuffle and
    * emits running sums seeded with the partition's offset. Rows never
    * funnel through one task at any point.
    */
  def withPrefixSum(df: DataFrame, orderCols: Seq[String],
                    weightCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(p, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    val rdd = sorted.rdd // one RDD → both jobs reuse the range shuffle
    // addExact everywhere: a wrapped running total would be a plausible-
    // looking wrong rank, while the oracle side (DuckDB HUGEINT) stays
    // correct — overflow must be loud, exactly like the Det grid guards
    val partSums = rdd.mapPartitions { it =>
      var s = 0L
      it.foreach(r => s = Math.addExact(s, r.getLong(wIdx)))
      Iterator.single(s)
    }.collect()
    val offsets = partSums.scanLeft(0L)(Math.addExact)
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var c = offsets(i)
      it.map { r =>
        val before = c
        c = Math.addExact(c, r.getLong(wIdx))
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(out, StructType(sorted.schema.fields :+
      StructField("cum_before", LongType, nullable = false)))
  }
}
