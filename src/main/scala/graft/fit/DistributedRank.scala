package graft.fit

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global ranking without a single-partition window.
  *
  * `Window.orderBy(x)` with no partition key moves EVERY row into one task
  * (Spark warns exactly this) — a guaranteed single-executor OOM at the
  * 100 TB design point. The scalable form is a range-partitioned sort +
  * `zipWithIndex` (per-partition offsets from one lightweight count job),
  * which keeps ranking fully parallel. Average ranks for ties follow from a
  * groupBy over the key.
  */
object DistributedRank {

  /** (key..., rn) with rn = 1-based global position in ascending `orderCol`
    * order (ties broken arbitrarily — callers must aggregate per value for
    * tie-stable statistics).
    */
  def withRowNumbers(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val sorted = df.sort(orderCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("rn", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
