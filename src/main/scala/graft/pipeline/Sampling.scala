package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det

/** Deterministic sampling for training-data mixture building. Both
  * operators key off a SALTED md5 hash of the row id, so a sample is
  * reproducible across runs, engines, partitionings and re-executions
  * (speculation/AQE re-runs select the same rows), and changing the salt
  * yields an independent resample without touching the data.
  */
object Sampling {

  /** Salted 60-bit row hash — the shared ordering/splitting primitive. */
  def rowHash(idCol: Column, salt: String): Column =
    Det.md5Hash60(concat(lit(salt + "-"), idCol.cast("string")))

  /** Per-stratum quota sample: within each stratum, rows rank by the
    * salted hash (id tie-break) and the first `quota` survive. The
    * rank-then-filter shape is intentionally the one Spark's
    * WindowGroupLimit optimization recognizes: each input partition keeps
    * only its local top-`quota` BEFORE the stratum shuffle, so a skewed
    * stratum costs map-side heaps, not a full stratum sort.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], quota: Int,
                       salt: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(rowHash(col(idCol), salt), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= quota)
  }

  /** Rate-based mixture resampling: keep each row with its stratum's
    * per-mille rate (a mixture-weight table, e.g. downsample web crawl,
    * keep all of wiki). Purely row-local — `keep = hash mod 1000 <
    * rate_permille` — so no shuffle, no count pass, and a row's verdict
    * never changes when the corpus grows or the job re-executes; integer
    * thresholds keep the verdict engine-exact. Rates > 1000 would mean
    * upsampling (emit ⌊r/1000⌋ copies + one with the remainder rate) —
    * deliberately out of scope here; pair with `stratifiedSample` for
    * exact quotas instead.
    */
  def rateSample(df: DataFrame, strataCol: Column, ratesPermille: Map[String, Int],
                 defaultPermille: Int, salt: String, idCol: String): DataFrame = {
    require((defaultPermille +: ratesPermille.values.toSeq)
      .forall(r => r >= 0 && r <= 1000), s"rates must be in [0,1000]")
    val rate = ratesPermille.toSeq.sortBy(_._1).foldRight(lit(defaultPermille): Column) {
      case ((s, r), acc) => when(strataCol === s, lit(r)).otherwise(acc)
    }
    df.withColumn("keep", rowHash(col(idCol), salt) % 1000 < rate)
  }

  /** Deterministic train/validation/test assignment: bucket = hash mod
    * `denom`, split by cumulative thresholds (e.g. Seq(80, 90) with
    * denom=100 → 80/10/10). Purely row-local — no shuffle, no state; the
    * assignment of a row never changes when the corpus grows.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                thresholds: Seq[Int], denom: Int = 100): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.last < denom, s"bad thresholds $thresholds / $denom")
    val bucket = rowHash(col(idCol), salt) % denom
    val names = (0 to thresholds.size).map(i => lit(s"split_$i"))
    val split = thresholds.zipWithIndex.foldRight(names.last: Column) {
      case ((t, i), acc) => when(bucket < t, names(i)).otherwise(acc)
    }
    df.withColumn("split", split)
  }
}
