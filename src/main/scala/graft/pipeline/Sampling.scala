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

  /** Deterministic global training-order shuffle: an epoch-salted hash is
    * the shuffle key, and `shard = key mod nShards` gives every row a
    * stable output-file assignment. Purely row-local (no shuffle here);
    * the ORDER itself is materialized downstream by a range-partitioned
    * sort on `shuffle_key` (plain `orderBy` — Spark samples split points,
    * so no global window and no single-task sort at any scale), or by
    * writing `partitionBy(shard)` + sorting within files. A different
    * epoch salt is an independent permutation of the same corpus.
    */
  def trainOrder(df: DataFrame, idCol: String, epochSalt: String,
                 nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shuffle_key", rowHash(col(idCol), epochSalt))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)))
  }

  /** Token-budget mixture: each source's share of a global token budget is
    * `⌊budget · w / Σw⌋` (exact integer arithmetic), and docs fill their
    * source's quota in salted-hash order — a doc is kept iff the running
    * token total BEFORE it is still under quota, so every source keeps at
    * least one doc when its quota is positive and overshoot is bounded by
    * one doc. Shapes: the per-source weight/quota table is a distinct-agg
    * over the (tiny) source dimension, broadcast back; the running sum is
    * a window PARTITIONED BY source (never unpartitioned), ordered by the
    * salted hash with id tie-break — deterministic across engines,
    * partitionings and re-executions.
    */
  def tokenBudgetMixture(df: DataFrame, sourceCol: String, tokenCol: Column,
                         weightCol: Column, budgetTokens: Long,
                         salt: String, idCol: String): DataFrame = {
    require(budgetTokens >= 0, s"budget must be non-negative, got $budgetTokens")
    val src = df.select(col(sourceCol)).distinct()
      .withColumn("w", weightCol.cast("long"))
    val tot = src.agg(sum(col("w")).as("tw"))
    val quotas = src.crossJoin(broadcast(tot))
      .withColumn("quota_tokens", expr(s"($budgetTokens * w) div tw"))
      .select(col(sourceCol), col("quota_tokens"))
    val wnd = Window.partitionBy(sourceCol)
      .orderBy(rowHash(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens", tokenCol.cast("long"))
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(wnd), lit(0L)))
      .join(broadcast(quotas), sourceCol)
      .withColumn("kept", col("cum_before") < col("quota_tokens"))
  }
}
