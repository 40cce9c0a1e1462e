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
    * thresholds keep the verdict engine-exact. Rates > 1000 (upsampling)
    * are handled by [[rateUpsample]], which emits copies.
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

  /** Rate resampling with UPSAMPLING: a stratum rate of r‰ emits ⌊r/1000⌋
    * full copies of every row plus one more when `hash mod 1000 <
    * r mod 1000` — real mixtures epoch high-quality sources (wiki at
    * 3000‰) while downsampling crawl (200‰), and E[copies] = r/1000
    * exactly. Purely row-local: the copy count is decided from the salted
    * hash and the explode emits `copy ∈ [0, n)` in-place, so no shuffle,
    * no count pass, and verdicts are stable under growth/re-execution.
    * The `sequence` step is pinned to +1 and rows with zero copies are
    * filtered BEFORE the explode — `sequence(0, -1)` would otherwise
    * default to step -1 and emit two phantom copies.
    */
  def rateUpsample(df: DataFrame, strataCol: Column, ratesPermille: Map[String, Int],
                   defaultPermille: Int, salt: String, idCol: String): DataFrame = {
    require((defaultPermille +: ratesPermille.values.toSeq).forall(_ >= 0),
      "rates must be non-negative")
    require(!df.columns.contains("copy") && !df.columns.contains("n_copies"),
      "rateUpsample reserves the copy/n_copies column names")
    val rate = ratesPermille.toSeq.sortBy(_._1).foldRight(lit(defaultPermille): Column) {
      case ((s, r), acc) => when(strataCol === s, lit(r)).otherwise(acc)
    }
    df.withColumn("n_copies",
        floor(rate.cast("long") / 1000L).cast("long") +
          when(rowHash(col(idCol), salt) % 1000 < rate % 1000, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1L, lit(1L))))
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

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006),
    * engine-exact: for INTEGER weights the A-ES priority u^(1/w) is equal
    * in distribution to the MAX of w independent uniforms, so the sampling
    * key is the max of `w` salted 60-bit hashes — pure integer
    * comparisons, no transcendental anywhere — and the k highest keys win
    * (id tie-break). For k=1 the inclusion probability is exactly w_i/Σw;
    * in general this is A-ES weighted reservoir sampling with the
    * reservoir replaced by a distributed TakeOrdered top-k (map-side
    * heaps feeding one k-row merge — no global sort, no window). Key
    * construction is row-local (`transform` over sequence(1, w) +
    * `array_max`), so per-row work is O(w), bounded by `maxW`; weights
    * are asserted integral and in [1, maxW] LOUDLY — a fractional or
    * out-of-range weight expression fails the job rather than silently
    * reweighting the sample. Same-salt runs are identical across
    * partitionings/re-executions; a new salt is an independent resample.
    */
  def weightedSample(df: DataFrame, weightCol: Column, k: Int,
                     salt: String, idCol: String, maxW: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxW >= 1, s"maxW must be >= 1, got $maxW")
    require(!df.columns.contains("w") && !df.columns.contains("sample_key"),
      "weightedSample reserves the w/sample_key column names")
    val wd = weightCol.cast("double")
    val guarded = when(assert_true(
      wd >= 1 && wd <= maxW && wd === floor(wd).cast("double"),
      lit(s"weightedSample weights must be integers in [1, $maxW]")).isNull,
      weightCol.cast("int"))
    df.withColumn("w", guarded)
      .withColumn("sample_key",
        array_max(transform(sequence(lit(1), col("w")), j =>
          Det.md5Hash60(concat(lit(salt + "-"), col(idCol).cast("string"),
            lit("-"), j.cast("string"))))))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
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
    * partitionings and re-executions. Weights must be positive — enforced
    * with `assert_true` inside the quota projection so a zero/NULL weight
    * expression fails LOUDLY in Spark (DuckDB's `// 0` already raises)
    * instead of silently dropping the source via NULL quotas.
    *
    * `hashBuckets > 1` selects the HOT-SOURCE-SAFE two-level plan. Source
    * cardinality in a real mixture is tiny (5–20) and skew is extreme by
    * construction — one crawl source routinely holds >80 % of the corpus —
    * so the single per-source window serializes the dominant source's
    * entire row set through ONE task's sort. The remedy is the
    * [[TemporalJoin.asofJoin]] carry trick one level up: rows bucket by the
    * HIGH bits of the salted ordering hash (order-preserving, so
    * within-bucket order + bucket order = the global per-source order),
    * the running sum is computed per (source, bucket), a tiny
    * (source, bucket)-totals table is prefix-summed per source — its
    * window input is bounded by `hashBuckets`, not row count — and
    * broadcast back: `cum_before = bucket_offset + within_bucket_sum`.
    * Results are bit-identical to the single-window plan; per-task input
    * drops from "the dominant source" to "1/hashBuckets of it".
    */
  def tokenBudgetMixture(df: DataFrame, sourceCol: String, tokenCol: Column,
                         weightCol: Column, budgetTokens: Long,
                         salt: String, idCol: String,
                         hashBuckets: Int = 0): DataFrame = {
    require(budgetTokens >= 0, s"budget must be non-negative, got $budgetTokens")
    require(hashBuckets >= 0 && hashBuckets <= (1 << 30),
      s"hashBuckets must be in [0, 2^30], got $hashBuckets")
    require(!df.columns.exists(
      Set("_h", "_bucket", "_within_before", "_bucket_offset", "_bucket_tokens")),
      "tokenBudgetMixture reserves the _h/_bucket/_within_before/" +
        "_bucket_offset/_bucket_tokens names")
    val src = df.select(col(sourceCol)).distinct()
      .withColumn("w", weightCol.cast("long"))
    val tot = src.agg(sum(col("w")).as("tw"))
    val quotas = src.crossJoin(broadcast(tot))
      .withColumn("quota_tokens",
        when(assert_true(col("w") > 0,
          lit(s"tokenBudgetMixture: weights must be positive")).isNull,
          expr(s"($budgetTokens * w) div tw")))
      .select(col(sourceCol), col("quota_tokens"))
    val withCum =
      if (hashBuckets <= 1) {
        val wnd = Window.partitionBy(sourceCol)
          .orderBy(rowHash(col(idCol), salt), col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("tokens", tokenCol.cast("long"))
          .withColumn("cum_before", coalesce(sum(col("tokens")).over(wnd), lit(0L)))
      } else {
        // order-preserving range bucketing on the 60-bit hash: with
        // divisor = ⌈2^60 / n⌉, `h div divisor` ∈ [0, n) and is monotone
        // in h — exact integer arithmetic (h > 2^53 would lose bits as a
        // double, so no floating division anywhere)
        val divisor = ((1L << 60) + hashBuckets - 1) / hashBuckets
        val bucketed = df.withColumn("tokens", tokenCol.cast("long"))
          .withColumn("_h", rowHash(col(idCol), salt))
          .withColumn("_bucket", expr(s"_h div ${divisor}L"))
        // level 1: running sum WITHIN each (source, hash-bucket) — the
        // dominant source parallelizes across its buckets here
        val w1 = Window.partitionBy(col(sourceCol), col("_bucket"))
          .orderBy(col("_h"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        val within = bucketed.withColumn("_within_before",
          coalesce(sum(col("tokens")).over(w1), lit(0L)))
        // level 2: ONE total row per (source, bucket), prefix-summed over
        // STRICTLY earlier buckets per source — this window's input is
        // ≤ hashBuckets rows per source regardless of corpus size — then
        // broadcast back for a row-local add
        val offsets = bucketed
          .groupBy(col(sourceCol), col("_bucket"))
          .agg(sum(col("tokens")).as("_bucket_tokens"))
          .withColumn("_bucket_offset",
            coalesce(sum(col("_bucket_tokens")).over(
              Window.partitionBy(sourceCol).orderBy(col("_bucket"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col(sourceCol), col("_bucket"), col("_bucket_offset"))
        within.join(broadcast(offsets), Seq(sourceCol, "_bucket"))
          .withColumn("cum_before", col("_bucket_offset") + col("_within_before"))
          .drop("_h", "_bucket", "_within_before", "_bucket_offset")
      }
    withCum
      .join(broadcast(quotas), sourceCol)
      .withColumn("kept", col("cum_before") < col("quota_tokens"))
  }
}
