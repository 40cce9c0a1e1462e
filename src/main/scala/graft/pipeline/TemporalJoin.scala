package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from existing
  * operators (the brief's preference order: compose before going native —
  * both shapes reduce to one equi-shuffle plus codegen'd projections, so
  * a custom `SparkPlan` would buy nothing).
  *
  * - [[asofJoin]]: each left row picks the LATEST right row at-or-before
  *   its timestamp per key (DuckDB/kdb "ASOF JOIN"). Implemented as a
  *   tagged union + one per-key ordered window with `last(ignoreNulls)`:
  *   ONE shuffle on the key, no join explosion, no per-row probe — the
  *   scale-canonical form (a sort-merge band join would shuffle the same
  *   data AND pay a merge with backtracking; the window is forward-only).
  *   With `tsBucketSeconds` set, a two-level (key, time-bucket) variant
  *   bounds per-task input under pathologically hot keys.
  * - [[rangeJoinBucketed]]: events ⋈ intervals on containment. The naive
  *   plan is a broadcast nested loop (fine only while the interval side is
  *   tiny); this is the scale path — intervals EXPLODE into fixed-width
  *   time buckets, the join becomes an equi-join on the bucket key with a
  *   residual containment filter, and both sides shuffle-partition by
  *   bucket. Overlapping intervals are supported (an event may match
  *   several).
  */
object TemporalJoin {

  /** As-of join: for each row of `left`, append `right`'s value columns
    * from the latest right row with `right.ts <= left.ts` on the same key
    * (nulls when no such row). `right` must be UNIQUE per (key, ts) —
    * pre-aggregate duplicates (e.g. `max_by`) or the pick at a tied
    * timestamp is undefined; this mirrors DuckDB ASOF, which has the same
    * contract. One hash shuffle on `keyCols`; the window never spans keys,
    * so parallelism is per-key at any scale.
    *
    * `tsBucketSeconds > 0` selects the HOT-KEY-SAFE two-level plan: the
    * per-key window becomes a per-(key, time-bucket) window plus a
    * carry-forward over per-bucket summaries, so a single key holding
    * billions of rows parallelizes across its buckets instead of
    * serializing through one task (the per-KEY state drops from all rows
    * to one summary row per bucket). Results are identical; the default
    * single-window plan avoids the extra summary join when keys are known
    * to be bounded.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String],
               tsBucketSeconds: Long = 0L): DataFrame = {
    val leftCols = left.columns.toSeq
    require(keyCols.nonEmpty,
      "asofJoin: empty keyCols would build a single-partition global window")
    require(valueCols.forall(right.columns.contains), "valueCols must exist in right")
    require(!valueCols.exists(leftCols.contains),
      "valueCols collide with left columns — rename before joining")
    require(!(left.columns ++ right.columns)
      .exists(Set("_side", "_vals", "_bucket", "_blast", "_carry")),
      "asofJoin reserves the _side/_vals/_bucket/_blast/_carry column names")
    // the right row's values travel as ONE non-null STRUCT: `last` must
    // pick the latest right ROW, not the latest non-null value per column —
    // carrying columns separately would resurrect an older row's value
    // when the latest row holds a null, and could stitch fields from
    // different rows (the DuckDB-ASOF contract is row-wise)
    val valStruct = struct(valueCols.map(col): _*)
    // tagged union: right rows sort BEFORE left rows at a tied timestamp
    // (side 0 < 1), so "at-or-before" includes equal-ts right rows
    val l = left.select(leftCols.map(col) :+ lit(1).as("_side") :+
      lit(null).cast(right.select(valStruct).schema.head.dataType).as("_vals"): _*)
    val r = right
      .select((keyCols :+ tsCol).map(col) :+ valStruct.as("_vals"): _*)
      .select(leftCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col("_vals")): _*)
    val union = l.unionByName(r)
    val carried =
      if (tsBucketSeconds <= 0) {
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union.select(leftCols.map(col) :+ col("_side") :+
          last(col("_vals"), ignoreNulls = true).over(w).as("_vals"): _*)
      } else {
        val bUs = tsBucketSeconds * 1000000L
        val bucketed = union.withColumn("_bucket",
          floor(unix_micros(col(tsCol)) / bUs).cast("long"))
        val keyBucket = keyCols.map(col) :+ col("_bucket")
        // level 1: as-of WITHIN each (key, bucket) — hot keys parallelize
        // across their buckets here
        val w1 = Window.partitionBy(keyBucket: _*)
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val within = bucketed.select(leftCols.map(col) ++ Seq(col("_side"),
          col("_bucket"),
          last(col("_vals"), ignoreNulls = true).over(w1).as("_vals")): _*)
        // level 2: ONE summary row per (key, bucket) — the latest right
        // value in the bucket (max_by ignores rows whose ordering expr is
        // null, i.e. left rows), carried forward from STRICTLY earlier
        // buckets per key. The per-key window now runs over bucket
        // summaries, not raw rows: its input is bounded by the time span /
        // bucket width regardless of key heat.
        val summaries = bucketed
          .groupBy(keyBucket: _*)
          .agg(max_by(col("_vals"),
            when(col("_side") === 0, col(tsCol))).as("_blast"))
        val wc = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_bucket").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = summaries
          .select(keyBucket :+
            last(col("_blast"), ignoreNulls = true).over(wc).as("_carry"): _*)
        within.join(carry, keyCols :+ "_bucket")
          .select(leftCols.map(col) ++ Seq(col("_side"),
            coalesce(col("_vals"), col("_carry")).as("_vals")): _*)
      }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_vals").getField(c).as(c)): _*)
  }

  /** Containment range join on fixed-width time buckets: every interval
    * `[startCol, endCol)` of `intervals` explodes into the bucket ids it
    * covers, events map to their single bucket, and the pair equi-joins on
    * the bucket before the exact containment filter. Bucket width should
    * be on the order of the typical interval length: each interval then
    * lands in O(1) buckets and the shuffle stays linear in both inputs.
    */
  def rangeJoinBucketed(events: DataFrame, intervals: DataFrame,
                        tsCol: String, startCol: String, endCol: String,
                        bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(!(events.columns ++ intervals.columns).contains("_bucket"),
      "rangeJoinBucketed reserves the _bucket column name")
    // bucket arithmetic in MICROSECONDS (Spark timestamps are µs):
    // unix_timestamp truncates to whole seconds, and with a sub-second
    // interval end sitting just past a bucket boundary the truncated
    // exclusive-end math would drop the interval's real last bucket —
    // silently losing matches
    val bUs = lit(bucketSeconds * 1000000L)
    val ev = events.withColumn("_bucket",
      floor(unix_micros(col(tsCol)) / bUs).cast("long"))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / bUs).cast("long"),
        // end is EXCLUSIVE: an interval ending exactly on a bucket
        // boundary must not claim the next bucket. Step is pinned to +1:
        // without it Spark defaults to -1 when stop < start, so a corrupt
        // interval with end <= start would silently explode one row per
        // bucket DOWN its whole span; with step 1 it fails loudly instead
        floor((unix_micros(col(endCol)) - 1) / bUs).cast("long"),
        lit(1L))))
    ev.join(iv, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }
}
