package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det

/** Gap-based sessionization of an event log (batch form).
  *
  * Events of a user belong to one session while consecutive event-time gaps
  * stay ≤ `gapMicros`; a larger gap starts the next session. The classic
  * lag→flag→prefix-sum window recipe: one shuffle on `user_id`, then a
  * per-user sort inside the window — no self-join, no driver state.
  *
  * Scale notes (100 TB event log):
  *   - exactly ONE exchange (hash on user_id); the window sort and the
  *     session aggregation reuse the same partitioning, so the groupBy
  *     below is shuffle-free (Catalyst sees the child ordering/partitioning
  *     from the Window operator).
  *   - per-task memory is bounded by the largest single user's history —
  *     the same skew bound as any per-entity window; a pathological user
  *     would need range-bucketed two-phase sessionization (open-session
  *     stitching across time buckets), which the streaming form
  *     ([[graft.streaming.StreamingPipeline.sessionizeStream]]) already
  *     provides with O(1) state per user.
  *   - session ordinals (`sess_id`) are deterministic: tied timestamps
  *     always share a session (their gap is 0), so the assignment is
  *     invariant to the tie order any engine picks.
  */
object Sessionize {

  /** Sessions of `events` (`user_id`, `ts` timestamp, `value` double):
    * one row per session with start/end in epoch micros, the event count
    * and the grid-exact value sum.
    */
  def sessions(events: DataFrame, gapMicros: Long): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("value"), us.as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > gapMicros ||
          lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(
        min(col("us")).as("session_start_us"),
        max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("sum_value"))
  }
}
