package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/** Structured Streaming variants of the stateless pipeline operators
  * (SURVEY.md §7.5: the reference is strictly batch; streaming enters only
  * on the extension surface). The same codegen'd column expressions from
  * `TextPipeline` apply verbatim to a streaming DataFrame — that is the
  * point of keeping them UDF-free: one definition serves `read` and
  * `readStream`.
  */
object StreamingPipeline {

  /** Streaming exact-dedup: drop rows whose normalized-text fingerprint was
    * already seen within the watermark horizon. State is bounded by the
    * watermark (fingerprints older than `delayThreshold` are evicted), which
    * is what makes this run forever at ingest scale.
    */
  def dedupStream(docs: DataFrame, tsCol: String, delayThreshold: String,
                  textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", TextPipeline.fingerprint(col(textCol)))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // internal dedup key — keep the caller's schema

  /** Per-language rolling text-quality profile over event-time windows:
    * watermarked tumbling-window aggregation (late data beyond the
    * threshold is dropped, state is evicted per window).
    */
  def textProfileStream(docs: DataFrame, tsCol: String, window: String,
                        delayThreshold: String, textCol: String = "text",
                        langCol: String = "lang"): DataFrame =
    docs
      .withWatermark(tsCol, delayThreshold)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextPipeline.tokenCount(col(textCol)).cast("long")).as("sum_tokens"),
        sum(TextPipeline.stopwordCount(col(textCol)).cast("long")).as("sum_stopwords"),
        avg(length(col(textCol))).as("avg_chars"))

  /** Streaming language-ID tagging — fully stateless projection. */
  def langIdStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("pred_lang", TextPipeline.langId(col(textCol)))
}
