package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed pretraining-cleanup pass, in production order (CCNet/C4/
  * RefinedWeb run the SUB-document pass first, THEN substring-level
  * dedup): paragraph-level exact dedup ([[ParagraphDedup.dedupUnits]] —
  * duplicated units cut, first occurrence kept, blanks exempt), kept
  * units re-joined per document with the CANONICAL separator, and exact
  * duplicated-substring removal ([[Dedup.removeDupSpansExact]], Lee et
  * al. ExactSubstr geometry) over the cleaned text. One call gives the
  * cleaned corpus a training pipeline would actually feed downstream —
  * and because stage 2 consumes stage 1's emission, the composed oracle
  * pins the CHAIN (a boundary bug in either stage breaks the composed
  * text hashes even where each stage's own oracle might not notice).
  *
  * Output = [[Dedup.removeDupSpansExact]]'s piece schema over the
  * cleaned documents: `(doc_id, piece_idx, st, en, n_tokens, cut_tokens,
  * text)` with token coordinates in the CLEANED document's token stream;
  * docs the substring stage does not cut emit one full-range piece, so
  * every document that survives stage 1 appears. A document whose every
  * unit is a non-keeper duplicate emits nothing (it has no kept text).
  *
  * Re-joining uses `joiner` (default `"\n\n"`) regardless of the
  * original separator widths — deliberate structure normalization, the
  * same canonicalization C4 applies when re-assembling kept lines.
  *
  * Scale shape: stage 1 is the paragraph family's (row-local split/
  * fingerprint, one map-side-combinable dup-set aggregate, small
  * checkpointed probe tables); the re-join is ONE per-doc aggregate of
  * the kept units; stage 2 is the removal family's (one gram exchange,
  * small checkpointed cut table, lazy row-local emission). No stage
  * joins corpus-sized frames on anything but their keyed aggregates, so
  * the composition adds exactly one exchange (the re-join) to the sum of
  * its parts.
  */
object CleanPipeline {

  def cleanCorpus(docs: DataFrame,
      sepRegex: String = ParagraphDedup.ParagraphSep,
      joiner: String = "\n\n", minLen: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cleaned = rejoinKept(
      ParagraphDedup.dedupUnits(docs, sepRegex, idCol, textCol), joiner)
    Dedup.removeDupSpansExact(cleaned, minLen)
  }

  /** Kept units re-assembled into cleaned documents: `(doc_id, text)`,
    * units in original order joined with the canonical separator.
    */
  private[pipeline] def rejoinKept(kept: DataFrame, joiner: String): DataFrame =
    kept.groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("unit_idx"), col("text")))),
          x => x.getField("text")), joiner).as("text"))
}
