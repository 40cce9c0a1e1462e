package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** `materializeIntermediate` (default true): stage 2 consumes the
    * cleaned corpus TWICE (its substrate persist and its lazy emission
    * tail), and unlike the removal family's usual raw-parquet input the
    * cleaned corpus is a derived chain — re-deriving it per consumer
    * measured 1.4× slower at ×1000 (CLEANPIPE_AB.json, interleaved,
    * geometry-pinned), so the default `localCheckpoint`s it once. On a
    * real cluster prefer staging the cleaned corpus to the lake between
    * passes (write + read back): a local checkpoint truncates lineage,
    * so an executor loss mid-stage-2 cannot recompute — the same reason
    * a production chain persists its intermediate anyway. `false` keeps
    * the fully-lazy stream-to-sink shape.
    */
  def cleanCorpus(docs: DataFrame,
      sepRegex: String = ParagraphDedup.ParagraphSep,
      joiner: String = "\n\n", minLen: Int = 20,
      idCol: String = "doc_id", textCol: String = "text",
      materializeIntermediate: Boolean = true): DataFrame = {
    val cleaned0 = rejoinKept(
      ParagraphDedup.dedupUnits(docs, sepRegex, idCol, textCol), joiner)
    val cleaned =
      if (materializeIntermediate) cleaned0.localCheckpoint() else cleaned0
    Dedup.removeDupSpansExact(cleaned, minLen)
  }

  /** Kept units re-assembled into cleaned documents: `(doc_id, text)`,
    * units in original order joined with the canonical separator.
    */
  private[graft] def rejoinKept(kept: DataFrame, joiner: String): DataFrame =
    kept.groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("unit_idx"), col("text")))),
          x => x.getField("text")), joiner).as("text"))

  /** The FULL production cleanup chain — [[cleanCorpus]] with the
    * document-level near-dup stage the real pipelines (CCNet, RefinedWeb;
    * SURVEY §2.6) run between the sub-document pass and substring removal:
    *
    *   1. paragraph/line exact dedup ([[ParagraphDedup.dedupUnits]]) and
    *      canonical re-join — the cleaned corpus;
    *   2. document-level dedup over the CLEANED text: exact-duplicate
    *      collapse to min-id representatives ([[Dedup.collapseReps]]),
    *      MinHash + banded-LSH candidate pairs verified by exact Jaccard
    *      ≥ `threshold` ([[Dedup.nearDupFramesFromReps]]), connected-
    *      component cluster resolution ([[Dedup.dupClusters]]), and
    *      KEEP-BEST representative selection ([[Dedup.keepBest]]) under
    *      the caller's `quality` policy — every other cluster member is
    *      dropped whole;
    *   3. exact duplicated-substring removal over the surviving documents
    *      ([[Dedup.removeDupSpansExact]]).
    *
    * Output = the piece schema over SURVIVING docs only: a document
    * dropped as an exact duplicate or a near-dup cluster loser emits
    * nothing; survivors emit their cleaned pieces (uncut survivors one
    * full-range piece). `quality` scores a cleaned document — a `Column`
    * over stage 1's `(doc_id, text)` — and defaults to cleaned-text
    * length ("keep the longest"), cast to integer by [[Dedup.keepBest]];
    * ties break to the smaller doc id, so the policy is total and
    * deterministic.
    *
    * Stage boundaries matter: near-dup runs over CLEANED text (CCNet
    * orders it this way because boilerplate paragraphs otherwise make
    * unrelated pages near-duplicates), and substring removal runs LAST so
    * its gram ranks never count occurrences inside documents that dedup
    * discards anyway.
    *
    * Scale shape: stage 1 as in [[cleanCorpus]]; stage 2 adds ONE
    * corpus-sized exchange (the rep collapse — its output is also the
    * persisted signature substrate, so the banding chain and the survivor
    * accounting reuse it rather than re-deriving the cleaned corpus) plus
    * the near-dup family's keyed-bucket stages; pairs, clusters, keep-best
    * and the loser set are all candidate-sized (vanishing fractions of the
    * corpus) and checkpoint small, so the survivor anti-join broadcasts
    * under AQE. Stage 3 is the removal family's shape over the surviving
    * reps. The survivor table is `localCheckpoint`ed between stages (the
    * same persist-the-hand-off rationale — and measured default — as
    * `materializeIntermediate`): stage 3 consumes it twice (token
    * substrate + emission tail), and on a real cluster it is the cleaned
    * artifact a production run stages to the lake anyway.
    */
  def fullCleanCorpus(docs: DataFrame,
      sepRegex: String = ParagraphDedup.ParagraphSep,
      joiner: String = "\n\n", minLen: Int = 20,
      shingleK: Int = 5, nHashes: Int = 18, rowsPerBand: Int = 6,
      threshold: Double = 0.7, quality: Column = length(col("text")),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cleaned = rejoinKept(
      ParagraphDedup.dedupUnits(docs, sepRegex, idCol, textCol), joiner)
    // docs shorter than the shingle width never band (the signature kernel
    // self-guards), so ALL reps flow through: short docs simply cannot
    // near-dup-match and survive to stage 3 unless exact-duplicated.
    val f = Dedup.nearDupFramesFromReps(Dedup.collapseReps(cleaned),
      shingleK, nHashes, rowsPerBand, threshold)
    val survivors =
      try {
        val pairs = f.verified.localCheckpoint() // eager: runs the pipeline
        f.candShingles.unpersist(blocking = false)
        val clusters = Dedup.dupClusters(pairs)
        // losers = cluster members that are not their cluster's keep-best
        // winner; quality is scored on the persisted reps (every cluster
        // member is a rep — collapseReps ran first)
        val losers = clusters
          .join(Dedup.keepBest(clusters, f.spread, quality)
            .select(col("keep_id").as("v")), Seq("v"), "left_anti")
          .select(col("v").as("doc_id"))
          .localCheckpoint()
        f.spread.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
      } finally f.spread.unpersist(blocking = false)
    Dedup.removeDupSpansExact(survivors, minLen)
  }

  // ---- Incremental (daily-crawl) form --------------------------------

  /** The corpus-side state of INCREMENTAL composed cleanup: the paragraph
    * stage's unit-fingerprint index plus the substring stage's gram index
    * built over the CLEANED corpus (stage 2 of the batch chain sees
    * cleaned text, so its index must too). `joiner` rides along so a
    * probe can never re-join with a mismatched canonical separator.
    *
    * CONTRACT — MONOTONE doc ids (every increment id GREATER than every
    * indexed id), stronger than the component indexes' disjointness: a
    * smaller increment id sharing a unit with a corpus doc would steal
    * the union keeper, meaning the batch chain would cut the CORPUS
    * copy — text an incremental pass has already emitted and can never
    * re-emit. Under monotone ids union keepers always land corpus-side
    * (or increment-internal for new content), so the cleaned corpus is
    * stable and increment output is exactly batch-equal. Daily crawls
    * assign ids monotonically, so this is the natural deployment shape.
    *
    * ENFORCED MECHANICALLY ([[IdContract]]): both halves carry a
    * `max_doc_id` watermark maintained by build/update and persisted with
    * the index; every probe and fold `require`s increment ids strictly
    * above it — the paragraph half checks the RAW increment, the
    * substring half the cleaned increment — so a violating increment
    * fails loudly instead of silently rewriting emitted corpus text.
    */
  final case class CleanIndex(para: ParagraphDedup.ParagraphIndex,
      substr: Dedup.ExactSubstrIndex, joiner: String) {
    /** The composed index's watermark — the paragraph half's, which sees
      * every raw corpus id (the substring half's may sit lower when the
      * largest absorbed doc emitted no cleaned text).
      */
    def maxDocId: Long = para.maxDocId
    def unpersist(): Unit = { para.unpersist(); substr.unpersist() }
  }

  /** Build both stages' corpus-side state once; probe per increment with
    * [[incrementalCleanCorpus]], fold shipped increments forward with
    * [[updateCleanIndex]]. The substring index is built over the CLEANED
    * corpus (one batch paragraph pass — the same pass that produced the
    * corpus the lake actually stores).
    */
  def buildCleanIndex(corpus: DataFrame,
      sepRegex: String = ParagraphDedup.ParagraphSep,
      joiner: String = "\n\n", minLen: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): CleanIndex = {
    val para = ParagraphDedup.buildParagraphIndex(corpus, sepRegex, idCol, textCol)
    val cleaned = rejoinKept(
      ParagraphDedup.dedupUnits(corpus, sepRegex, idCol, textCol), joiner)
    // the substring half inherits the paragraph half's watermark rather
    // than re-computing max(id) over `cleaned` — the cleaned corpus is a
    // derived chain, and an eager max over it would cost a full extra
    // stage-1 pass for a number the raw side already knows
    CleanIndex(para,
      Dedup.exactSubstrIndexAt(cleaned, minLen, para.maxDocId), joiner)
  }

  /** INCREMENTAL composed cleanup — the daily-crawl twin of
    * [[cleanCorpus]]: the increment is paragraph-deduped against the unit
    * index (exactly batch-equal, P57), re-joined canonically, and
    * substring-probed against the cleaned-corpus gram index (exactly
    * batch-equal, P52). Under the monotone-id contract the composition is
    * itself exactly batch-equal: running [[cleanCorpus]] over
    * corpus ∪ increment and restricting to increment docs yields these
    * rows bit-for-bit (pinned by the `p_incremental_clean_pipeline`
    * oracle and `CleanPipelineSpec`).
    */
  def incrementalCleanCorpus(incoming: DataFrame, index: CleanIndex,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.incrementalRemoveDupSpansExact(
      // increment-sized, consumed twice by stage 2 (substrate + emission):
      // checkpoint once — cheap at any scale, same rationale as the batch
      // form's materializeIntermediate default
      rejoinKept(
        ParagraphDedup.incrementalDedupUnits(incoming, index.para, idCol, textCol),
        index.joiner).localCheckpoint(),
      index.substr)

  /** Fold a shipped increment into both halves: the paragraph index folds
    * over the RAW increment (its state is pre-clean unit fingerprints),
    * the substring index over the CLEANED increment (its state mirrors
    * the cleaned lake) — cleaned against the CURRENT paragraph index,
    * before that index absorbs the increment. Returns a NEW persisted
    * index; retire the old one once the swap is durable.
    */
  def updateCleanIndex(index: CleanIndex, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): CleanIndex = {
    val cleanedInc = rejoinKept(
      ParagraphDedup.incrementalDedupUnits(incoming, index.para, idCol, textCol),
      index.joiner)
    CleanIndex(
      ParagraphDedup.updateParagraphIndex(index.para, incoming, idCol, textCol),
      Dedup.updateExactSubstrIndex(index.substr, cleanedInc),
      index.joiner)
  }
}
