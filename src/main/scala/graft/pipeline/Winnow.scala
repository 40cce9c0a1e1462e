package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD'03
  * — the MOSS algorithm): rolling k-gram hashes, then the minimum hash of
  * every window of `w` consecutive grams is selected. Guarantees: any match
  * of length ≥ k+w−1 between two documents shares at least one selected
  * fingerprint, and fingerprint density is ~2/(w+1) — a positional,
  * substring-aware complement to MinHash (bag-of-shingles) and SimHash
  * (token-frequency) dedup.
  *
  * Scale shape: the window min is a per-document sorted window (one shuffle
  * on doc_id, O(len) per doc); overlap detection is a grouped fingerprint
  * bucket join with a document-frequency cap — never all-pairs. All hashes
  * are md5-derived so a SQL oracle reproduces the whole result bit-exactly.
  */
object Winnow {

  /** Truncated-hash modulus: grams compare by a 40-bit md5-derived hash. */
  val FpMod: Long = 1L << 40

  /** Position slots per composite key. (2⁴⁰−1)·2²³ + (2²³−1) = 2⁶³−1 — the
    * (hash asc, position desc) composite exactly fills a signed 64-bit long,
    * so window-min selection is single-long arithmetic in Spark AND DuckDB.
    * Caps document length at 2²³−1 = 8,388,607 grams (~8 MB of text).
    */
  val PosMod: Long = 1L << 23

  /** Selected fingerprints with their gram positions: one row per FULL
    * window, carrying that window's chosen (pos, fp).
    * The composite key c = h₄₀·2²³ + (2²³−1−i) makes `min(c)` pick the
    * smallest hash, rightmost position on ties — the classic "robust
    * winnowing" tie-break, engine-independent because both sides minimize
    * the same longs. Only FULL windows select (positions past
    * len−k−w+2 have no complete window), matching the paper's guarantee.
    *
    * ROW-LOCAL: the whole selection — gram hashing over in-place byte
    * ranges plus a monotonic-deque sliding min — runs inside the native
    * [[graft.functions.WinnowFps]] expression, so there is no gram
    * explode, no per-doc window sort and no shuffle at all until a
    * consumer aggregates. The exploded `Window`-min formulation stays
    * below as [[selectedExploded]], the definition the kernel is pinned
    * against (WinnowFpsSpec). Documents past the 2²³−1-gram cap fail
    * loudly in both forms (silent corruption would be oracle-invisible:
    * both engines would corrupt identically).
    */
  def selected(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", k: Int = 7, w: Int = 4): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.WinnowFps.winnowFps(col(textCol), k, w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))

  /** Exploded `Window`-min formulation of [[selected]] — retained as the
    * independently-derived twin the native kernel is pinned against.
    */
  private[graft] def selectedExploded(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", k: Int = 7, w: Int = 4): DataFrame = {
    // the composite key leaves 23 bits for the position, so a document may
    // hold at most 2^23-1 grams: past that, PosMod-1-i goes negative and
    // silently corrupts window-min selection (identically in both engines,
    // so the oracle would NOT catch it) — fail loudly instead
    val maxLen = k - 1 + PosMod - 1
    val checkedLen = when(length(col("t")) <= lit(maxLen), length(col("t")))
      .otherwise(raise_error(format_string(
        s"winnow: document %s exceeds the ${PosMod - 1}-gram cap",
        col("doc_id").cast("string"))))
    val grams = docs
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= k + w - 1)
      .select(col("doc_id"), checkedLen.as("lt"),
        explode(expr(s"sequence(1, length(t) - ${k - 1})")).as("i"), col("t"))
      .select(col("doc_id"), col("lt"), col("i"),
        ((Det.md5Hash60(expr(s"substring(t, i, $k)")) % lit(FpMod)) * lit(PosMod)
          + (lit(PosMod - 1) - col("i"))).as("c"))
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("mc", min(col("c")).over(win))
      .filter(col("i") <= col("lt") - lit(k + w - 2))
      .select(col("doc_id"),
        (lit(PosMod - 1) - (col("mc") % lit(PosMod))).as("pos"),
        expr(s"mc div $PosMod").as("fp"))
  }

  /** Per-document fingerprint SET: (doc_id, fp) distinct. The distinct
    * reuses the window's doc_id partitioning (no extra shuffle: clustering
    * on a subset of the grouping keys already co-locates the groups).
    */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", k: Int = 7, w: Int = 4): DataFrame =
    selected(docs, idCol, textCol, k, w).select(col("doc_id"), col("fp")).distinct()

  /** Document pairs ranked by shared fingerprint count — the winnowing
    * overlap report. Fingerprints appearing in more than `maxDf` documents
    * are dropped (boilerplate/common-phrase grams carry no signal and their
    * buckets expand quadratically); pair output is then bounded by
    * Σ|bucket|² ≤ maxDf·|fingerprints| regardless of corpus size.
    */
  def overlapPairs(fps: DataFrame, maxDf: Int = 10): DataFrame =
    fps
      .groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, maxDf))
      .select(explode(expr(
        """flatten(transform(docs, (x, i) ->
          |  transform(slice(docs, i + 2, size(docs)), y -> struct(x as d1, y as d2))))"""
          .stripMargin)).as("pair"))
      .select(col("pair.d1").as("d1"), col("pair.d2").as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
}
