package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Det

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with a held-out evaluation corpus (the GPT-3 appendix-C /
  * C4-audit recipe). The eval side is reduced to a distinct set of n-gram
  * keys; a train document is contaminated iff any of its n-grams hits that
  * set.
  *
  * SUBSTRATE DEFAULT — cryptographic, deliberately: decontamination runs
  * over UNTRUSTED web corpora against a fixed eval set, and a fixed-base
  * mod-2⁶⁴ polynomial key with public constants admits CONSTRUCTIBLE
  * collisions — a crafted training document could false-flag itself (or,
  * via poisoned boilerplate, arbitrary co-occurring content) as
  * contaminated and suppress it from training. The verdict entry points
  * therefore default to `md5Substrate = true` (60-bit md5 over the literal
  * gram string — preimage-resistant, so collisions cannot be crafted);
  * the rolling-polynomial substrate is an explicit opt-in
  * (`md5Substrate = false`) for corpora the operator trusts.
  *
  * MIGRATION HAZARD, CLOSED BY THE TYPE (the default FLIPPED from rolling
  * to md5 in round 12): the two substrates produce disjoint key spaces,
  * and a mismatch FAILS OPEN — a gram set built under one substrate
  * probed under the other matches nothing, so every document reads
  * uncontaminated. A bare `Array[Long]` carries no substrate tag, so the
  * public probe surface no longer accepts one: eval gram sets travel as
  * [[EvalGrams]] — keys + gram order + substrate in one value, built only
  * by [[evalGrams]] — and [[contaminatedFlag]] reads the substrate and
  * `n` from the tag, making an accidental build/probe mismatch
  * unrepresentable. (The untagged internals survive as `private[graft]`
  * for the cross-substrate pinning specs.) Any gram set persisted before
  * the flip must still be rebuilt once.
  *
  * Scale notes (100 TB): under the rolling opt-in, gram keys are rolled
  * INSIDE each row straight off the token array (`RollingGramKeys` —
  * O(L) per doc, no gram-string concatenation, no positional self-join),
  * so the only wide exchanges are the per-doc `distinct` and the semi
  * join on the 64-bit gram key — shuffling longs instead of ~25-byte
  * strings; the md5 default pays one gram-string concatenation + md5 per
  * window (measured within ~10 % of rolling on tested corpora —
  * SCALING.md round 11). The oracle is substrate-adversarial: DuckDB
  * re-derives the verdicts by intersecting literal gram STRINGS, so the
  * key substrate can never silently drift. A real eval set (a few
  * benchmarks) is tiny and AQE will broadcast it after the distinct; the
  * hint is deliberately NOT hard-coded because here the eval partition is
  * 1/20 of the corpus and therefore SF-scaled.
  */
object Decontaminate {

  /** One row per DISTINCT word n-gram of each document: `(doc_id, gh)`
    * with `gh` a 64-bit rolling-polynomial window key
    * ([[graft.functions.RollingGramKeys]] — O(L) per doc, no gram-string
    * concatenation, hashed straight off the token array). The key is
    * INTERNAL: the contamination verdicts (doc ids, source counts) are
    * substrate-independent, which is what the oracle pins — DuckDB
    * re-derives them by intersecting literal gram STRINGS, so a false key
    * collision on either side would break the count comparison (the
    * substrate-adversarial pattern of the removal family). 64-bit mixed
    * keys are WIDER than md5₆₀ against RANDOM collisions, but the fixed
    * public polynomial base makes collisions CONSTRUCTIBLE by an
    * adversary — which is why the verdict entry points default to
    * [[docNgramsMd5]] and this form is the trusted-corpus opt-in
    * (verdict-pinned against the md5 twin in SketchDecontamSpec).
    * Documents with fewer than n tokens contribute no rows.
    */
  def docNgrams(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.RollingGramKeys.rollingGramKeys(
          TextPipeline.tokens(col(textCol)), n)).as("gh"))
      .distinct()

  /** md5₆₀-on-gram-string form of [[docNgrams]]
    * (`gh = md5₆₀(tok_i ‖ ' ' ‖ … ‖ tok_{i+n-1})`) — the DEFAULT verdict
    * substrate (collisions cannot be crafted against a preimage-resistant
    * hash) and the independently-derived twin the rolling opt-in is
    * pinned against.
    */
  def docNgramsMd5(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextPipeline.wordGramArray(col(textCol), n)).as("g"))
      .select(col("doc_id"), Det.md5Hash60(col("g")).as("gh"))
      .distinct()

  /** `(doc_id, gh)` under the selected substrate — every verdict path
    * derives its keys here so the two sides of a join/probe can never mix
    * substrates through this object's own entry points.
    */
  private def gramKeys(docs: DataFrame, n: Int, md5Substrate: Boolean): DataFrame =
    if (md5Substrate) docNgramsMd5(docs, n) else docNgrams(docs, n)

  /** Distinct doc_ids of `train` documents sharing >= 1 word n-gram with
    * any `evalDocs` document. Left-semi join on the gram key: nothing from
    * the eval side is materialized into the output, and the train side is
    * deduplicated per doc before the join. `md5Substrate = false` opts
    * into the rolling-polynomial keys for trusted corpora (see the object
    * doc for why crafted-collision exposure makes md5 the default here).
    */
  def contaminatedDocs(train: DataFrame, evalDocs: DataFrame, n: Int,
      md5Substrate: Boolean = true): DataFrame = {
    val evalGrams = gramKeys(evalDocs, n, md5Substrate).select("gh").distinct()
    gramKeys(train, n, md5Substrate)
      .join(evalGrams, Seq("gh"), "left_semi")
      .select("doc_id").distinct()
  }

  /** A driver-held eval gram set TAGGED with everything a probe must
    * match to be meaningful: the sorted key array, the gram order `n`,
    * and the key substrate. Build only via [[evalGrams]] (or deserialize
    * all three fields together) — [[contaminatedFlag]] reads `n` and the
    * substrate from the tag, so the fail-open build/probe substrate
    * mismatch the object doc describes cannot be expressed through the
    * public surface.
    */
  final case class EvalGrams(keys: Array[Long], n: Int, md5Substrate: Boolean) {
    require(keys.nonEmpty, "eval gram set is empty")
  }

  /** Build the tagged eval gram set ([[EvalGrams]]) — the only public
    * constructor of probe-able gram state.
    */
  def evalGrams(evalDocs: DataFrame, n: Int, maxGrams: Int = 1 << 22,
      md5Substrate: Boolean = true): EvalGrams =
    EvalGrams(evalGramArray(evalDocs, n, maxGrams, md5Substrate), n,
      md5Substrate)

  /** Driver-held distinct eval gram hashes as a SORTED primitive array —
    * UNTAGGED internals of [[evalGrams]], `private[graft]` so the typed
    * wrapper is the only public probe substrate. Real eval sets (a few
    * benchmarks) are tiny; the cap fails LOUDLY if someone points this at
    * a corpus-sized "eval" side, where the distributed semi join is the
    * right plan. At the cap this is 8 bytes/gram (32 MB) — a boxed
    * `Map[Long, _]` of the same grams costs ~8× that in driver transient.
    */
  private[graft] def evalGramArray(evalDocs: DataFrame, n: Int,
                    maxGrams: Int = 1 << 22,
                    md5Substrate: Boolean = true): Array[Long] = {
    val grams = gramKeys(evalDocs, n, md5Substrate).select("gh").distinct()
    val nG = grams.count()
    require(nG <= maxGrams,
      s"eval gram set $nG exceeds maxGrams=$maxGrams — use contaminatedDocs " +
        "(distributed semi join) instead of the broadcast-literal form")
    val arr = grams.collect().map(_.getLong(0))
    java.util.Arrays.sort(arr)
    arr
  }

  /** Row-local contamination verdict against a TAGGED eval gram set
    * ([[EvalGrams]]): TRUE iff any word n-gram of the text hash-hits the
    * set. Gram order and key substrate come from the tag — the only
    * public form, so a build/probe mismatch is unrepresentable. Evaluated
    * with higher-order functions inside the row — no explode, no join, no
    * state — so the same column runs on a batch or STREAMING DataFrame in
    * append mode (the ingest-time filter shape; `StreamingSpec` pins
    * batch ≡ stream).
    */
  def contaminatedFlag(textCol: org.apache.spark.sql.Column,
                       grams: EvalGrams): org.apache.spark.sql.Column =
    contaminatedFlag(textCol, grams.keys, grams.n, grams.md5Substrate)

  /** Untagged internals of the flag ([[EvalGrams]] is the public form;
    * the cross-substrate pinning specs probe this directly).
    *
    * The set probe is the native [[graft.functions.LongSetContains]]
    * (sorted-array binary search, O(log \|set\|) per gram) — NOT a
    * `typedlit` map + `element_at`, whose literal-map `GetMapValue` is a
    * linear key scan that would make this O(grams·\|set\|) per row at the
    * 2²² cap.
    */
  private[graft] def contaminatedFlag(textCol: org.apache.spark.sql.Column,
                       evalGrams: Array[Long], n: Int,
                       md5Substrate: Boolean): org.apache.spark.sql.Column = {
    require(evalGrams.nonEmpty, "eval gram set is empty")
    val keys =
      if (md5Substrate)
        transform(TextPipeline.wordGramArray(textCol, n), g => Det.md5Hash60(g))
      else
        graft.functions.RollingGramKeys.rollingGramKeys(
          TextPipeline.tokens(textCol), n)
    exists(keys, g => graft.functions.BroadcastLookup.inLongSet(g, evalGrams))
  }

  /** Per-source contamination audit: every train doc counted once, hits
    * flagged via left join against the contaminated-id set.
    */
  def contaminationBySource(train: DataFrame, evalDocs: DataFrame, n: Int,
      md5Substrate: Boolean = true): DataFrame = {
    val hits = contaminatedDocs(train, evalDocs, n, md5Substrate)
      .withColumn("is_hit", lit(1))
    train.select("doc_id", "source")
      .join(hits, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), count(col("is_hit")).as("n_contaminated"))
      .orderBy("source")
  }
}
