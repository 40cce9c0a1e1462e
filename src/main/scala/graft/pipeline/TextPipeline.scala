package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Det

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization, quality scoring, language identification and
  * document fingerprinting. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs in the hot path), so filters
  * and projections around these stay inside whole-stage codegen and push
  * into the parquet scan.
  */
object TextPipeline {

  /** Lowercase + whitespace-collapse + trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Word tokens: maximal [a-z0-9]+ runs of the lowercased text. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Whitespace-delimited token count (the cheap estimator); 0 for empty
    * or whitespace-only text (split of "" yields [""], size 1, otherwise).
    */
  def wsTokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(split(trim(c), "\\s+")))

  /** A BPE-ish subword proxy: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** English-ish stopword hits (used by quality scoring). */
  val stopwordPattern = "\\b(the|a|and|of|to|in|is|on|for|with)\\b"

  def stopwordCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(stopwordPattern), lit(0)))

  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?]"), lit(0)))

  /** Quality heuristics: length, mean token length, stopword ratio, punct
    * density. Composable columns; the composite flag marks documents that
    * look like prose rather than noise.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    Seq(
      "n_chars" -> length(text),
      "n_tokens" -> tokenCount(text),
      "mean_token_len" -> (nChars / greatest(nTok, lit(1.0))),
      "stopword_ratio" -> (stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))),
      "punct_ratio" -> (punctCount(text).cast("double") / greatest(nChars, lit(1.0))))
  }

  /** Model-based quality scoring (the fasttext-classifier-filter shape):
    * the linear predictor z = β·(1, n_tokens, stopword_ratio, punct_ratio,
    * mean_token_len) of a FIXED logistic model over the heuristic text
    * features. Kept in LINEAR space on purpose: `keep ⇔ z ≥ logit(τ)` is
    * exact double arithmetic (products and left-associated adds are
    * bit-identical across engines), so filter verdicts never hinge on a
    * transcendental's last ulp — compute `sigmoid(z)` only as a display
    * score. Row-local, UDF-free, codegen-fused; training the β itself is
    * the job of the SLOPE estimator (`fit/SlopeEstimator`), whose binomial
    * family produces exactly this shape of model.
    */
  def classifierScore(text: Column, beta: Array[Double]): Column = {
    require(beta.length == 5, s"beta must be (b0, bTok, bStop, bPunct, bMtl)")
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val stopR = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    val punctR = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val mtl = nChars / greatest(nTok, lit(1.0))
    lit(beta(0)) + lit(beta(1)) * nTok + lit(beta(2)) * stopR +
      lit(beta(3)) * punctR + lit(beta(4)) * mtl
  }

  /** Per-language function-word patterns for the n-gram/stopword language-ID
    * heuristic. ASCII-only patterns so the same regex runs in Spark (Java
    * regex) and any RE2-based oracle.
    */
  val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|was|for)\\b",
    "de" -> "\\b(der|die|das|und|nicht|ist|ich|ein|zu|den)\\b",
    "fr" -> "\\b(le|la|les|et|des|est|une|dans|que|pour)\\b",
    "es" -> "\\b(el|los|las|es|una|en|que|por|con|para)\\b")

  def langScore(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** Predicted language: argmax of the per-language scores with a fixed
    * tie-break order (declaration order above); 'und' when no pattern hits.
    */
  def langId(text: Column): Column = {
    val scores = langPatterns.map { case (l, p) => l -> langScore(text, p) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Word n-gram array of the text, one entry per OCCURRENCE in document
    * order (space-joined token windows). Built entirely inside the row —
    * no positional self-join, so per-doc gram work never shuffles — by the
    * native codegen'd `WordGrams` expression (`wordGramArrayHof` is the
    * interpreted `transform`/`slice` twin it is property-tested against).
    * Empty array for docs with fewer than n tokens.
    */
  def wordGramArray(c: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    graft.functions.WordGrams.wordGrams(tokens(c), n)
  }

  /** Composable higher-order-function twin of [[wordGramArray]] (kept as
    * the semantic reference; interpreted, so not used on hot paths).
    * NULL text → NULL, like the native expression (the bare
    * when/otherwise would silently turn NULL into the empty array);
    * token arrays from `tokens` never contain NULL elements, so the
    * native path's element-poisoning case has no HOF analogue here.
    */
  def wordGramArrayHof(c: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = tokens(c)
    // sequence(1, size-n+1) would count DOWN for short docs; guard first.
    when(toks.isNull, lit(null).cast("array<string>"))
      .when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** 60-bit md5 fingerprint of the normalized text — the exact-dedup key
    * (shared hash recipe with the DuckDB oracle, see Det.md5Hash60).
    */
  def fingerprint(text: Column): Column = Det.md5Hash60(normalize(text))

  /** Karp–Rabin rolling hash over the normalized text — the incremental
    * fingerprint a streaming/chunked pipeline would maintain. Pure Scala
    * (used inside mapPartitions extractors); not SQL-oracled.
    */
  def rollingHash(s: String): Long = {
    val mod = 1000000000000007L // < 2^63/31: no overflow in acc*31+c
    var acc = 7L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i).toLong) % mod
      i += 1
    }
    acc
  }
}
