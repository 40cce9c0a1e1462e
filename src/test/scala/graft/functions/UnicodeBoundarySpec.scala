package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The boundary CONTRACT of the ASCII `[a-z0-9]+` token substrate on
  * non-Latin text, pinned the way `WordSetCount` pinned RE2's `\b`: every
  * non-ASCII code point — CJK, RTL letters, combining marks, bidi
  * controls, zero-width joiners, supplementary-plane letters — is a token
  * BOUNDARY, never token content, with no Unicode normalization anywhere
  * (NFC "café" and NFD "café" tokenize DIFFERENTLY,
  * deliberately: the engine never rewrites bytes it wasn't given). This
  * spec asserts the DOCUMENTED skip semantics on a probe corpus, plus the
  * cross-kernel agreement that makes original-byte emission safe on such
  * text: the spans `token_char_spans` reports must slice the lowered text
  * to exactly the tokens `text_tokens` returns, for every probe shape.
  *
  * Invisible code points are spelled as escapes throughout: ‎ LRM,
  * ‏ RLM, ‍ ZWJ, ‌ ZWNJ, ́ combining acute,
  *   NBSP.
  */
class UnicodeBoundarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-unicodeboundary-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the probe corpus: (text, expected tokens under the documented
  // ASCII-run contract)
  private val probes: Seq[(String, Seq[String])] = Seq(
    // RTL scripts: Arabic and Hebrew letters are boundaries
    ("مرحبا abc שלום def",
      Seq("abc", "def")),
    // RTL letters ADJACENT to an ASCII run: the run survives intact
    ("مرحباthe9قطة", Seq("the9")),
    // bidi control marks (LRM/RLM) split a would-be single token
    ("ab‎cd ‏ef", Seq("ab", "cd", "ef")),
    // zero-width joiner / non-joiner inside a word: boundary
    ("ab‍cd ef‌gh", Seq("ab", "cd", "ef", "gh")),
    // combining mark (NFD): the ASCII base letter stays token content,
    // the mark is a boundary — vs the precomposed (NFC) form where the
    // non-ASCII letter breaks the run one code point earlier
    ("café latte", Seq("cafe", "latte")),
    ("café latte", Seq("caf", "latte")),
    // supplementary-plane letters (math bold) and emoji are boundaries
    ("𝕒𝕓 ab", Seq("ab")),
    ("a😀b", Seq("a", "b")),
    // pure non-Latin text: zero tokens (documented: such docs contribute
    // nothing to dedup/token stats rather than garbage)
    ("مرحبا שלום 中文",
      Seq()),
    ("", Seq()))

  test("text_tokens: every non-ASCII code point is a boundary, never content") {
    probes.foreach { case (text, want) =>
      val got = TextTokenOps.tokens(UTF8String.fromString(text))
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"text '$text'")
    }
  }

  test("token_char_spans agrees with text_tokens on every probe (the emission contract)") {
    val sp = spark; import sp.implicits._
    val df = probes.map(_._1).toDF("t")
    val rows = df.select(col("t"),
        TextTokens.textTokens(col("t")).as("toks"),
        TokenCharSpans.tokenCharSpans(col("t")).as("tcs"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      val tcs = r.getStruct(2)
      val spans = tcs.getSeq[org.apache.spark.sql.Row](0)
      assert(spans.length == toks.length, s"span count for '$text'")
      val lowered = UTF8String.fromString(text).toLowerCase.toString
      val cps = lowered.codePoints().toArray
      toks.zip(spans).foreach { case (tok, span) =>
        val (st, en) = (span.getLong(0).toInt, span.getLong(1).toInt)
        // spans are code-point coordinates into the lowered text; slice
        // by code point, not UTF-16 unit (supplementary chars are 2 units)
        val slice = new String(cps, st, en - st + 1)
        assert(slice == tok, s"span [$st,$en] of '$text': '$slice' != '$tok'")
      }
    }
  }

  test("normalize_text collapses only ASCII-\\s runs; bidi/zero-width marks survive") {
    // the exact-dedup fingerprint must not conflate texts that differ by
    // invisible marks (no normalization = no silent merging of distinct
    // byte streams), while ASCII whitespace still collapses around them
    val sp = spark; import sp.implicits._
    val cases = Seq(
      "ab ‍ cd",                      // ZWJ between collapsed spaces
      "مرحبا   שלום",
      " ‎ lead",                      // LRM is not \s: trim stops there
      "a b")                          // NBSP is not Java \s
    val got = cases.toDF("t")
      .select(NormalizeText.normalizeText(col("t"))).collect().map(_.getString(0))
    assert(got(0) == "ab ‍ cd")
    assert(got(1) == "مرحبا שלום")
    assert(got(2) == "‎ lead", "trim must stop at the non-\\s LRM")
    assert(got(3) == "a b")
    // and the distinction is load-bearing for dedup: ZWJ-decorated text
    // must NOT fingerprint-collide with its undecorated twin
    assert(got(0) != "ab cd")
  }

  test("word_set_count fires on RTL-adjacent set words (ASCII-run, like the CJK case)") {
    val set = WordSetCount.buildSet(Seq("the"))
    assert(TextCountOps.wordSetCount(UTF8String.fromString(
      "مرحباtheقطة"), set) == 1)
    assert(TextCountOps.wordSetCount(UTF8String.fromString(
      "‍the‌"), set) == 1)
    assert(TextCountOps.wordSetCount(UTF8String.fromString(
      "atheb"), set) == 0, "interior run must not match")
  }

  test("signature kernels are deterministic and explosion-free on RTL/combining text") {
    // shingles are code points of the lowered text; RTL and combining
    // content shingles like any other chars — no throw, stable output
    val texts = Seq(
      "مرحبا بال longer rtl text here",
      "café combining séquence long enough to shingle")
    texts.foreach { t =>
      val s = UTF8String.fromString(t)
      val a = MinhashSigOps.signature(s, 5, 18)
      val b = MinhashSigOps.signature(s, 5, 18)
      assert((0 until a.numElements()).map(a.getLong) ==
        (0 until b.numElements()).map(b.getLong))
      assert(a.numElements() == 18)
      val w1 = WinnowFpsOps.select(s, 5, 4)
      val w2 = WinnowFpsOps.select(s, 5, 4)
      assert(w1.numElements() == w2.numElements() && w1.numElements() > 0)
    }
  }
}
