package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text counters — the codegen'd twins of the three
  * regex shapes the quality/language operators count with, each pinned
  * equal to its regex form in TextCountsSpec:
  *
  *   - [[WordSetCount]]  ≡ `size(regexp_extract_all(lower(text), '\b(w1|w2|…)\b', 0))`
  *   - [[BpeishCount]]   ≡ `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0))`
  *   - [[AsciiSetCount]] ≡ `size(regexp_extract_all(text, '[c1c2…]', 0))` for ASCII chars
  *
  * The equivalences are structural, not statistical. For [[WordSetCount]]:
  * every wi is a plain `[a-z0-9]+` word (enforced), so `\bwi\b` matches
  * exactly where a MAXIMAL `\w`-run (`[a-z0-9_]` after lowercasing) of the
  * text equals wi — `\b` fires only at `\w`/non-`\w` transitions, so a run
  * with extra word chars on either side ("there", "the_", "the1") can
  * never match, matches can never overlap, and counting runs that hash
  * into the word set counts exactly the regex's matches. One deliberate
  * boundary choice: `\w` here is ASCII — the RE2 semantics the DuckDB
  * oracle evaluates — while java.util.regex's `\b` is Unicode-aware
  * ("中the文" matches `\bthe\b` under RE2 and this counter, but not under
  * Java regex). The two Spark forms only diverge when a set word abuts a
  * non-ASCII letter; the native counter sides with the ORACLE's engine,
  * closing a latent cross-engine divergence the regex form carried. For
  * [[BpeishCount]]: the alternation's three arms are disjoint (alpha runs,
  * digit runs, single non-alnum-non-space code points), so the count is
  * #alpha-runs + #digit-runs + #other-non-space code points; a multi-byte
  * character contributes via its lead byte only. For [[AsciiSetCount]]:
  * the counted chars are single ASCII bytes, which in UTF-8 never occur
  * inside a multi-byte sequence.
  *
  * Each replaces a java.util.regex matcher walk + per-match String copy
  * per document with one scan over the (lowered, where the regex lowers)
  * string's UTF-8 bytes. `langId` alone ran FOUR pattern walks per
  * document; the quality profile ran three. NULL text → NULL, matching
  * `size(regexp_extract_all(NULL, …))`.
  */
case class WordSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  // Seq, not Array: case-class equality on an Array field is identity-based,
  // which would make semantically identical expressions never compare equal —
  // defeating Catalyst canonicalization, common-subexpression elimination and
  // exchange reuse. Seq equality is structural, so two counters over the same
  // word list canonicalize together.
  require(words.nonEmpty && words.forall(_.matches("[a-z0-9]+")),
    "WordSetCount requires plain lowercase [a-z0-9]+ words")

  // HashSet is not kryo/java-serialization-stable across the codegen
  // reference-object ship, so the set is rebuilt lazily from the words
  @transient private lazy val set: java.util.HashSet[UTF8String] =
    WordSetCount.buildSet(words)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextCountOps.wordSetCount(s.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextCountOps.wordSetCount($s, $ref)")
  }

  override def prettyName: String = "word_set_count"

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
}

object WordSetCount {
  private[functions] def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, (words.length / 0.75).toInt + 1))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def wordSetCount(text: Column, words: Seq[String]): Column =
    GraftSql.column(WordSetCount(GraftSql.expression(text), words.toVector))
}

case class BpeishCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextCountOps.bpeishCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextCountOps.bpeishCount($s)")

  override def prettyName: String = "bpeish_count"

  override protected def withNewChildInternal(newChild: Expression): BpeishCount =
    copy(child = newChild)
}

object BpeishCount {
  def bpeishCount(text: Column): Column =
    GraftSql.column(BpeishCount(GraftSql.expression(text)))
}

case class AsciiSetCount(child: Expression, chars: String)
    extends UnaryExpression {

  require(chars.nonEmpty && chars.forall(c => c < 128),
    "AsciiSetCount requires a non-empty ASCII char set")

  @transient private lazy val mask: Array[Boolean] = {
    val m = new Array[Boolean](128)
    chars.foreach(c => m(c) = true)
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextCountOps.asciiSetCount(s.asInstanceOf[UTF8String], mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charMask", mask, "boolean[]")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextCountOps.asciiSetCount($s, $ref)")
  }

  override def prettyName: String = "ascii_set_count"

  override protected def withNewChildInternal(newChild: Expression): AsciiSetCount =
    copy(child = newChild)
}

object AsciiSetCount {
  def asciiSetCount(text: Column, chars: String): Column =
    GraftSql.column(AsciiSetCount(GraftSql.expression(text), chars))
}

/** Static helpers called from generated code. */
object TextCountOps {

  /** Count of maximal `[a-z0-9_]`-runs of the LOWERED text that are in
    * `set` — ≡ counting `\b(w1|…)\b` matches for plain-word alternations
    * (see [[WordSetCount]]'s equivalence argument). Non-ASCII characters
    * are `\W` in Java's default regex mode, so any byte ≥ 0x80 breaks a
    * run exactly like punctuation does.
    */
  def wordSetCount(text: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val lowered = text.toLowerCase
    val bs = lowered.getBytes
    val n = bs.length
    var count = 0
    var runSt = -1
    var i = 0
    while (i <= n) {
      val isWord = i < n && {
        val b = bs(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'
      }
      if (isWord) { if (runSt < 0) runSt = i }
      else if (runSt >= 0) {
        if (set.contains(UTF8String.fromBytes(bs, runSt, i - runSt))) count += 1
        runSt = -1
      }
      i += 1
    }
    count
  }

  /** #alpha-runs + #digit-runs + #non-alnum-non-space code points of the
    * LOWERED text — ≡ `[a-z]+|[0-9]+|[^a-z0-9\s]` match count (Java `\s`
    * is ASCII-only: space \t \n \x0B \f \r). A multi-byte character is
    * neither alnum nor ASCII whitespace: its lead byte counts one match,
    * continuation bytes are skipped.
    */
  def bpeishCount(text: UTF8String): Int = {
    val lowered = text.toLowerCase
    val bs = lowered.getBytes
    val n = bs.length
    var count = 0
    var inAlpha = false
    var inDigit = false
    var i = 0
    while (i < n) {
      val b = bs(i)
      if (b >= 'a' && b <= 'z') {
        if (!inAlpha) count += 1
        inAlpha = true; inDigit = false
      } else if (b >= '0' && b <= '9') {
        if (!inDigit) count += 1
        inDigit = true; inAlpha = false
      } else {
        inAlpha = false; inDigit = false
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
        // count ASCII non-ws marks and multi-byte LEAD bytes (0b11xxxxxx);
        // continuation bytes (0b10xxxxxx) belong to an already-counted char
        if (!ws && (b & 0xc0) != 0x80) count += 1
      }
      i += 1
    }
    count
  }

  /** Count of bytes whose value is flagged in `mask` (ASCII-only set) —
    * ≡ counting single-char-class regex matches over the RAW text, since
    * ASCII bytes never occur inside a UTF-8 multi-byte sequence.
    */
  def asciiSetCount(text: UTF8String, mask: Array[Boolean]): Int = {
    val n = text.numBytes
    var count = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b >= 0 && mask(b)) count += 1
      i += 1
    }
    count
  }
}
