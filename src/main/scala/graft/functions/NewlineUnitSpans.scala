package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unit-span kernel for the paragraph/line dedup family:
  * `newline_unit_spans(text, minRun)` returns the 0-based inclusive
  * CHARACTER spans `array<struct<st,en>>` of the separator-split units of
  * `text`, where the separator is
  *
  *   - `minRun = 1`: every single `\n` (the [[graft.pipeline.ParagraphDedup.LineSep]]
  *     notion — a run of k newlines yields k−1 empty units between them),
  *   - `minRun = 2`: every MAXIMAL run of ≥ 2 newlines (the
  *     [[graft.pipeline.ParagraphDedup.ParagraphSep]] notion `\n{2,}` —
  *     greedy, so a run of 5 newlines is ONE separator).
  *
  * This is the codegen'd twin of the generic regex fold
  * ([[graft.pipeline.ParagraphDedup.unitSpansHof]] — `split` +
  * `regexp_extract_all` + an `aggregate` fold accumulating the char
  * cursor), which stays in-tree as the DEFINITION and the path for custom
  * separator regexes. The fold appends to an accumulator array that
  * Catalyst copies per step — O(units²) row-local work, quadratic on a
  * single document with tens of thousands of LINES (the round-12 ADVICE
  * caveat on `LineSep`). Here the whole derivation is ONE scan over the
  * UTF-8 bytes: `\n` is a single-byte character, the char cursor advances
  * on non-continuation bytes, and each unit emits exactly one span —
  * O(units) total. Pinned bit-identical to the fold for both shipped
  * separators in `NewlineUnitSpansSpec` (random corpora + adversarial
  * newline-run/Unicode/empty-piece cases).
  *
  * Output matches the fold exactly: an empty piece (leading/trailing/
  * adjacent separators) has `en = st − 1`; empty text yields one empty
  * unit `(0, −1)` (as `split` yields `[""]`). NULL text → NULL.
  */
case class NewlineUnitSpans(child: Expression, minRun: Int)
    extends UnaryExpression {

  require(minRun == 1 || minRun == 2,
    s"newline_unit_spans supports minRun 1 (line) or 2 (paragraph), got $minRun")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = NewlineUnitSpans.outType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    NewlineUnitSpanOps.spans(s.asInstanceOf[UTF8String], minRun)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.NewlineUnitSpanOps.spans($s, $minRun)")

  override def prettyName: String = "newline_unit_spans"

  override protected def withNewChildInternal(newChild: Expression): NewlineUnitSpans =
    copy(child = newChild)
}

object NewlineUnitSpans {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("st", LongType, nullable = false),
    StructField("en", LongType, nullable = false))), containsNull = false)

  def newlineUnitSpans(text: Column, minRun: Int): Column =
    GraftSql.column(NewlineUnitSpans(GraftSql.expression(text), minRun))
}

/** Static helper called from generated code. */
object NewlineUnitSpanOps {

  private def span(st: Long, en: Long) =
    new GenericInternalRow(Array[Any](st, en))

  /** One pass over the raw UTF-8 bytes. `\n` (0x0A) only ever occupies a
    * single byte and never appears as a continuation byte (`10xxxxxx`),
    * so newline-run detection is a byte test and the char cursor
    * increments on non-continuation bytes — char coordinates agree with
    * Spark's code-point `length`/`substr` semantics, exactly like the
    * fold they replace.
    */
  def spans(text: UTF8String, minRun: Int): GenericArrayData = {
    val n = text.numBytes
    val buf = new java.util.ArrayList[Any]()
    var charIdx = -1L   // char index of the last char seen
    var unitSt = 0L     // char index where the current unit starts
    var nlRunSt = -1L   // char index of the current newline run's first \n
    var nlRunLen = 0L
    // close the pending newline run (next char is not \n, or end of text)
    def endRun(): Unit = if (nlRunLen > 0) {
      if (minRun == 1) {
        // every \n is its own separator: k newlines emit k unit ends
        var j = 0L
        while (j < nlRunLen) {
          buf.add(span(unitSt, nlRunSt + j - 1L))
          unitSt = nlRunSt + j + 1L
          j += 1L
        }
      } else if (nlRunLen >= minRun) {
        // one greedy separator; a shorter run stays inside the unit
        buf.add(span(unitSt, nlRunSt - 1L))
        unitSt = nlRunSt + nlRunLen
      }
      nlRunSt = -1L; nlRunLen = 0L
    }
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if ((b & 0xc0) != 0x80) {
        charIdx += 1L
        if (b == 0x0a) {
          if (nlRunLen == 0L) nlRunSt = charIdx
          nlRunLen += 1L
        } else endRun()
      }
      i += 1
    }
    endRun()
    buf.add(span(unitSt, charIdx)) // the final unit (empty text: (0, -1))
    new GenericArrayData(buf.toArray)
  }
}
