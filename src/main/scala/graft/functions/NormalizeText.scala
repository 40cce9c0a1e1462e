package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization: `normalize_text(text)` ≡
  * `trim(regexp_replace(lower(text), '\s+', ' '))` — the exact-dedup
  * fingerprint's canonical form, pinned equal to the regex composition in
  * NormalizeTextSpec. One pass over the lowered string's UTF-8 bytes into
  * an output buffer: maximal ASCII-whitespace runs (Java `\s`: space \t
  * \n \x0B \f \r — multi-byte characters are never whitespace) collapse
  * to one space, leading/trailing runs drop entirely. The regex
  * composition walked every document with a matcher and built an
  * intermediate replaced string before `trim` — this runs once per
  * document in every exact-dedup rep-collapse, so it is corpus-scan CPU.
  * NULL → NULL.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    NormalizeTextOps.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NormalizeTextOps.normalize($s)")

  override def prettyName: String = "normalize_text"

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def normalizeText(text: Column): Column =
    GraftSql.column(NormalizeText(GraftSql.expression(text)))
}

/** Static helper called from generated code. */
object NormalizeTextOps {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def normalize(text: UTF8String): UTF8String = {
    val lowered = text.toLowerCase
    val bs = lowered.getBytes
    val n = bs.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = bs(i)
      if (isWs(b)) { if (o > 0) pendingSpace = true } // leading ws drops
      else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = b
        o += 1
      }
      i += 1
    }
    // trailing ws dropped by never flushing the pending space
    UTF8String.fromBytes(out, 0, o)
  }
}
