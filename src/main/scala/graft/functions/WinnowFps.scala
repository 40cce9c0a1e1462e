package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document winnowing fingerprint selection in ONE pass:
  * `winnow_fps(text, k, w)` returns one `struct(pos, fp)` per FULL
  * w-gram window — the window's minimum composite key, i.e. the
  * Schleimer–Wilkerson–Aiken "robust winnowing" selection (smallest
  * 40-bit md5-derived gram hash, rightmost position on ties) —
  * value-identical to the exploded formulation (char-gram explode →
  * composite key → per-doc sorted `Window` min), pinned in
  * WinnowFpsSpec.
  *
  * The exploded form pays L generated rows per document AND a per-doc
  * window sort (a corpus-scale shuffle when the input isn't already
  * doc-partitioned, a partition-local sort even when it is). Here the
  * gram hashes come from in-place byte ranges of the lowered string
  * ([[Md5Hash60.hash60Range]], char-boundary offsets computed once) and
  * the per-window minimum is a monotonic-deque sliding min — O(L) per
  * document, no explode, no shuffle, no sort, emitted row-locally.
  *
  * Same composite-key arithmetic as the exploded form:
  * `c = (md5₆₀(gram) mod 2⁴⁰)·2²³ + (2²³−1−i)` with 1-based gram
  * position i, decoded back to `(pos, fp)` per selected window. Docs
  * shorter than k+w−1 chars → empty array. Documents past the 2²³−1-gram
  * cap throw (the exploded form raises the same loud error — silent
  * corruption would be oracle-invisible since both engines would corrupt
  * identically). NULL text → NULL.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram width k must be >= 1, got $k")
  require(w >= 1, s"window width w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = WinnowFps.outType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    WinnowFpsOps.select(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WinnowFpsOps.select($s, $k, $w)")

  override def prettyName: String = "winnow_fps"

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  def winnowFps(text: Column, k: Int, w: Int): Column =
    GraftSql.column(WinnowFps(GraftSql.expression(text), k, w))
}

/** Static helper called from generated code. */
object WinnowFpsOps {

  private val FpMod: Long = 1L << 40
  private val PosMod: Long = 1L << 23

  def select(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val lowered = text.toLowerCase
    val bs = lowered.getBytes
    val nb = bs.length
    // sized nb+1, not numChars+1: on malformed UTF-8 the non-continuation
    // byte count can exceed numChars and overflow the array (see the same
    // guard in MinhashSigOps.signature)
    val offs = new Array[Int](nb + 1)
    var c = 0
    var i = 0
    while (i < nb) {
      if ((bs(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(c) = nb
    val L = c
    if (L < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val m = L - k + 1 // gram count; 1-based gram positions 1..m
    if (m > PosMod - 1) throw new IllegalStateException(
      s"winnow: document exceeds the ${PosMod - 1}-gram cap")
    // composite keys, then sliding min over each full w-window via a
    // monotonic deque of indices (front = current window's argmin)
    val comp = new Array[Long](m)
    i = 0
    while (i < m) {
      val h40 = java.lang.Long.remainderUnsigned(
        Md5Hash60.hash60Range(bs, offs(i), offs(i + k) - offs(i)), FpMod)
      comp(i) = h40 * PosMod + (PosMod - 1 - (i + 1))
      i += 1
    }
    val nWin = m - w + 1
    val out = new Array[Any](nWin)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < m) {
      while (tail > head && comp(deque(tail - 1)) >= comp(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val mc = comp(deque(head))
        out(i - w + 1) = new GenericInternalRow(
          Array[Any](PosMod - 1 - (mc % PosMod), mc / PosMod))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
