package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 60-bit term-frequency-weighted SimHash in ONE pass:
  * `simhash_fp(text)` tokenizes (the [[TextTokens]] `[a-z0-9]+` runs of
  * the lowered text), counts term frequencies in-row, and for each of the
  * 60 bits of each DISTINCT token's md5₆₀ accumulates the ±tf vote,
  * emitting the fingerprint whose bit b is set iff vote_b > 0 —
  * value-identical to the exploded formulation (token explode → tf
  * groupBy → 60-column vote aggregation → assemble), pinned in
  * SimhashFpSpec.
  *
  * The exploded form shuffles nothing extra locally (the doc-id
  * pre-partition covers both aggregations) but still pays L generated
  * rows, a (doc_id, tok) hash-aggregate over every token occurrence, and
  * a 60-column wide aggregate per doc. Here the tf table is a per-row
  * HashMap of zero-copy token views over the lowered byte buffer, each
  * distinct token is MD5'd once straight from that buffer, and the vote
  * fold runs in a 60-slot local array — the whole operator becomes
  * map-side CPU with NO aggregation exchange, the same conversion
  * [[MinhashSig]] applies to the MinHash chain.
  *
  * NULL text OR a token-free document → NULL (the exploded path emits no
  * row for token-free docs; callers filter the NULLs to match).
  */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  // token-free docs yield NULL even for a non-null child
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    SimhashFpOps.fingerprint(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |java.lang.Long ${ev.value}_v = graft.functions.SimhashFpOps.fingerprint($s);
         |if (${ev.value}_v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_v.longValue(); }
       """.stripMargin
    })

  override def prettyName: String = "simhash_fp"

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}

object SimhashFp {
  def simhashFp(text: Column): Column =
    GraftSql.column(SimhashFp(GraftSql.expression(text)))
}

/** Static helper called from generated code. */
object SimhashFpOps {

  /** null = no tokens (caller maps to SQL NULL). Token spans are found by
    * the same byte scan as [[TextTokenOps.tokens]]; distinct-token term
    * frequencies accumulate in a HashMap of zero-copy views; each distinct
    * token is digested once, straight from the lowered buffer.
    */
  def fingerprint(text: UTF8String): java.lang.Long = {
    val lowered = text.toLowerCase
    val bs = lowered.getBytes
    val n = bs.length
    // token span -> tf; key is a zero-copy view, value = {count, st, len}
    val tf = new java.util.HashMap[UTF8String, Array[Int]]()
    var runSt = -1
    var i = 0
    while (i <= n) {
      val isTok = i < n && {
        val b = bs(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      }
      if (isTok) { if (runSt < 0) runSt = i }
      else if (runSt >= 0) {
        val v = tf.computeIfAbsent(
          UTF8String.fromBytes(bs, runSt, i - runSt),
          _ => Array(0, runSt, i - runSt))
        v(0) += 1
        runSt = -1
      }
      i += 1
    }
    if (tf.isEmpty) return null
    val votes = new Array[Long](60)
    val it = tf.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      val h = Md5Hash60.hash60Range(bs, v(1), v(2))
      val w = v(0).toLong
      var b = 0
      while (b < 60) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) w else -w)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
