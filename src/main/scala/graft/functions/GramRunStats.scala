package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram histogram-run statistics in ONE pass:
  * `gram_run_stats(tokens, n)` returns `struct(best, bestg, uniq)` — the
  * highest multiplicity among the space-joined n-grams of the token array,
  * the n-gram achieving it (ties → smallest string, i.e. the first maximal
  * run in ascending order), and the distinct n-gram count. `n = 1` makes
  * it plain element-run statistics.
  *
  * Semantically identical to building the gram array with
  * `transform`/`slice`/`array_join`, sorting it, and scanning equal-runs
  * with the `aggregate` higher-order function (`Repetition.topRunStats`,
  * property-pinned in RepetitionSpec) — but every step of that chain runs
  * on Catalyst's INTERPRETED lambda evaluator, a closure dispatch + row
  * allocation per element. Here gram construction, the sort (binary
  * UTF8String order — the ordering Spark's `array_sort` and DuckDB's
  * `ORDER BY` apply to ASCII grams), and the run scan happen in one static
  * call inside the generated plan; measured ~3× on the repetition pass.
  *
  * NULL result iff the token array is NULL or contains a NULL element
  * (parity with the HOF formulation's null poisoning). Fewer than n tokens
  * → the zero struct (no grams).
  */
case class GramRunStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val n = right.eval(null)
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = GramRunStats.outType

  override def nullIntolerant: Boolean = true

  // a NULL element yields NULL regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, n: Any): Any =
    GramRunOps.compute(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |${ev.value} = graft.functions.GramRunOps.compute($arr, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override def prettyName: String = "gram_run_stats"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramRunStats =
    copy(left = newLeft, right = newRight)
}

object GramRunStats {
  val outType: StructType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("bestg", StringType, nullable = false),
    StructField("uniq", LongType, nullable = false)))

  def gramRunStats(tokens: Column, n: Int = 1): Column =
    GraftSql.column(GramRunStats(GraftSql.expression(tokens), Literal(n)))
}

/** Native word-n-gram array builder: `word_grams(tokens, n)` returns the
  * space-joined n-grams in OCCURRENCE order (one per window), the codegen'd
  * twin of the `transform(sequence(...), i -> array_join(slice(...)))`
  * idiom — which runs per-window on the interpreted lambda evaluator.
  * Fewer than n tokens → empty array; NULL array or NULL element → NULL
  * (parity with the HOF formulation).
  */
case class WordGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val n = right.eval(null)
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  // a NULL element yields NULL regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, n: Any): Any =
    GramRunOps.grams(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |${ev.value} = graft.functions.GramRunOps.grams($arr, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override def prettyName: String = "word_grams"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGrams =
    copy(left = newLeft, right = newRight)
}

object WordGrams {
  def wordGrams(tokens: Column, n: Int): Column =
    GraftSql.column(WordGrams(GraftSql.expression(tokens), Literal(n)))
}

/** Static helper called from generated code (kept outside the case class so
  * the static forwarder is unambiguous in Java source).
  */
object GramRunOps {
  private val space = UTF8String.fromString(" ")

  /** Shared gram construction: NULL-element scan runs over the WHOLE array
    * first (so a short-but-dirty array still poisons, per the expressions'
    * contract), then the space-joined window build. null return = a NULL
    * element was present; empty array = fewer than n tokens.
    */
  private def buildGrams(a: ArrayData, n: Int): Array[AnyRef] = {
    val len = a.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (a.isNullAt(i)) return null
      toks(i) = a.getUTF8String(i)
      i += 1
    }
    val m = len - n + 1
    if (m <= 0) return Array.empty[AnyRef]
    val out = new Array[AnyRef](m)
    if (n == 1) System.arraycopy(toks, 0, out, 0, m)
    else {
      i = 0
      while (i < m) {
        out(i) = UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
        i += 1
      }
    }
    out
  }

  /** Gram array in occurrence order, or null if any element is NULL. */
  def grams(a: ArrayData, n: Int): ArrayData = {
    val g = buildGrams(a, n)
    if (g == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(g.asInstanceOf[Array[Any]])
  }

  /** null return = a NULL element was present (caller maps it to SQL NULL). */
  def compute(a: ArrayData, n: Int): InternalRow = {
    val grams = buildGrams(a, n)
    if (grams == null) return null
    val m = grams.length
    if (m == 0) return new GenericInternalRow(Array[Any](0L, UTF8String.EMPTY_UTF8, 0L))
    java.util.Arrays.sort(grams)
    var best = 1L
    var bestg = grams(0).asInstanceOf[UTF8String]
    var run = 1L
    var uniq = 1L
    var i = 1
    while (i < m) {
      if (grams(i).equals(grams(i - 1))) run += 1
      else { run = 1L; uniq += 1L }
      if (run > best) { best = run; bestg = grams(i).asInstanceOf[UTF8String] }
      i += 1
    }
    new GenericInternalRow(Array[Any](best, bestg, uniq))
  }
}
