package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared skeleton for native element-wise array-fold expressions.
  *
  * The composable formulations (`aggregate(zip_with(a, b, _*_), ...)`) are
  * semantically identical but their lambdas run on Catalyst's INTERPRETED
  * higher-order-function path — per-element closure dispatch and boxing
  * that measured ~100× slower than DuckDB's `list_dot_product` on the same
  * data and dominated every similarity query. Subclasses compile to a
  * tight primitive `for` loop inside whole-stage codegen.
  *
  * Shared semantics (matching the zip_with formulation and the DuckDB
  * oracles): elements widen to double and accumulate sequentially in
  * element order (deterministic — no reassociation); the result is NULL if
  * either array is NULL, any element is NULL, or the lengths differ
  * (zip_with null-pads the shorter array, which poisons the sum — a
  * truncating loop would instead return a plausible-but-wrong value for a
  * corrupt-width vector). Any integral or floating element type is
  * accepted, like the `cast("double")` in the formulation this replaces.
  */
abstract class VecFoldExpression extends BinaryExpression {

  /** Number of accumulators (def, not a constructor param: an abstract-class
    * constructor argument breaks Java deserialization of the concrete case
    * classes on executors — "no valid constructor").
    */
  protected def nAcc: Int

  /** Fold one element pair into the accumulators (interpreted path). */
  protected def update(acc: Array[Double], x: Double, y: Double): Unit

  /** Combine the accumulators into the result (interpreted path). */
  protected def finish(acc: Array[Double]): Double

  /** Same fold as Java source, `x`/`y` are double-typed variable names. */
  protected def updateCode(acc: IndexedSeq[String], x: String, y: String): String

  /** Same combine as a Java expression over the accumulator names. */
  protected def finishCode(acc: IndexedSeq[String]): String

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                     ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires arrays of integral or floating elements, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // a length mismatch yields NULL regardless of child nullability, so the
  // expression is always nullable
  override def nullable: Boolean = true

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case DoubleType => (a, i) => a.getDouble(i)
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType   => (a, i) => a.getLong(i).toDouble
    case ShortType  => (a, i) => a.getShort(i).toDouble
    case ByteType   => (a, i) => a.getByte(i).toDouble
    case dt => throw new IllegalStateException(s"unreachable: $dt passed type check")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    if (la.numElements() != lb.numElements()) return null
    val getA = getter(elemType(left))
    val getB = getter(elemType(right))
    val n = la.numElements()
    val acc = new Array[Double](nAcc)
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || lb.isNullAt(i)) return null
      update(acc, getA(la, i), getB(lb, i))
      i += 1
    }
    finish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val accs = IndexedSeq.tabulate(nAcc)(k => ctx.freshName(s"acc$k"))
      val getA = CodeGenerator.getValue(arr1, elemType(left), i)
      val getB = CodeGenerator.getValue(arr2, elemType(right), i)
      val containsNull =
        left.dataType.asInstanceOf[ArrayType].containsNull ||
          right.dataType.asInstanceOf[ArrayType].containsNull
      // `nullable` is always true, so ev.isNull is a real variable
      val elemNullCheck =
        if (containsNull)
          s"if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |${accs.map(a => s"double $a = 0.0;").mkString(" ")}
         |if ($arr1.numElements() != $arr2.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $arr1.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    double $x = (double)($getA);
         |    double $y = (double)($getB);
         |    ${updateCode(accs, x, y)}
         |  }
         |}
         |${ev.value} = ${finishCode(accs)};
       """.stripMargin
    })
}

/** Native codegen'd dot product of two numeric-array columns. */
case class VecDot(left: Expression, right: Expression)
    extends VecFoldExpression {

  override protected def nAcc: Int = 1

  override protected def update(acc: Array[Double], x: Double, y: Double): Unit =
    acc(0) += x * y

  override protected def finish(acc: Array[Double]): Double = acc(0)

  override protected def updateCode(acc: IndexedSeq[String], x: String, y: String): String =
    s"${acc(0)} += $x * $y;"

  override protected def finishCode(acc: IndexedSeq[String]): String = acc(0)

  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE array traversal: dot(a,b), dot(a,a), dot(b,b)
  * accumulate in the same loop (the composed `dot/(norm·norm)` form walks
  * the arrays three times); the final `ab / (sqrt(aa)·sqrt(bb))` is the
  * same arithmetic, so results are bit-identical to the composed form and
  * to DuckDB's `list_dot_product / (sqrt·sqrt)` oracle recipe. Zero-norm
  * inputs divide to NaN (like the composed form), not NULL.
  */
case class VecCosine(left: Expression, right: Expression)
    extends VecFoldExpression {

  override protected def nAcc: Int = 3

  override protected def update(acc: Array[Double], x: Double, y: Double): Unit = {
    acc(0) += x * y; acc(1) += x * x; acc(2) += y * y
  }

  override protected def finish(acc: Array[Double]): Double =
    acc(0) / (math.sqrt(acc(1)) * math.sqrt(acc(2)))

  override protected def updateCode(acc: IndexedSeq[String], x: String, y: String): String =
    s"${acc(0)} += $x * $y; ${acc(1)} += $x * $x; ${acc(2)} += $y * $y;"

  override protected def finishCode(acc: IndexedSeq[String]): String =
    s"${acc(0)} / (java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)}))"

  override def prettyName: String = "vec_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VecFunctions {
  def vecDot(a: Column, b: Column): Column =
    GraftSql.column(VecDot(GraftSql.expression(a), GraftSql.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    GraftSql.column(VecCosine(GraftSql.expression(a), GraftSql.expression(b)))
}
