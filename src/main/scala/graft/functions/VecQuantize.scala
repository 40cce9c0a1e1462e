package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native int8 vector quantization in one call:
  * `vec_quantize_int8(v)` returns `struct(scale: double, q: array<tinyint>)`
  * with `scale = max|v|/127` and `q[i] = floor(v[i]/scale + 0.5)` (the Det
  * floor-grid rounding); an all-zero/empty vector yields scale 0 and zero
  * bytes. Semantically identical to the
  * `transform(v, x -> floor(x / s + 0.5))` + `array_max(transform(...))`
  * composition — but that chain runs every element through Catalyst's
  * INTERPRETED lambda evaluator (closure dispatch + row allocation per
  * element, twice); here both passes are one static call inside the
  * generated plan, like [[VecDot]] and [[WordGrams]].
  *
  * Non-finite elements follow the composed form's semantics: a NaN or
  * ±Inf magnitude poisons the scale (array_max sorts NaN above all), and
  * the resulting non-finite ratios cast to 0 bytes. NULL array or NULL
  * element → NULL.
  */
case class VecQuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType = VecQuantizeInt8.outType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullIntolerant: Boolean = true

  // a NULL element yields NULL regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    VecQuantizeOps.quantize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |${ev.value} = graft.functions.VecQuantizeOps.quantize($arr, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override def prettyName: String = "vec_quantize_int8"

  override protected def withNewChildInternal(newChild: Expression): VecQuantizeInt8 =
    copy(child = newChild)
}

object VecQuantizeInt8 {
  val outType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  def vecQuantizeInt8(v: Column): Column =
    GraftSql.column(VecQuantizeInt8(GraftSql.expression(v)))
}

/** Static helper called from generated code (kept outside the case class so
  * the static forwarder is unambiguous in Java source).
  */
object VecQuantizeOps {
  /** null return = a NULL element was present (caller maps it to SQL NULL). */
  def quantize(a: ArrayData, isFloat: Boolean): InternalRow = {
    val n = a.numElements()
    val xs = new Array[Double](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      xs(i) = v
      val av = Math.abs(v)
      // NaN is sticky-greatest, matching array_max's ordering
      if (av > maxAbs || java.lang.Double.isNaN(av)) maxAbs = av
      i += 1
    }
    val s = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (s != 0.0) {
      i = 0
      while (i < n) {
        val g = Math.floor(xs(i) / s + 0.5)
        // (byte) of NaN/Inf is 0 in Java, same as Spark's non-ANSI cast
        q(i) = g.toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](s,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(q)))
  }
}
