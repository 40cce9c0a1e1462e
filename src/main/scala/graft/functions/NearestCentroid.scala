package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid id against a LITERAL centroid matrix in ONE expression.
  *
  * The IVF coarse assignment (`Similarity.ivfAssign`, `ivfPqTopK`) was a
  * `least(...)` chain over k per-centroid `struct(score, cid)` branches —
  * each branch its own `VecCosine`/`VecDot` fold against a `typedlit`
  * array. Correct and codegen'd, but the GENERATED CODE grows O(k·d):
  * fine at the registered k = 16, hopeless at the k ≈ √N list counts a
  * 100 TB inverted-file index wants (k = 1024 would emit ~65k-term
  * methods past the JIT/64KB limits). This expression keeps the same
  * arithmetic — per-centroid scores accumulate in element order with the
  * exact double math of the fold expressions it replaces, then an
  * argbest loop with ties to the LOWEST cid — but the centroid matrix
  * rides along as a codegen reference object (`double[][]`, the same
  * mechanism as a broadcast hash relation), so the generated code is a
  * constant-size nested loop whatever k is.
  *
  * Score semantics, pinned bit-for-bit to the `least`-chain forms by
  * `NearestCentroidSpec`:
  *   - cosine (`useL2 = false`): `ab / (sqrt(aa)·sqrt(bb))` per
  *     [[VecCosine]]; best = MAX score via strict `>` over ascending cid
  *     (ties and NaN scores lose — matching SQL's NaN-sorts-last in the
  *     `least(struct(-cos, cid))` form).
  *   - squared L2 (`useL2 = true`): `(aa − 2·ab) + bb` in exactly the
  *     association order of the `dot(x,x) − 2·dot(x,c) + dot(c,c)`
  *     column form; best = MIN score via strict `<`.
  *   - `roundDigits >= 0` rounds the score before comparison with the
  *     exact arithmetic of SQL `round(x, d)` on DOUBLE (BigDecimal
  *     HALF_UP; NaN/±Inf pass through) — the `semanticDedup` assignment
  *     compares `-round(cos, 9)` structs, and near-ties that round
  *     EQUAL must resolve to the lowest cid exactly as `least` does.
  * NULL input, a NULL element, or a row/centroid width mismatch → NULL
  * (the fold expressions' contract).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]],
                           useL2: Boolean, roundDigits: Int = -1)
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCentroid: empty centroid matrix")
  require(centroids.forall(_.length == centroids.head.length),
    "NearestCentroid: ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ShortType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of numeric elements, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // width mismatch → NULL

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  private def getter: (ArrayData, Int) => Double = elemType match {
    case DoubleType  => (a, i) => a.getDouble(i)
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case ShortType   => (a, i) => a.getShort(i).toDouble
    case ByteType    => (a, i) => a.getByte(i).toDouble
    case dt => throw new IllegalStateException(s"unreachable: $dt passed type check")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = centroids.head.length
    if (arr.numElements() != d) return null
    val get = getter
    var best = 0
    var bestScore = if (useL2) Double.PositiveInfinity else Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i)) return null
        val x = get(arr, i); val y = cv(i)
        ab += x * y; aa += x * x; bb += y * y
        i += 1
      }
      val raw =
        if (useL2) (aa - 2.0 * ab) + bb
        else ab / (math.sqrt(aa) * math.sqrt(bb))
      val score = NearestCentroid.roundScore(raw, roundDigits)
      if (if (useL2) score < bestScore else score > bestScore) {
        bestScore = score; best = c
      }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val getX = CodeGenerator.getValue(arr, elemType, i)
      val containsNull = child.dataType.asInstanceOf[ArrayType].containsNull
      val elemNullCheck =
        if (containsNull)
          s"if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val rawExpr =
        if (useL2) s"($aa - 2.0 * $ab) + $bb"
        else s"$ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb))"
      val scoreExpr =
        if (roundDigits < 0) rawExpr
        else s"graft.functions.NearestCentroid.roundScore($rawExpr, $roundDigits)"
      val better = if (useL2) s"$score < $bestScore" else s"$score > $bestScore"
      val init =
        if (useL2) "java.lang.Double.POSITIVE_INFINITY"
        else "java.lang.Double.NEGATIVE_INFINITY"
      s"""
         |int $d = $ref[0].length;
         |if ($arr.numElements() != $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestScore = $init;
         |  for (int $c = 0; $c < $ref.length && !${ev.isNull}; $c++) {
         |    double[] $cv = $ref[$c];
         |    double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $elemNullCheck
         |      double $x = (double)($getX);
         |      $ab += $x * $cv[$i]; $aa += $x * $x; $bb += $cv[$i] * $cv[$i];
         |    }
         |    double $score = $scoreExpr;
         |    if ($better) { $bestScore = $score; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "nearest_centroid"

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** SQL `round(x, digits)` on DOUBLE, exactly (Spark and DuckDB agree):
    * decimal HALF_UP via the shortest-decimal BigDecimal; NaN and ±Inf
    * pass through (BigDecimal can't represent them — and SQL round
    * returns them unchanged). Called from generated code via the static
    * forwarder, so it must stay a plain public method.
    */
  def roundScore(x: Double, digits: Int): Double =
    if (digits < 0 || x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(digits, java.math.RoundingMode.HALF_UP).doubleValue()

  /** cid of the max-cosine centroid for a numeric-array column (ties and
    * NaN cosines to the lowest cid).
    */
  def byCosine(v: Column, centroids: Array[Array[Long]]): Column =
    GraftSql.column(NearestCentroid(
      GraftSql.expression(v), centroids.map(_.map(_.toDouble)), useL2 = false))

  /** cid of the max-`round(cosine, digits)` centroid over REAL-valued
    * centroids — the [[graft.pipeline.Similarity.semanticDedup]]
    * assignment form, where scores are rounded before comparison so an
    * oracle recomputing them reproduces the argmax bit-for-bit, and
    * round-equal near-ties go to the lowest cid.
    */
  def byCosineRounded(v: Column, centroids: Array[Array[Double]],
                      digits: Int): Column =
    GraftSql.column(NearestCentroid(
      GraftSql.expression(v), centroids, useL2 = false, roundDigits = digits))

  /** cid of the min-squared-L2 centroid (ties and NaN distances to the
    * lowest cid).
    */
  def byL2(v: Column, centroids: Array[Array[Long]]): Column =
    GraftSql.column(NearestCentroid(
      GraftSql.expression(v), centroids.map(_.map(_.toDouble)), useL2 = true))
}
