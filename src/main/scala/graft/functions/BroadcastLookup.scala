package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(1)/O(log n) driver-literal lookups for the streaming filter twins.
  *
  * The broadcast-literal stream forms (`Decontaminate.contaminatedFlag`,
  * `TextPipeline.corpusFreqProfileBroadcast` / `bigramLmProfileBroadcast`)
  * previously held their eval-gram sets and count tables as `typedlit` maps
  * and probed them with `element_at` — but Catalyst's `GetMapValue` over an
  * `ArrayBasedMapData` literal is a LINEAR key scan, so each per-gram /
  * per-token probe cost O(|map|). At the advertised caps (2²² grams, 2²⁰
  * vocab entries) that made the "firehose filter" shape
  * O(grams-per-doc × map-size) per row — correct, but orders of magnitude
  * off the broadcast-hash-join plan it replaces. These expressions restore
  * the hash-join lookup cost: a sorted `long[]` + binary search for gram
  * sets, a `java.util.HashMap` probe for token→count tables, both shipped
  * once per task via the codegen reference-object mechanism (the same way
  * Spark ships a broadcast hash relation) and evaluated inside whole-stage
  * codegen.
  */
case class LongSetContains(child: Expression, set: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(set, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longSet", set, "long[]")
    defineCodeGen(ctx, ev, c => s"java.util.Arrays.binarySearch($ref, $c) >= 0")
  }

  override def prettyName: String = "long_set_contains"

  override protected def withNewChildInternal(newChild: Expression): LongSetContains =
    copy(child = newChild)
}

case class Utf8MapGetLong(child: Expression,
                          map: java.util.HashMap[UTF8String, java.lang.Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    map.get(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lookupMap", map, classOf[java.util.HashMap[_, _]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_v = (java.lang.Long) $ref.get($c);
      if (${ev.value}_v == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_v.longValue();
      }
    """)
  }

  override def prettyName: String = "utf8_map_get_long"

  override protected def withNewChildInternal(newChild: Expression): Utf8MapGetLong =
    copy(child = newChild)
}

object BroadcastLookup {

  /** TRUE iff the bigint column's value is in `keys` — sorted-array binary
    * search per probe, not a literal-map scan.
    */
  def inLongSet(c: Column, keys: Iterable[Long]): Column = {
    val arr = keys.toArray
    java.util.Arrays.sort(arr)
    GraftSql.column(LongSetContains(GraftSql.expression(c), arr))
  }

  /** `m(key)` for a string column against a driver-held count table — an
    * O(1) hash probe returning NULL on miss (the `element_at` contract).
    */
  def mapGetLong(c: Column, m: Map[String, Long]): Column = {
    val hm = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, (m.size / 0.75).toInt + 1))
    m.foreach { case (k, v) => hm.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)) }
    GraftSql.column(Utf8MapGetLong(GraftSql.expression(c), hm))
  }
}
