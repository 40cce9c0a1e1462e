package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Incremental (cross-batch) processing: decide which incoming rows were
  * already seen in a previous snapshot WITHOUT joining the full incoming
  * batch against the full history.
  *
  * The 100 TB shape: (1) one map-side pass over history builds a Bloom
  * filter of seen keys (Spark's own `BloomFilterAggregate` — the same
  * sketch runtime row-level filtering injects, here surfaced as a library
  * operator); (2) the incoming batch is prefiltered by `might_contain`, a
  * codegen'd scalar against the broadcast sketch — misses are DEFINITELY
  * new (no false negatives) and never shuffle; (3) only the bloom hits —
  * |actual dups| + fpp·|incoming| keys — are verified with an exact semi
  * join against history, so the final verdict carries no false positives
  * and is independent of the sketch's size/seed. History is scanned, never
  * shuffled by incoming's key distribution.
  */
object Incremental {

  /** Bloom-filter aggregate over xxhash64 of the key (binary result). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    GraftSql.column(new BloomFilterAggregate(
      GraftSql.expression(xxhash64(key)), expectedItems).toAggregateExpression())

  /** Collect the sketch to the driver (one small binary; it rides to
    * executors as a literal in the reading plan's codegen).
    */
  def buildBloom(seen: DataFrame, key: Column, expectedItems: Long): Array[Byte] =
    seen.select(bloomAgg(key, expectedItems).as("bf")).head.getAs[Array[Byte]](0)

  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(false) // empty history: everything is new
    else GraftSql.column(BloomFilterMightContain(
      Literal(bloom), GraftSql.expression(xxhash64(key))))

  /** `incoming` with an exact `is_new` flag: false iff `keyCol` appears in
    * `seen`. dupKeys (bloom hits ∩ seen) is the only joined set — small,
    * so AQE broadcasts both joins; nothing fact-sized shuffles.
    */
  def tagNew(incoming: DataFrame, seen: DataFrame, keyCol: Column,
      expectedItems: Long): DataFrame = {
    val bloom = buildBloom(seen, keyCol, expectedItems)
    val hitKeys = incoming.filter(mightContain(bloom, keyCol))
      .select(keyCol.as("_k")).distinct()
    val dupKeys = seen.select(keyCol.as("_k")).distinct()
      .join(hitKeys, Seq("_k"), "left_semi")
      .withColumn("_dup", lit(1))
    incoming.withColumn("_k", keyCol)
      .join(dupKeys, Seq("_k"), "left_outer")
      .withColumn("is_new", col("_dup").isNull)
      .drop("_k", "_dup")
  }
}
