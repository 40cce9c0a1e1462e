package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders for the driver-generated star schema
  * (see TESTDATA.md). All queries read through here so the scan layer is
  * swappable (e.g. for a bucketed or partitioned layout at cluster scale).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is written as parquet TIMESTAMP(NANOS); Spark reads it as a
    // nanosecond long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    // every session builder in this project). Normalize to a microsecond
    // timestamp, matching DuckDB's ts::TIMESTAMP truncation.
    // integral division keeps the computation in long arithmetic — epoch-ns
    // values (~1.7e18) exceed 2^53, so a double-precision divide would be
    // off by 1 µs on a fraction of rows vs DuckDB's exact truncation
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Config required by every SparkSession that reads these tables. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // native expressions (vec_dot) on the SQL surface of every session
    "spark.sql.extensions" -> "graft.GraftExtensions")

  /** Recover scan parallelism lost to coarse parquet row groups.
    *
    * The local test tables are single-row-group files, and a row group is
    * Spark's minimum split unit — so a scan yields 1–3 partitions and every
    * downstream map-side computation (decimal-exact sums, regex explodes,
    * per-row hashing) runs near-serially no matter how many cores exist.
    * Spreading is GATED on the observed partition count: on a real lake a
    * 100 TB table scans as tens of thousands of row-group splits, the gate
    * fails, and no shuffle is added. Locally it costs one small shuffle of
    * the (column-pruned) rows and buys full-core aggregation.
    *
    * The explicit partition count also pins the exchange against AQE
    * coalescing, which would otherwise size the few-MB pre-explode input
    * back down to one partition.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

/** Deterministic-aggregation helpers.
  *
  * Double sums are order-dependent, and Spark's partial aggregation order
  * differs from DuckDB's, so a raw `sum(double)` can differ in the last few
  * ulps between the engine and the oracle. Casting each addend to a fixed
  * decimal makes the sum exact and associative — bit-identical in both
  * engines — and the final decimal→double cast is deterministic too.
  *
  * The DuckDB twin of `dsum(x, 6)` is `(sum(x::DECIMAL(30,6)))::DOUBLE`.
  * The twin of `davg(x, 9)` is
  * `(sum(x::DECIMAL(30,9)))::DOUBLE / count(*)::DOUBLE`.
  */
object Det {
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  def davg(c: Column, scale: Int = 9): Column =
    dsum(c, scale) / count(lit(1)).cast("double")

  /** 60-bit hash shared with DuckDB:
    * Spark  : conv(substring(md5(s),1,15),16,10)::long
    * DuckDB : ('0x' || substr(md5(s),1,15))::BIGINT
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same hash as a SQL fragment for generated oracle SQL. */
  def md5Hash60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"
}
