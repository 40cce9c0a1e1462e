package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle is registered too (hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  /** All operator suites, in SURVEY §2 order. */
  private def suites: Seq[Q] =
    RelationalQueries.queries ++ MlQueries.queries ++ PipelineQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The gaussian SLOPE path fit — the engine's actual reason to exist —
    * read from parquet, standardized, solved distributed, coefficients out.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("m_slope_path_gaussian")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    suites.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
