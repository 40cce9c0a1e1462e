package graft.sources

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-side equivalents of the reference's dataset ingestion
  * (`data-raw/datasets.R`): libsvm files → a labelled design-matrix
  * DataFrame with named feature columns, plus the `model.matrix`-style
  * factor expansion the reference applies before fitting. Parquet is the
  * engine's primary format (`graft.util.Tables`); these cover the two
  * text formats the reference's fixtures come from.
  */
object Sources {

  /** Read a libsvm file into (label, features) — Spark's built-in format,
    * sparse-preserving (the features column is a `ml.linalg.Vector`, which
    * `SlopeEstimator` accepts directly without densification).
    */
  def readLibsvm(spark: SparkSession, path: String,
                 numFeatures: Int = -1): DataFrame = {
    val r = spark.read.format("libsvm")
    val r2 = if (numFeatures > 0) r.option("numFeatures", numFeatures.toString) else r
    r2.load(path)
  }

  /** Same, with the vector expanded to NAMED scalar columns (the
    * reference's `colnames(tmp_x) <- c(...)` step — e.g. bodyfat's
    * anatomical names). Dense output: only for fixture-sized tables.
    */
  def readLibsvmNamed(spark: SparkSession, path: String,
                      featureNames: Seq[String],
                      labelName: String = "label"): DataFrame = {
    val raw = readLibsvm(spark, path, featureNames.length)
    val arr = vector_to_array(col("features"))
    raw.select(
      (col("label").as(labelName)) +:
        featureNames.zipWithIndex.map { case (n, i) => arr.getItem(i).as(n) }: _*)
  }

  /** Read a headered CSV with an explicit schema (inference off — schema
    * drift should fail loudly, not silently retype a 100 TB load).
    */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Read JSON-lines (the C4/Pile-style training-data interchange format)
    * with an explicit schema — no inference scan (inference costs a full
    * extra pass over 100 TB and silently retypes on drift). Rows that fail
    * to parse land whole in `_corrupt_record` (PERMISSIVE) instead of
    * killing the load; callers audit `where(col(corruptCol).isNotNull)`
    * and decide (Spark requires a cache/materialization before a
    * corrupt-column-ONLY query on raw JSON — QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    * Line-delimited by default so the read splits by byte range — a single
    * multi-line JSON document array would deserialize on one task.
    */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType,
                    corruptCol: String = "_corrupt_record"): DataFrame = {
    // fail at call time, not with a late duplicate-column AnalysisException
    // (and never conflate a real data field with the quarantine column)
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column — pass a different corruptCol")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Read ORC with an explicit schema pin (same no-inference rationale as
    * [[readJsonLines]]; ORC carries its own schema, so the pin is a
    * CONTRACT — drift between the files and the expected schema fails at
    * analysis instead of silently retyping downstream arithmetic). Spark's
    * native ORC scan pushes predicates and prunes partitions exactly like
    * parquet (asserted in SourcesSpec).
    */
  def readOrc(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** `model.matrix(~ .)`-style treatment coding for one string column:
    * distinct levels sort lexicographically, the FIRST becomes the
    * reference level (dropped), and each remaining level yields a 0/1
    * indicator column `<col>_<level>` (the reference's abalone `sex`
    * handling). Levels are collected once (small by definition — a factor
    * with data-scale cardinality is a modelling error, enforced by
    * `maxLevels`).
    */
  def oneHot(df: DataFrame, column: String, maxLevels: Int = 64): DataFrame = {
    val distinct = df.select(column).distinct()
      .orderBy(column).limit(maxLevels + 1)
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    // NULL is not a level: like R's model.matrix on NA, fail loudly rather
    // than silently coding null rows as the reference category
    require(!distinct.contains(null),
      s"oneHot($column): column contains NULL — impute or drop first")
    val levels = distinct
    require(levels.length <= maxLevels,
      s"oneHot($column): more than $maxLevels levels — not a factor column")
    val indicators = levels.drop(1).map(l =>
      when(col(column) === lit(l), 1.0).otherwise(0.0).as(s"${column}_$l"))
    val keep = df.columns.filterNot(_ == column).map(col)
    df.select(keep ++ indicators: _*)
  }
}
