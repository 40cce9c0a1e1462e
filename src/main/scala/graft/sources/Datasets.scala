package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's five bundled datasets (`R/data.R`, the rda files under
  * `data/`, ingested by `data-raw/datasets.R`), loadable through the engine's own
  * readers so reference examples run verbatim. Each loader returns the
  * exact post-`model.matrix` design the reference ships — same column
  * names, same dummy coding, same response — from text fixtures extracted
  * out of the reference's rda files (tools/make_dataset_fixtures.py).
  *
  * `dir` points at the fixture directory (tests pass
  * src/test/resources/datasets; a deployment would stage the same files
  * on its lake).
  */
object Datasets {

  /** heart (binomial, 270×18 sparse in the reference): label column `y`
    * with the reference's class names, features as named columns.
    */
  val heartFeatures: Seq[String] = Seq(
    "age", "bp", "chol", "hr", "old_peak", "vessels", "sex", "angina",
    "glucose_high", "cp_typical", "cp_atypical", "cp_nonanginal",
    "ecg_abnormal", "ecg_estes", "slope_flat", "slope_downsloping",
    "thal_fixed", "thal_reversible")

  def heart(spark: SparkSession, dir: String): DataFrame =
    Sources.readLibsvmNamed(spark, s"$dir/heart.libsvm", heartFeatures)
      .withColumn("y",
        when(col("label") > 0, "presence").otherwise("absence"))
      .drop("label")

  /** bodyfat (gaussian): Siri-1956 response + 13 anatomical features. */
  val bodyfatFeatures: Seq[String] = Seq(
    "age", "weight", "height", "neck", "chest", "abdomen", "hip", "thigh",
    "knee", "ankle", "biceps", "foream", "wrist")

  def bodyfat(spark: SparkSession, dir: String): DataFrame =
    Sources.readCsv(spark, s"$dir/bodyfat.csv", StructType(
      StructField("siri", DoubleType) +:
        bodyfatFeatures.map(f => StructField(f, DoubleType))))

  /** abalone (poisson): ring-count response + dummy-coded sex. */
  val abaloneFeatures: Seq[String] = Seq(
    "sex", "infant", "length", "diameter", "height", "weight_whole",
    "weight_shucked", "weight_viscera", "weight_shell")

  def abalone(spark: SparkSession, dir: String): DataFrame =
    Sources.readCsv(spark, s"$dir/abalone.csv", StructType(
      StructField("rings", DoubleType) +:
        abaloneFeatures.map(f => StructField(f, DoubleType))))

  /** wine (multinomial, 3 classes A/B/C). */
  val wineFeatures: Seq[String] = Seq(
    "alcohol", "malic", "ash", "alcalinity", "magnesium", "phenols",
    "flavanoids", "nonflavanoids", "proanthocyanins", "color", "hue",
    "dilution", "proline")

  def wine(spark: SparkSession, dir: String): DataFrame =
    Sources.readCsv(spark, s"$dir/wine.csv", StructType(
      StructField("class", StringType) +:
        wineFeatures.map(f => StructField(f, DoubleType))))

  /** student (two gaussian targets: math and portugese final grades). */
  val studentFeatures: Seq[String] = Seq(
    "school_ms", "sex", "age", "urban", "large_family", "cohabitation",
    "Medu", "Fedu", "Mjob_health", "Mjob_other", "Mjob_services",
    "Mjob_teacher", "Fjob_health", "Fjob_other", "Fjob_services",
    "Fjob_teacher", "reason_home", "reason_other", "reason_rep", "nusery",
    "internet")

  def student(spark: SparkSession, dir: String): DataFrame =
    Sources.readCsv(spark, s"$dir/student.csv", StructType(
      Seq(StructField("math", DoubleType), StructField("portugese", DoubleType)) ++
        studentFeatures.map(f => StructField(f, DoubleType))))
}
