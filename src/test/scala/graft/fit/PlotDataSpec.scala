package graft.fit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.slope._

/** M15 "data-complete": one long-format DataFrame per reference plot —
  * coefficient path vs σ (plot.Owl, R/plot.R:19-109), CV mean ± CI
  * (plot.TrainedOwl, R/plot.R:144-299), primal/dual solver trace
  * (plotDiagnostics, R/plotDiagnostics.R:22-73). Rendering is out of scope
  * by SURVEY decision; these schemas are the contract any plotting layer
  * builds on, so they are pinned here field by field.
  */
class PlotDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-plotdata-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("path, CV and diagnostics plot-data schemas are pinned") {
    val prob = RandomProblem(n = 120, p = 3, family = Gaussian, seed = 7L)
    val sp = spark; import sp.implicits._
    val data = (0 until 120).map(i =>
      (i.toLong, prob.y(i, 0), prob.x(i, 0), prob.x(i, 1), prob.x(i, 2)))
      .toDF("id", "label", "f0", "f1", "f2")
    val feats = Seq("f0", "f1", "f2")

    // 1. coefficient path vs sigma (plot.Owl)
    val model = SlopeEstimator.fit(data, feats, "label",
      SlopeConfig(nSigma = 5, diagnostics = true))
    val path = model.pathDf(spark)
    assert(fields(path) == Seq(
      "step" -> IntegerType, "sigma" -> DoubleType, "feature" -> StringType,
      "target" -> IntegerType, "beta" -> DoubleType,
      "deviance_ratio" -> DoubleType))
    val nSteps = model.fit.sigma.length
    // long format: every (step, coefficient row, target) is one row
    assert(path.count() == nSteps.toLong * (feats.length + 1))
    assert(path.select("feature").distinct().count() == feats.length + 1)

    // 2. solver primal/dual trace (plotDiagnostics)
    val diag = model.diagnosticsDf(spark)
    assert(fields(diag) == Seq(
      "step" -> IntegerType, "sigma" -> DoubleType, "iteration" -> IntegerType,
      "time" -> DoubleType, "primal" -> DoubleType, "dual" -> DoubleType))
    assert(diag.count() > 0, "diagnostics=true fit must emit traces")

    // 3. CV mean ± CI per (q, sigma, measure) (plot.TrainedOwl)
    val trained = TrainSlope.train(data, feats, "label", "id",
      qs = Seq(0.2), number = 3, cfg = SlopeConfig(nSigma = 4))
    val cv = TrainSlope.summaryDf(spark, trained)
    assert(fields(cv) == Seq(
      "q" -> DoubleType, "sigma_index" -> IntegerType, "sigma" -> DoubleType,
      "measure" -> StringType, "mean" -> DoubleType, "se" -> DoubleType,
      "lo" -> DoubleType, "hi" -> DoubleType))
    assert(cv.count() > 0)
    // the CI band plot needs lo <= mean <= hi on every row
    val bad = cv.filter(org.apache.spark.sql.functions.expr(
      "lo > mean OR mean > hi")).count()
    assert(bad == 0, "confidence band must bracket the mean")
  }
}
