package graft.fit

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.slope._

/** M15 rendering: the SVG writer is pinned byte-for-byte by a golden file
  * over FIXED plot rows (renderer determinism), plus smoke renders from a
  * real seeded fit (end-to-end shape). Regenerate goldens with
  * `REGEN_GOLDEN=1 sbt "testOnly graft.fit.SlopePlotsSpec"` after an
  * intentional renderer change.
  */
class SlopePlotsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("graft-plots-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def checkGolden(name: String, got: String): Unit = {
    val p = goldenDir.resolve(name)
    if (sys.env.contains("REGEN_GOLDEN")) {
      Files.createDirectories(goldenDir)
      Files.writeString(p, got)
    }
    assert(Files.exists(p), s"golden file $p missing — run with REGEN_GOLDEN=1")
    assert(Files.readString(p) == got, s"$name drifted from its golden file")
  }

  test("path SVG is byte-stable over fixed rows (golden)") {
    val sp = spark; import sp.implicits._
    val path = Seq(
      (0, 1.0, "intercept", 0, 5.0, 0.0),
      (0, 1.0, "f0", 0, 0.0, 0.0),
      (0, 1.0, "f1", 0, 0.0, 0.0),
      (1, 0.1, "intercept", 0, 5.1, 0.3),
      (1, 0.1, "f0", 0, 1.2, 0.3),
      (1, 0.1, "f1", 0, -0.4, 0.3),
      (2, 0.01, "intercept", 0, 5.2, 0.6),
      (2, 0.01, "f0", 0, 2.5, 0.6),
      (2, 0.01, "f1", 0, -1.1, 0.6))
      .toDF("step", "sigma", "feature", "target", "beta", "deviance_ratio")
    val svg = SlopePlots.pathSvg(path)
    assert(svg.contains("<polyline") && svg.contains("Coefficient path"))
    assert(!svg.contains("intercept"), "intercept is skipped like the reference default")
    checkGolden("path_plot.svg", svg)
  }

  test("CV SVG draws a CI band per series (golden)") {
    val sp = spark; import sp.implicits._
    val cv = Seq(
      (0.2, 0, 1.0, "mse", 10.0, 1.0, 8.0, 12.0),
      (0.2, 1, 0.1, "mse", 7.0, 0.8, 5.4, 8.6),
      (0.2, 2, 0.01, "mse", 8.5, 1.2, 6.1, 10.9))
      .toDF("q", "sigma_index", "sigma", "measure", "mean", "se", "lo", "hi")
    val svg = SlopePlots.cvSvg(cv)
    assert(svg.contains("<polygon"), "CI band missing")
    checkGolden("cv_plot.svg", svg)
  }

  test("diagnostics SVG renders primal and dual traces (golden)") {
    val sp = spark; import sp.implicits._
    val diag = Seq(
      (0, 1.0, 0, 0.0, 100.0, 60.0),
      (0, 1.0, 1, 0.1, 80.0, 70.0),
      (0, 1.0, 2, 0.2, 75.0, 74.0),
      (1, 0.1, 0, 0.0, 50.0, 20.0))
      .toDF("step", "sigma", "iteration", "time", "primal", "dual")
    val svg = SlopePlots.diagnosticsSvg(diag, step = 0)
    assert(svg.contains("primal") && svg.contains("dual"))
    checkGolden("diagnostics_plot.svg", svg)
  }

  test("end-to-end: a seeded fit renders all three plots") {
    val sp = spark; import sp.implicits._
    val prob = RandomProblem(n = 120, p = 3, family = Gaussian, seed = 7L)
    val data = (0 until 120).map(i =>
      (i.toLong, prob.y(i, 0), prob.x(i, 0), prob.x(i, 1), prob.x(i, 2)))
      .toDF("id", "label", "f0", "f1", "f2")
    val feats = Seq("f0", "f1", "f2")
    val model = SlopeEstimator.fit(data, feats, "label",
      SlopeConfig(nSigma = 5, diagnostics = true))
    val pathSvg = SlopePlots.pathSvg(model.pathDf(spark))
    // one polyline per feature (+ legend entries)
    assert(feats.forall(pathSvg.contains))
    val diagSvg = SlopePlots.diagnosticsSvg(model.diagnosticsDf(spark))
    assert(diagSvg.contains("Solver trace"))
    val trained = TrainSlope.train(data, feats, "label", "id",
      qs = Seq(0.2), number = 3, cfg = SlopeConfig(nSigma = 4))
    val cvSvg = SlopePlots.cvSvg(TrainSlope.summaryDf(spark, trained))
    assert(cvSvg.contains("mse q=0.2") && cvSvg.contains("<polygon"))
  }
}
