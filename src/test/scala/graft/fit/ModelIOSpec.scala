package graft.fit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.slope._

class ModelIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("graft-io-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def binomialModel(): SlopeModel = {
    val prob = RandomProblem(n = 100, p = 3, family = Binomial, seed = 5L)
    val sp = spark; import sp.implicits._
    val df = (0 until 100).map(i =>
      (prob.rawLabels(i), prob.x(i, 0), prob.x(i, 1), prob.x(i, 2)))
      .toDF("label", "f0", "f1", "f2")
    SlopeEstimator.fit(df, Seq("f0", "f1", "f2"), "label",
      SlopeConfig(family = "binomial", nSigma = 5))
  }

  test("save/load round-trips coefficients, path metadata, names, predictions") {
    val model = binomialModel()
    val path = java.nio.file.Files.createTempDirectory("slope-model").toString
    ModelIO.save(spark, model, path)
    val loaded = ModelIO.load(spark, path)

    assert(loaded.fit.family == "binomial")
    assert(loaded.fit.intercept == model.fit.intercept)
    assert(loaded.fit.sigma.sameElements(model.fit.sigma))
    assert(loaded.fit.lambda.sameElements(model.fit.lambda))
    assert(loaded.featureNames.sameElements(model.featureNames))
    assert(loaded.classNames.sameElements(model.classNames))
    assert(loaded.fit.betas.length == model.fit.betas.length)
    for (k <- model.fit.betas.indices; i <- 0 until model.fit.betas(k).rows)
      assert(loaded.fit.betas(k)(i, 0) == model.fit.betas(k)(i, 0))

    // loaded model predicts identically
    val sp = spark; import sp.implicits._
    val testDf = Seq((0.5, -0.2, 1.0)).toDF("f0", "f1", "f2")
    val p1 = model.transform(testDf, Seq("f0", "f1", "f2"), predictType = "response")
      .select("pred").head().getSeq[Seq[Double]](0)
    val p2 = loaded.transform(testDf, Seq("f0", "f1", "f2"), predictType = "response")
      .select("pred").head().getSeq[Seq[Double]](0)
    assert(p1 == p2)
  }

  test("input assertions reject bad configurations (reference test-assertions.R)") {
    val sp = spark; import sp.implicits._
    val df = Seq((1.0, 2.0), (2.0, 3.0), (0.0, 1.0)).toDF("label", "f0")

    intercept[IllegalArgumentException] {
      SlopeEstimator.fit(df, Seq.empty, "label", SlopeConfig())
    }
    intercept[IllegalArgumentException] {
      SlopeEstimator.fit(df, Seq("nope"), "label", SlopeConfig())
    }
    intercept[IllegalArgumentException] { // increasing user lambda
      SlopeEstimator.fit(df, Seq("f0"), "label",
        SlopeConfig(lambdaType = "user", userLambda = Array(1.0, 2.0)))
    }
    intercept[IllegalArgumentException] { // negative lambda
      SlopeEstimator.fit(df, Seq("f0"), "label",
        SlopeConfig(lambdaType = "user", userLambda = Array(-1.0)))
    }
    intercept[IllegalArgumentException] { // negative sigma
      SlopeEstimator.fit(df, Seq("f0"), "label", SlopeConfig(sigma = Array(-0.5)))
    }
    // wrong user-lambda length surfaces from the path driver
    intercept[IllegalArgumentException] {
      SlopeEstimator.fit(df, Seq("f0"), "label",
        SlopeConfig(lambdaType = "user", userLambda = Array(2.0, 1.0)))
    }
    // negative poisson response
    val dfNeg = Seq((-1.0, 2.0), (2.0, 3.0)).toDF("label", "f0")
    intercept[Exception] {
      SlopeEstimator.fit(dfNeg, Seq("f0"), "label", SlopeConfig(family = "poisson"))
    }
    // null labels rejected
    val dfNull = Seq((Some(1.0), 2.0), (None, 3.0), (Some(0.0), 1.0))
      .toDF("label", "f0")
    intercept[Exception] {
      SlopeEstimator.fit(dfNull, Seq("f0"), "label", SlopeConfig())
    }
  }
}
