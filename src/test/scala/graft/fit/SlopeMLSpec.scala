package graft.fit

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.slope._

class SlopeMLSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-ml-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def df(n: Int) = {
    val prob = RandomProblem(n = n, p = 3, family = Gaussian, seed = 42L)
    val sp = spark; import sp.implicits._
    (0 until n).map(i =>
      (prob.y(i, 0), prob.x(i, 0), prob.x(i, 1), prob.x(i, 2)))
      .toDF("label", "f0", "f1", "f2")
  }

  test("SlopeML runs inside an ml.Pipeline after VectorAssembler") {
    val data = df(200)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv"),
      new SlopeML().setFeaturesCol("fv").setLabelCol("label").setNSigma(5)))
    val model = pipe.fit(data)
    val out = model.transform(data)
    val field = out.schema("prediction")
    assert(field.dataType.isInstanceOf[ArrayType] &&
      field.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType])
    val first = out.select("prediction").head().getSeq[scala.collection.Seq[Double]](0)
    assert(first.nonEmpty && first.head.length == 1)

    // path predictions match the plain estimator's transform
    val inner = model.stages(1).asInstanceOf[SlopeMLModel].slopeModel
    val direct = inner.transform(
      new VectorAssembler().setInputCols(Array("f0", "f1", "f2"))
        .setOutputCol("fv").transform(data),
      Seq("fv"), "p2")
    val a = out.select("prediction").collect().map(_.getSeq[scala.collection.Seq[Double]](0))
    val b = direct.select("p2").collect().map(_.getSeq[scala.collection.Seq[Double]](0))
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("flat sigmaIndex column feeds a stock RegressionEvaluator") {
    val data = df(150)
    val assembled = new VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv").transform(data)
    val est = new SlopeML().setFeaturesCol("fv").setLabelCol("label").setNSigma(4)
    val m = est.fit(assembled)
    val nSteps = m.slopeModel.fit.sigma.length
    m.setSigmaIndex(nSteps - 1) // least-penalized step
    val out = m.transform(assembled)
    assert(out.schema("prediction").dataType == DoubleType)
    val rmse = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction").setMetricName("rmse").evaluate(out)
    assert(rmse.isFinite && rmse >= 0.0)
    // least-penalized fit should beat predicting the mean on signal data
    val sd = data.agg(org.apache.spark.sql.functions.stddev_pop(
      org.apache.spark.sql.functions.col("label"))).head().getDouble(0)
    assert(rmse < sd)
  }

  test("varImp surfaces per-feature |beta| through a stock ml.Pipeline (caret hook)") {
    val data = df(200)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv"),
      new SlopeML().setFeaturesCol("fv").setLabelCol("label").setNSigma(5)))
    val fitted = pipe.fit(data)
    val m = fitted.stages(1).asInstanceOf[SlopeMLModel]

    // unset sigmaIndex must fail like the reference's missing-sigma error
    intercept[IllegalArgumentException] { m.varImp() }

    val lastStep = m.slopeModel.fit.sigma.length - 1
    m.setSigmaIndex(lastStep)
    val imp = m.varImp().collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(imp.keySet == Set(0, 1, 2)) // intercept excluded, one row per feature
    val beta = m.slopeModel.coef()(lastStep)
    (0 until 3).foreach { j =>
      assert(imp(j) == math.abs(beta(j + 1, 0)), s"feature $j importance")
    }
    assert(imp.values.forall(v => v >= 0.0 && v.isFinite))

    // explicit sigma interpolates between path steps (reference coef(sigma=))
    val sig = m.slopeModel.fit.sigma
    val mid = (sig(lastStep - 1) + sig(lastStep)) / 2.0
    val impMid = m.varImp(Some(mid)).collect().map(_.getDouble(1))
    assert(impMid.length == 3 && impMid.forall(_.isFinite))
  }

  test("multinomial flat response keeps the full per-class probability array") {
    val prob = RandomProblem(n = 120, p = 3, family = Gaussian, seed = 5L)
    val sp = spark; import sp.implicits._
    val data = (0 until 120).map { i =>
      val lbl = if (prob.x(i, 0) > 0) "a" else if (prob.x(i, 1) > 0) "b" else "c"
      (lbl, prob.x(i, 0), prob.x(i, 1), prob.x(i, 2))
    }.toDF("label", "f0", "f1", "f2")
    val assembled = new VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv").transform(data)
    val m = new SlopeML().setFeaturesCol("fv").setLabelCol("label")
      .setFamily("multinomial").setNSigma(3).setPredictType("response")
      .fit(assembled)
    m.setSigmaIndex(0)
    val out = m.transform(assembled)
    assert(out.schema("prediction").dataType.isInstanceOf[ArrayType])
    val probs = out.select("prediction").head().getSeq[Double](0)
    assert(probs.length == 3) // all classes, not just the first
    assert(math.abs(probs.sum - 1.0) < 1e-9)
  }

  test("PipelineModel save/load round-trips through the stock ml persistence") {
    val data = df(150)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv"),
      new SlopeML().setFeaturesCol("fv").setLabelCol("label").setNSigma(4)
        .setScale("sd")))
    val fitted = pipe.fit(data)
    fitted.stages(1).asInstanceOf[SlopeMLModel]
      .setSigmaIndex(2).setPredictionCol("pred2")
    val dir = java.nio.file.Files.createTempDirectory("slopeml-io").toString
    val path = s"$dir/pm"
    fitted.write.overwrite().save(path)

    val loaded = org.apache.spark.ml.PipelineModel.load(path)
    val lm = loaded.stages(1).asInstanceOf[SlopeMLModel]
    // params round-trip, including post-fit setters
    assert(lm.getOrDefault(lm.sigmaIndex) == 2)
    assert(lm.getOrDefault(lm.predictionCol) == "pred2")
    assert(lm.getOrDefault(lm.scale) == "sd")
    // predictions are identical to the original model's
    val a = fitted.transform(data).select("pred2").collect().map(_.getDouble(0))
    val b = loaded.transform(data).select("pred2").collect().map(_.getDouble(0))
    a.zip(b).foreach { case (x, y) => assert(x == y) }

    // the unfitted Pipeline (params-only stages) round-trips too
    pipe.write.overwrite().save(s"$dir/pipe")
    val p2 = Pipeline.load(s"$dir/pipe")
    assert(p2.getStages(1).asInstanceOf[SlopeML].getOrDefault(
      p2.getStages(1).asInstanceOf[SlopeML].scale) == "sd")
  }

  test("binomial class predictions surface class names") {
    val prob = RandomProblem(n = 160, p = 3, family = Binomial, seed = 11L)
    val sp = spark; import sp.implicits._
    val data = (0 until 160).map(i =>
      (if (prob.y(i, 0) > 0) "yes" else "no",
        prob.x(i, 0), prob.x(i, 1), prob.x(i, 2)))
      .toDF("label", "f0", "f1", "f2")
    val assembled = new VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2")).setOutputCol("fv").transform(data)
    val m = new SlopeML().setFeaturesCol("fv").setLabelCol("label")
      .setFamily("binomial").setNSigma(3).setPredictType("class")
      .fit(assembled)
    m.setSigmaIndex(m.slopeModel.fit.sigma.length - 1)
    val preds = m.transform(assembled).select("prediction")
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("yes", "no")))
  }
}
