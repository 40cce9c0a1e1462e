package graft.fit

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.slope._

class TrainSlopeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-train-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def gaussianDf(n: Int) = {
    val prob = RandomProblem(n = n, p = 4, family = Gaussian, seed = 123L)
    val sp = spark; import sp.implicits._
    (0 until n).map { i =>
      (i.toLong, prob.y(i, 0), prob.x(i, 0), prob.x(i, 1), prob.x(i, 2), prob.x(i, 3))
    }.toDF("id", "label", "f0", "f1", "f2", "f3")
  }

  test("CV: summary shape, finite stats, deterministic folds, optima present") {
    val df = gaussianDf(120)
    val cfg = SlopeConfig(nSigma = 6)
    val t = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.1, 0.3), number = 3, repeats = 1, cfg = cfg)

    val nSigma = t.model.fit.sigma.length
    // 2 measures × 2 q × nSigma summary rows
    assert(t.summary.length == 2 * 2 * nSigma)
    assert(t.summary.forall(r => !r._5.isNaN && r._6 >= 0.0 && r._7 <= r._8))
    assert(t.optima.contains("mse") && t.optima.contains("mae"))
    // mse optimum should not be the most-penalized (first) sigma on signal data
    val (qBest, sigmaBest, best) = t.optima("mse")
    assert(best < t.summary.filter(r => r._4 == "mse" && r._2 == 0).map(_._5).min + 1e-9)

    // determinism: same call → same folds and same stats (up to the
    // last-ulp noise of distributed double aggregation combine order)
    val t2 = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.1, 0.3), number = 3, repeats = 1, cfg = cfg)
    assert(t.summary.length == t2.summary.length)
    t.summary.zip(t2.summary).foreach { case (a, b) =>
      assert((a._1, a._2, a._4) == (b._1, b._2, b._4))
      // sigma and stats agree up to the last-ulp noise of the distributed
      // standardization pass (combine order varies run to run)
      assert(math.abs(a._3 - b._3) <= 1e-9 * math.max(1.0, math.abs(b._3)))
      assert(math.abs(a._5 - b._5) <= 1e-9 * math.max(1.0, math.abs(b._5)))
    }
  }

  test("CV raw grid covers q × fold × rep × sigma × measure") {
    val df = gaussianDf(90)
    val t = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3, repeats = 2, measures = Seq("mse"),
      cfg = SlopeConfig(nSigma = 4))
    val nSigma = t.model.fit.sigma.length
    assert(t.raw.length == 1 * 3 * 2 * nSigma)
    assert(t.raw.map(c => (c.fold, c.rep)).distinct.length == 6)
  }

  test("local CV substrate matches the distributed path (gaussian)") {
    val df = gaussianDf(150)
    val cfg = SlopeConfig(nSigma = 5)
    val loc = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3, cfg = cfg)
    val dist = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3, cfg = cfg.copy(localFitThreshold = 0L))
    assert(loc.summary.length == dist.summary.length)
    loc.summary.zip(dist.summary).foreach { case (a, b) =>
      assert((a._1, a._2, a._4) == (b._1, b._2, b._4))
      assert(math.abs(a._3 - b._3) <= 1e-8 * math.max(1.0, math.abs(b._3)), s"sigma: $a vs $b")
      assert(math.abs(a._5 - b._5) <= 1e-6 * math.max(1.0, math.abs(b._5)), s"mean: $a vs $b")
    }
  }

  test("local CV substrate matches the distributed path (binomial, all measures)") {
    val prob = RandomProblem(n = 140, p = 3, family = Binomial, seed = 7L)
    val sp = spark; import sp.implicits._
    val df = (0 until 140).map { i =>
      (i.toLong, if (prob.y(i, 0) > 0) "pos" else "neg",
        prob.x(i, 0), prob.x(i, 1), prob.x(i, 2))
    }.toDF("id", "label", "f0", "f1", "f2")
    val cfg = SlopeConfig(family = "binomial", nSigma = 4)
    val meas = Seq("mse", "mae", "deviance", "misclass", "auc")
    val loc = TrainSlope.train(df, Seq("f0", "f1", "f2"), "label", "id",
      qs = Seq(0.2), number = 3, measures = meas, cfg = cfg)
    val dist = TrainSlope.train(df, Seq("f0", "f1", "f2"), "label", "id",
      qs = Seq(0.2), number = 3, measures = meas,
      cfg = cfg.copy(localFitThreshold = 0L))
    assert(loc.summary.length == dist.summary.length)
    loc.summary.zip(dist.summary).foreach { case (a, b) =>
      assert((a._1, a._2, a._4) == (b._1, b._2, b._4))
      assert(math.abs(a._5 - b._5) <= 1e-6 * math.max(1.0, math.abs(b._5)),
        s"measure ${a._4}: $a vs $b")
    }
  }

  test("kktExport threads through CV: every cell fit certifies; off leaves cellFits empty") {
    val df = gaussianDf(120)
    // maxGramCols=0 forces FISTA: its exit criterion bounds the dual
    // infeasibility the certificate re-checks (ADMM's residual stopping
    // rule does not — a fold's exit at the full-grid's smallest σ can sit
    // above the certificate threshold without being wrong)
    val t = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3,
      cfg = SlopeConfig(nSigma = 4, kktExport = true, maxGramCols = 0))
    // one retained fit per (rep, fold, q) cell, plus the full fit's state
    assert(t.cellFits.length == 3, s"expected 3 cell fits, got ${t.cellFits.length}")
    assert(t.cellFits.map(_._1).distinct.length == 3)
    assert(t.model.fit.kktState.nonEmpty, "full-data refit must export KKT state")
    val tolCert = 3.0 * SolverConfig().tolInfeas
    (("full", t.model.fit) +: t.cellFits.map { case ((_, f0, _), f) => (s"fold$f0", f) })
      .foreach { case (cell, f) =>
        assert(f.kktState.nonEmpty, s"$cell: no KKT state")
        KktCertificate.verdictDf(spark, f, tolCert).collect().foreach { r =>
          assert(r.getBoolean(1) && r.getBoolean(2),
            s"$cell step ${r.getInt(0)} failed its certificate")
        }
      }
    // distributed substrate threads it too
    val dist = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3,
      cfg = SlopeConfig(nSigma = 4, kktExport = true, maxGramCols = 0,
        localFitThreshold = 0L))
    assert(dist.cellFits.length == 3 && dist.model.fit.kktState.nonEmpty)
    // default: no retained state
    val off = TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
      qs = Seq(0.2), number = 3, cfg = SlopeConfig(nSigma = 4))
    assert(off.cellFits.isEmpty && off.model.fit.kktState.isEmpty)
    // M14 summary surfaces the per-step exit kind; a healthy fit has none
    val sm = t.model.summary(spark)
    assert(sm.columns.contains("stalled"))
    assert(sm.filter(org.apache.spark.sql.functions.col("stalled")).count() == 0)
  }

  test("CV fails loudly when a fold has no test rows") {
    val df = gaussianDf(20)
    val e = intercept[IllegalArgumentException] {
      TrainSlope.train(df, Seq("f0", "f1", "f2", "f3"), "label", "id",
        qs = Seq(0.2), number = 40, cfg = SlopeConfig(nSigma = 2))
    }
    assert(e.getMessage.contains("no test rows"))
  }

  test("diagnostics traces are collected when enabled") {
    val prob = RandomProblem(n = 60, p = 3, family = Binomial, seed = 9L)
    val (xs, ctr, scl) = RandomProblem.standardizeLocal(prob.x, intercept = true,
      center = true, scale = "l2")
    val ops = new LocalOps(xs, prob.y, Binomial, true)
    val fit = SlopePath.fit(ops,
      SlopeConfig(family = "binomial", nSigma = 4, diagnostics = true),
      ctr, scl, Array(0.0), Array(1.0))
    assert(fit.diagnostics.nonEmpty)
    assert(fit.diagnostics.exists(_._1.nonEmpty)) // at least one primal trace
    val model = new SlopeModel(fit, Array("a", "b", "c"), Array("x", "y"))
    val df = model.diagnosticsDf(spark)
    assert(df.columns.sameElements(
      Array("step", "sigma", "iteration", "time", "primal", "dual")))
    assert(df.count() > 0)
  }
}
