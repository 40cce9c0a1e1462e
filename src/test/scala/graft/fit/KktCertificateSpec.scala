package graft.fit

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The per-step SLOPE optimality certificate (reference
  * src/infeasibility.h:8-12 + src/kktCheck.h:8-37): fitted paths must
  * certify at every kept step, the window-SQL verifier must agree with the
  * driver-side infeasibility computation, and — the part that makes the
  * certificate worth anything — a corrupted state must FAIL it.
  */
class KktCertificateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic ~gaussian-ish regression frame: modular-arithmetic
    * features, y a noisy-looking but exact linear combination.
    */
  private def frame(n: Int) = {
    val x1 = pmod(col("id") * 7, lit(13)).cast("double")
    val x2 = pmod(col("id") * 11, lit(5)).cast("double")
    val x3 = pmod(col("id") * 3, lit(17)).cast("double")
    val y = lit(2.0) * x1 - lit(3.0) * x2 + lit(0.5) * x3 +
      (pmod(col("id") * 31, lit(101)) - 50).cast("double") * lit(0.1)
    spark.range(n).select(x1.as("x1"), x2.as("x2"), x3.as("x3"), y.as("y"))
  }

  private def fitWithCert(fam: String, sigmaRatios: Array[Double]) = {
    val df0 = frame(600)
    val (df, lab) = fam match {
      case "binomial" =>
        (df0.withColumn("cls", when(col("y") > 10.0, "hi").otherwise("lo")), "cls")
      case "poisson" =>
        (df0.withColumn("cnt", floor(abs(col("y"))).cast("double")), "cnt")
      case _ => (df0, "y")
    }
    SlopeEstimator.fit(df, Seq("x1", "x2", "x3"), lab,
      SlopeConfig(family = fam, sigmaRatios = sigmaRatios,
        kktExport = true, maxGramCols = 0,
        solver = SolverConfig(tolRelGap = 1e-8, tolInfeas = 1e-8)))
  }

  test("gaussian and binomial paths certify at every step, with margin") {
    for (fam <- Seq("gaussian", "binomial")) {
      val model = fitWithCert(fam, Array(0.6, 0.2, 0.05, 0.01))
      assert(model.fit.kktState.length == 4)
      val rows = KktCertificate.verdictDf(spark, model.fit, 1e-6).collect()
      assert(rows.length == 4, s"$fam: expected 4 verdict rows")
      rows.foreach { r =>
        assert(r.getBoolean(1), s"$fam step ${r.getInt(0)}: kkt_ok false")
        assert(r.getBoolean(2), s"$fam step ${r.getInt(0)}: sign_ok false")
      }
      // the window-SQL infeasibility must match the driver-side computation,
      // and the solver must leave >=100x margin under the certificate tol
      KktCertificate.infeasibilities(model.fit).foreach { case (k, infeas, lam0) =>
        val rh = math.max(math.sqrt(graft.slope.MathUtil.Eps), 1e-6 * lam0)
        assert(infeas <= rh / 10.0,
          s"$fam step $k: infeas $infeas too close to threshold $rh")
      }
    }
  }

  test("kktExport off leaves state empty and verdictDf refuses") {
    val df = frame(200)
    val model = SlopeEstimator.fit(df, Seq("x1", "x2", "x3"), "y",
      SlopeConfig(nSigma = 3))
    assert(model.fit.kktState.isEmpty)
    intercept[IllegalArgumentException] {
      KktCertificate.verdictDf(spark, model.fit, 1e-6)
    }
  }

  test("sign_ok tolerates exact optima at (near-)unpenalized steps") {
    // at sigma -> 0 the penalty vanishes: the optimum has g_j ~ 0 with
    // b_j != 0 on every feature, and its sign is numerical noise — a strict
    // g*b < 0 test would reject a legitimate optimum about half the time.
    // |g| under max(sqrt(eps), tolCert*lam0) is sign-neutral.
    val df = frame(300)
    val model = SlopeEstimator.fit(df, Seq("x1", "x2", "x3"), "y",
      SlopeConfig(sigma = Array(1e-14), kktExport = true, maxGramCols = 0,
        solver = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
          tolRelGap = 1e-12, tolInfeas = 1e-12)))
    val rows = KktCertificate.verdictDf(spark, model.fit, 1e-6).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1), "kkt_ok at sigma->0")
      assert(r.getBoolean(2),
        "sign_ok must tolerate g~0 on the support at an unpenalized optimum")
    }
  }

  test("a corrupted solution fails the certificate (falsifiability)") {
    val model = fitWithCert("gaussian", Array(0.2, 0.05))
    val fit = model.fit
    // tamper 1: inflate one gradient entry far past lambda -> kkt_ok false
    val (g0, b0, l0) = fit.kktState(1)
    val gBad = g0.copy
    gBad(1, 0) = l0(0) * 3.0
    val tamperedG = fit.copy(kktState = IndexedSeq((gBad, b0, l0)))
    val v1 = KktCertificate.verdictDf(spark, tamperedG, 1e-6).collect()
    assert(!v1.head.getBoolean(1), "inflated gradient must fail kkt_ok")

    // tamper 2: flip a support coefficient's sign -> sign_ok false
    val support = (1 until b0.rows).find(i => b0(i, 0) != 0.0)
    assert(support.nonEmpty, "fixture must have a nonzero coefficient")
    val bBad = b0.copy
    bBad(support.get, 0) = -bBad(support.get, 0)
    val tamperedB = fit.copy(kktState = IndexedSeq((g0, bBad, l0)))
    val v2 = KktCertificate.verdictDf(spark, tamperedB, 1e-6).collect()
    assert(!v2.head.getBoolean(2), "sign-flipped support must fail sign_ok")
  }
}
