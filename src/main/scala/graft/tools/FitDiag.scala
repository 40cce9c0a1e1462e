package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fit._

/** One-off fit diagnostic: time a single saturating-σ fit on a given SF
  * dir and print the engine's own data-pass counter — the number that
  * explains (or indicts) any slow distributed solve.
  * Usage: runMain graft.tools.FitDiag <sfDir> <family> [localFitThreshold]
  */
object FitDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val fam = args(1)
    val thr = args.lift(2).map(_.toLong).getOrElse(4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.util.Tables.t(spark, sfDir, "lineitem")
    // optional 4th arg: tolRelGap/tolInfeas override for the MLE modes
    // (the kkt- modes read the same slot)
    val mleTol = args.lift(3).map(_.toDouble)
    val tight = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
      tolRelGap = mleTol.getOrElse(1e-12), tolInfeas = mleTol.getOrElse(1e-12))
    def cfg(f: String) = SlopeConfig(family = f, sigma = Array(1e6),
      lambdaType = "user",
      userLambda = Array.fill(if (f == "multinomial") 2 else 1)(1.0),
      solver = tight, localFitThreshold = thr)
    val t0 = System.nanoTime()
    val model = fam match {
      case "binomial" =>
        SlopeEstimator.fit(df.withColumn("is_r",
          when(col("l_returnflag") === "R", "R").otherwise("NR")),
          Seq("l_tax"), "is_r", cfg("binomial"))
      case "poisson" =>
        SlopeEstimator.fit(df.withColumn("qty", col("l_quantity").cast("double")),
          Seq("l_tax"), "qty", cfg("poisson"))
      case "multinomial" =>
        SlopeEstimator.fit(df, Seq("l_tax"), "l_returnflag", cfg("multinomial"))
      // kkt-<family>: the certificate queries' exact fit shape (user-σ
      // ratio grid, forced FISTA, kktExport) with per-step pass counts —
      // the breakdown that says WHICH path step burns the passes.
      case kf if kf.startsWith("kkt-") =>
        val family = kf.stripPrefix("kkt-")
        val features = Seq("l_quantity", "l_discount", "l_tax")
        // optional 4th arg: tolRelGap override, for measuring how the gap
        // tolerance trades passes against certificate margin
        val gapTol = args.lift(3).map(_.toDouble).getOrElse(1e-8)
        val solver = SolverConfig(tolRelGap = gapTol, tolInfeas = 1e-8)
        val ratios = Array(0.7, 0.35, 0.15, 0.05, 0.01)
        val (d2, feats, lab) = family match {
          case "gaussian" => (df, features, "l_extendedprice")
          case "binomial" =>
            (df.withColumn("is_r",
              when(col("l_returnflag") === "R", "R").otherwise("NR")),
              features, "is_r")
          case "multinomial" => (df, features, "l_returnflag")
          case "poisson" =>
            (df.withColumn("qty", col("l_quantity").cast("double")),
              Seq("l_discount", "l_tax", "l_extendedprice"), "qty")
          case other => sys.error(s"unknown family $other")
        }
        SlopeEstimator.fit(d2, feats, lab,
          SlopeConfig(family = family, sigmaRatios = ratios,
            kktExport = true, maxGramCols = 0, solver = solver,
            localFitThreshold = thr))
      case other => sys.error(s"unknown family $other")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"[fitdiag] family=$fam wall=${dt}s dataPasses=${model.fit.dataPasses} " +
      s"solverPasses=${model.fit.passes.toSeq} intercept=${model.fit.betas.head(0, 0)} " +
      s"stallExits=${model.fit.stallExits.toSeq}")
    if (model.fit.kktState.nonEmpty)
      KktCertificate.infeasibilities(model.fit).foreach { case (k, inf, lam0) =>
        println(f"[fitdiag] step=$k infeas=$inf%.3e lam0=$lam0%.3e " +
          f"infeas/lam0=${inf / lam0}%.3e (cert tol 1e-6)")
      }
    spark.stop()
  }
}
