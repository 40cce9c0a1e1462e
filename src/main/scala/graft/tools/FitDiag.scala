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
    val tight = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
      tolRelGap = 1e-12, tolInfeas = 1e-12)
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
      case other => sys.error(s"unknown family $other")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"[fitdiag] family=$fam wall=${dt}s dataPasses=${model.fit.dataPasses} " +
      s"solverPasses=${model.fit.passes.toSeq} intercept=${model.fit.betas.head(0, 0)}")
    spark.stop()
  }
}
