package graft.fit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.slope.MathUtil

/** Machine-checked SLOPE optimality certificates for fitted paths.
  *
  * The SLOPE KKT condition at an optimum β is dual feasibility of the
  * smooth-loss gradient g = ∇f(β) against the sorted-L1 penalty: every
  * prefix of `sort(|g|, desc) − λ` has non-positive running sum (up to the
  * solver tolerance) — exactly the reference's `infeasibility`
  * (src/infeasibility.h:8-12) and the flag rule of its KKT screen
  * (src/kktCheck.h:8-37) — plus sign consistency on the support:
  * the penalty subgradient s = −g must satisfy sign(s_j) = sign(β_j)
  * wherever β_j ≠ 0.
  *
  * [[SlopePath]] records `(gradient, β_std, λ·σ_k)` per kept step when
  * `kktExport` is on; this object re-verifies those conditions from scratch
  * with declarative window SQL (rank |g| descending → pair with λ by rank →
  * running sum), so every emitted path step carries a certificate computed
  * by a different substrate than the solver that produced it. The driver's
  * DuckDB gate then pins the expected verdict table (all steps certified,
  * with the step count forced by a user-supplied σ grid).
  */
object KktCertificate {

  /** Per-step verdicts: (step, kkt_ok, sign_ok). `tolCert` scales the
    * feasibility threshold `max(√eps, tolCert·λ_0)` exactly like the
    * reference's `rh` (kktCheck.h:26).
    */
  def verdictDf(spark: SparkSession, fit: SlopeFit, tolCert: Double): DataFrame = {
    import spark.implicits._
    require(fit.kktState.nonEmpty,
      "fit has no KKT state — run with SlopeConfig(kktExport = true)")
    val skip = if (fit.intercept) 1 else 0

    // flattened penalized entries, target-major (kktCheck.h flattening)
    val entries = fit.kktState.zipWithIndex.flatMap { case ((g, b, _), k) =>
      val pFeat = g.rows - skip
      for (j <- 0 until g.cols; i <- 0 until pFeat)
        yield (k, j * pFeat + i, g(skip + i, j), b(skip + i, j))
    }
    val lambdas = fit.kktState.zipWithIndex.flatMap { case ((_, _, lam), k) =>
      lam.indices.map(r => (k, r, lam(r)))
    }
    val cert = entries.toDF("step", "idx", "g", "b")
    val lamDf = lambdas.toDF("step", "r", "lam")

    // rank |g| descending (ties by idx — tie order cannot change any prefix
    // sum: tied |g| values pair with a permutation of the same λ block)
    val ranked = cert.withColumn("r",
      row_number().over(
        Window.partitionBy("step").orderBy(abs(col("g")).desc, col("idx"))) - 1)
    val joined = ranked.join(lamDf, Seq("step", "r"))
      .withColumn("cs",
        sum(abs(col("g")) - col("lam")).over(
          Window.partitionBy("step").orderBy("r")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val sqrtEps = math.sqrt(MathUtil.Eps)
    // sign consistency is tolerance-free EXCEPT at (near-)unpenalized
    // entries: a legitimate optimum with the relevant λ = 0 (σ→0 paths,
    // user λ containing zeros) has g_j = 0 with β_j ≠ 0, and a strict
    // g·β < 0 test would reject it — |g| under the same feasibility
    // threshold max(√eps, tolCert·λ₀) is sign-neutral.
    val lam0w = max(when(col("r") === 0, col("lam")))
      .over(Window.partitionBy("step"))
    joined
      .withColumn("gtol", greatest(lit(sqrtEps), lit(tolCert) * lam0w))
      .groupBy("step")
      .agg(
        greatest(max(col("cs")), lit(0.0)).as("infeas"),
        max(when(col("r") === 0, col("lam"))).as("lam0"),
        min(when(col("b") === 0.0 || col("g") * col("b") < 0.0 ||
            abs(col("g")) <= col("gtol"), lit(1))
          .otherwise(lit(0))).as("signs"))
      .select(col("step"),
        (col("infeas") <= greatest(lit(sqrtEps), lit(tolCert) * col("lam0")))
          .as("kkt_ok"),
        (col("signs") === 1).as("sign_ok"))
      .orderBy("step")
  }

  /** Raw per-step infeasibility and threshold — diagnostic aid for picking
    * `tolCert`; same plan as [[verdictDf]] minus the boolean collapse.
    */
  def infeasibilities(fit: SlopeFit): Seq[(Int, Double, Double)] = {
    val skip = if (fit.intercept) 1 else 0
    fit.kktState.zipWithIndex.map { case ((g, b, lam), k) =>
      val pFeat = g.rows - skip
      val flat = (for (j <- 0 until g.cols; i <- 0 until pFeat)
        yield math.abs(g(skip + i, j))).toArray
      val infeas = graft.slope.SortedL1.infeasibility(flat, lam)
      (k, infeas, lam(0))
    }
  }
}
