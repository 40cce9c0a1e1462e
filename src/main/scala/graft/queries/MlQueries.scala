package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.{Det, Tables}
import graft.fit._

/** The SLOPE engine's distributed primitives, exposed as hash-checkable
  * queries: standardization statistics (F3/F4), the gaussian lambdaMax
  * gradient (F7), fixed-coefficient scoring (M10) and the Wilcoxon AUC rank
  * statistic (M12) are all ANSI-SQL-expressible, so they get exact DuckDB
  * oracles (decimal-sum recipe from `Det`). The path fits themselves
  * (F1/F9/F10) are iterative optimization — registered rows-only.
  *
  * Scale notes: every oracled query here is a single scan + one/two-level
  * aggregation (no joins, no driver loops); the stacked layout shuffles
  * p·n rows only for the per-feature stats — at 1000 executors this is the
  * canonical map-side-combine pattern.
  */
object MlQueries {

  private val features = Seq("l_quantity", "l_discount", "l_tax")
  private val label = "l_extendedprice"

  private def li(s: SparkSession, dir: String): DataFrame = Tables.t(s, dir, "lineitem")

  /** Wide per-feature aggregates computed in ONE lineitem scan (no stack
    * explode — stacking first would scan-shuffle |features|× the rows),
    * unpivoted to (feature, n, xm, ym, sxx, sxy) afterwards. The oracle SQL
    * keeps the readable UNION ALL form; values are identical.
    */
  private def featureMoments(s: SparkSession, dir: String): DataFrame = {
    val aggs = features.zipWithIndex.flatMap { case (f, i) =>
      Seq(
        Det.davg(col(f)).as(s"xm_$i"),
        Det.dsum(col(f) * col(f), 6).as(s"sxx_$i"),
        Det.dsum(col(f) * col(label), 6).as(s"sxy_$i"))
    }
    val allAggs = Seq(count(lit(1)).as("n"), Det.davg(col(label)).as("ym")) ++ aggs
    // decimal-exact sums are ~30x a double sum per row; spread the pruned
    // scan so they aggregate on all cores (no-op on a many-split lake scan)
    val src = Tables.spread(li(s, dir).select((features :+ label).map(col): _*))
    val wide = src.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = features.zipWithIndex
      .map { case (f, i) => s"'$f', xm_$i, sxx_$i, sxy_$i" }.mkString(", ")
    wide.selectExpr("n", "ym",
      s"stack(${features.length}, $stackArgs) as (feature, xm, sxx, sxy)")
  }

  private val stackedSql =
    features.map(f => s"SELECT '$f' AS feature, $f AS x, $label AS y FROM lineitem")
      .mkString(" UNION ALL ")

  /** F3: per-feature mean / centered-L2 / sd — the standardization pass. */
  val standardizeStats: Q = Q.sql(
    "m_standardize_stats",
    s"""WITH f AS ($stackedSql),
       |agg AS (
       |  SELECT feature,
       |         count(*) AS n,
       |         ${Det.davgSql("x")} AS mean,
       |         ${Det.dsumSql("x*x")} AS sumsq
       |  FROM f GROUP BY feature)
       |SELECT feature,
       |       mean,
       |       sqrt(sumsq - n*mean*mean) AS l2_centered,
       |       sqrt((sumsq - n*mean*mean)/(n - 1)) AS sd
       |FROM agg ORDER BY feature""".stripMargin) { (s, dir) =>
    featureMoments(s, dir)
      .select(col("feature"), col("xm").as("mean"),
        sqrt(col("sxx") - col("n") * col("xm") * col("xm")).as("l2_centered"),
        sqrt((col("sxx") - col("n") * col("xm") * col("xm")) / (col("n") - lit(1)))
          .as("sd"))
      .orderBy("feature")
  }

  /** F7: gaussian lambdaMax |Xsᵀ yc| per feature over standardized X and
    * centered y — |Σ x·y − n·x̄·ȳ| / ‖x−x̄‖₂, one scan.
    */
  val lambdaMaxGaussian: Q = Q.sql(
    "m_lambda_max_gaussian",
    s"""WITH f AS ($stackedSql),
       |agg AS (
       |  SELECT feature,
       |         count(*) AS n,
       |         ${Det.davgSql("x")} AS xm,
       |         ${Det.davgSql("y")} AS ym,
       |         ${Det.dsumSql("x*x")} AS sxx,
       |         ${Det.dsumSql("x*y")} AS sxy
       |  FROM f GROUP BY feature)
       |SELECT feature,
       |       abs((sxy - n*xm*ym)/sqrt(sxx - n*xm*xm)) AS lambda_max
       |FROM agg ORDER BY feature""".stripMargin) { (s, dir) =>
    featureMoments(s, dir)
      .select(col("feature"),
        abs((col("sxy") - col("n") * col("xm") * col("ym")) /
          sqrt(col("sxx") - col("n") * col("xm") * col("xm"))).as("lambda_max"))
      .orderBy("feature")
  }

  /** F6+F7: the AUTO-σ grid itself, DuckDB-oracled (round-15 verdict's
    * "next" item 8) — σ_max and the geometric grid are closed-form, so the
    * one remaining free-floating input of every auto-σ path fit gets a
    * bit-exact cross-engine row, shrinking the rows-only set to the
    * genuinely iterative fits.
    *
    * Both engines compute the SAME IEEE-double arithmetic over Det-exact
    * moments, so agreement is structural:
    *  - per-feature |∇f(0)|_j = |Σxy − n·x̄·ȳ| / ‖x − x̄‖₂ (the
    *    [[lambdaMaxGaussian]] value — gaussian λmax over l2-standardized X,
    *    reference src/standardize.h + regularizationPath.h:64),
    *  - the gaussian-corrected BH λ sequence (regularizationPath.h:35-46):
    *    the qnorm bases are data-independent LITERALS (p = 3, q = 0.1 since
    *    n ≫ p) shared verbatim by both sides, and the MC-free correction
    *    `λ_i·sqrt(1 + Σλ²/max(1, n−i−1))` + first-argmin clamp is spelled
    *    out operation-for-operation for nLambda = 3,
    *  - σ_max = max_k (Σ_{i≤k} |∇|_(i) / Σ_{i≤k} λ_i) with explicit
    *    left-to-right prefix sums (no window running sums — a segment-tree
    *    window could re-associate the doubles),
    *  - grid step i = σ_max · ratio^(i/(nSigma−1)): the data-independent
    *    factor ratio^(i/4) is a shared literal, so each grid value is one
    *    exact multiply — algebraically equal to the engine's
    *    `exp(linspace(log σ_max, log(σ_max·ratio), n))`
    *    (regularizationPath.h:67-71) without its cross-libm exp/log.
    *
    * The Spark side is additionally a CERTIFICATE of the live path driver:
    * it runs a real auto-σ gaussian fit (nSigma = 5, default BH-gaussian
    * λ, default lambdaMinRatio = 1e-4) and requires the engine's kept σ
    * prefix and n-scaled λ to match the closed form at 1e-10 relative —
    * the engine's own treeAggregate moments and libm exp/log land within
    * ulps of the Det values, and a LambdaSequence / lambdaMaxVec / grid
    * regression trips the require loudly before any row is emitted.
    */
  val sigmaGridGaussian: Q = {
    val nSteps = 5
    val ratio = 1e-4 // lambdaMinRatio default for n >= p
    val q = 0.1 // 0.1·min(1, n/pFeat) with n ≫ pFeat = 3
    val b = graft.slope.LambdaSequence.bh(features.length, q)
    val rs = Array.tabulate(nSteps)(i =>
      math.exp(math.log(ratio) * i / (nSteps - 1.0)))
    val stepRows = rs.zipWithIndex
      .map { case (r, i) => s"($i, ${r}::DOUBLE)" }.mkString(", ")
    Q.sql(
      "m_sigma_grid_gaussian",
      s"""WITH f AS ($stackedSql),
         |agg AS (
         |  SELECT feature,
         |         count(*) AS n,
         |         ${Det.davgSql("x")} AS xm,
         |         ${Det.davgSql("y")} AS ym,
         |         ${Det.dsumSql("x*x")} AS sxx,
         |         ${Det.dsumSql("x*y")} AS sxy
         |  FROM f GROUP BY feature),
         |g AS (SELECT feature, n,
         |             abs((sxy - n*xm*ym)/sqrt(sxx - n*xm*xm)) AS grad
         |      FROM agg),
         |rk AS (SELECT grad, row_number() OVER (ORDER BY grad DESC, feature) AS r
         |       FROM g),
         |srt AS (SELECT max(CASE WHEN r = 1 THEN grad END) AS s1,
         |               max(CASE WHEN r = 2 THEN grad END) AS s2,
         |               max(CASE WHEN r = 3 THEN grad END) AS s3,
         |               (SELECT max(n)::DOUBLE FROM agg) AS nd
         |        FROM rk),
         |lam0 AS (SELECT *,
         |                ${b(0)}::DOUBLE AS l1,
         |                ${b(1)}::DOUBLE * sqrt(1 + (${b(0)}::DOUBLE * ${b(0)}::DOUBLE) / greatest(1.0, nd - 2)) AS l2p
         |         FROM srt),
         |lam1 AS (SELECT *,
         |                ${b(2)}::DOUBLE * sqrt(1 + (${b(0)}::DOUBLE * ${b(0)}::DOUBLE + l2p * l2p) / greatest(1.0, nd - 3)) AS l3p
         |         FROM lam0),
         |lam AS (SELECT *,
         |               CASE WHEN l1 <= l2p AND l1 <= l3p THEN 0
         |                    WHEN l2p <= l3p THEN 1 ELSE 2 END AS imin,
         |               least(l1, l2p, l3p) AS mn
         |        FROM lam1),
         |lamc AS (SELECT s1, s2, s3,
         |                CASE WHEN imin = 0 THEN mn ELSE l1 END AS l1c,
         |                CASE WHEN imin <= 1 THEN mn ELSE l2p END AS l2c,
         |                mn AS l3c
         |         FROM lam),
         |sm AS (SELECT greatest(s1 / l1c,
         |                       (s1 + s2) / (l1c + l2c),
         |                       ((s1 + s2) + s3) / ((l1c + l2c) + l3c)) AS sigmax
         |       FROM lamc)
         |SELECT v.step, sm.sigmax * v.r AS sigma
         |FROM (VALUES $stepRows) v(step, r) CROSS JOIN sm
         |ORDER BY v.step""".stripMargin) { (s, dir) =>
      import scala.math.{abs => fabs, sqrt => fsqrt, max => fmax, min => fmin}
      // Det-exact moments (3 rows) → the closed-form grid, with the same
      // operation order as the SQL above so both engines emit the same bits
      val m = featureMoments(s, dir)
        .select("feature", "n", "xm", "ym", "sxx", "sxy").collect()
      val grads = m.map { r =>
        val (n, xm, ym, sxx, sxy) = (r.getLong(1).toDouble, r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))
        fabs((sxy - n * xm * ym) / fsqrt(sxx - n * xm * xm))
      }.sorted(Ordering[Double].reverse)
      val nd = m.head.getLong(1).toDouble
      val l1 = b(0)
      val l2p = b(1) * fsqrt(1 + (b(0) * b(0)) / fmax(1.0, nd - 2))
      val l3p = b(2) * fsqrt(1 + (b(0) * b(0) + l2p * l2p) / fmax(1.0, nd - 3))
      val mn = fmin(l1, fmin(l2p, l3p))
      val imin = if (l1 <= l2p && l1 <= l3p) 0 else if (l2p <= l3p) 1 else 2
      val (l1c, l2c, l3c) =
        (if (imin == 0) mn else l1, if (imin <= 1) mn else l2p, mn)
      val Array(s1, s2, s3) = grads
      val sigmax = fmax(s1 / l1c,
        fmax((s1 + s2) / (l1c + l2c), ((s1 + s2) + s3) / ((l1c + l2c) + l3c)))
      val detSigma = rs.map(sigmax * _)
      // live-engine certificate: a real auto-σ fit must land on this grid
      val fit = SlopeEstimator.fit(li(s, dir), features, label,
        SlopeConfig(nSigma = nSteps)).fit
      require(fit.sigma.length >= 2, s"auto-σ fit kept ${fit.sigma.length} steps")
      val lamEng = fit.lambda.map(_ * nd) // SlopeFit.lambda is /n (owl.cpp:380)
      for (((e, d), i) <- lamEng.zip(Array(l1c, l2c, l3c)).zipWithIndex)
        require(fabs(e - d) <= 1e-10 * d,
          s"engine λ($i)·n = $e vs closed-form $d")
      for (((e, d), i) <- fit.sigma.zip(detSigma).zipWithIndex)
        require(fabs(e - d) <= 1e-10 * d,
          s"engine σ($i) = $e vs closed-form grid $d")
      val rows = detSigma.zipWithIndex.map { case (sg, i) => (i, sg) }
      s.createDataFrame(rows.toSeq).toDF("step", "sigma").orderBy("step")
    }
  }

  /** M10: mse/mae of a FIXED coefficient vector (scoring a known model is
    * pure SQL; the β here is arbitrary but shared with the oracle).
    *
    * Every input column holds 2-decimal values and the β are integers, so
    * err sits exactly on the 1e-2 grid and err² on the 1e-4 grid — the
    * floor-grid `Det` recipe at those scales rounds nothing and both
    * engines sum the exact values. (An earlier double→DECIMAL(30,3) cast
    * form rounded err² — a 4-decimal quantity — at scale 3, so `.xxx5`
    * ties were everywhere and Spark's shortest-string cast broke them
    * differently from DuckDB's exact-binary cast → hash mismatch.)
    */
  val scoreFixedBeta: Q = {
    val (b0, b1, b2, b3) = (1000.0, 25.0, -2000.0, 1500.0)
    Q.sql(
      "m_score_fixed_beta",
      s"""WITH e AS (
         |  SELECT ($b0 + $b1*l_quantity + $b2*l_discount + $b3*l_tax) - l_extendedprice AS err
         |  FROM lineitem)
         |SELECT ${Det.dsumSql("err*err", 4)} / count(*)::DOUBLE AS mse,
         |       ${Det.dsumSql("abs(err)", 2)} / count(*)::DOUBLE AS mae
         |FROM e""".stripMargin) { (s, dir) =>
      Tables.spread(li(s, dir)
        .select(((lit(b0) + lit(b1) * col("l_quantity") + lit(b2) * col("l_discount")
          + lit(b3) * col("l_tax")) - col("l_extendedprice")).as("err")))
        .agg(
          (Det.dsum(col("err") * col("err"), 4) / count(lit(1)).cast("double")).as("mse"),
          (Det.dsum(abs(col("err")), 2) / count(lit(1)).cast("double")).as("mae"))
    }
  }

  /** M12: Wilcoxon rank-statistic AUC of a fixed score (o_totalprice) for a
    * binary label (orderstatus = 'F'), via average ranks — the engine's only
    * data-scale sort, executed as a range-partitioned sort + zipWithIndex
    * (fully parallel; see DistributedRank). Integer rank sums keep every
    * intermediate exact.
    */
  val aucFixedScore: Q = Q.sql(
    "m_auc_fixed_score",
    s"""WITH s AS (
      |  SELECT o_totalprice AS prob,
      |         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
      |  FROM orders),
      |r AS (SELECT prob, y, row_number() OVER (ORDER BY prob) AS rn FROM s),
      |g AS (SELECT prob,
      |             sum(rn)::DOUBLE / count(*)::DOUBLE AS avg_rank,
      |             sum(y) AS n1_in, count(*) AS cnt
      |      FROM r GROUP BY prob),
      |a AS (SELECT ${Det.dsumSql("avg_rank*n1_in")} AS rank_sum,
      |             ${Det.dsumSql("n1_in")} AS n1,
      |             sum(cnt) AS n
      |      FROM g)
      |SELECT exp(ln(rank_sum - n1*(n1 + 1)/2) - ln(n1) - ln(n::DOUBLE - n1)) AS auc
      |FROM a""".stripMargin) { (s, dir) =>
    val base = Tables.t(s, dir, "orders").select(
      col("o_totalprice").as("prob"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
    // group to one row per distinct score FIRST (map-side combinable), then
    // tie-averaged ranks fall out of a distributed prefix sum over the
    // range-sorted distinct table — an un-partitioned Window.orderBy would
    // funnel the whole table through one task. avg_rank = cum_before +
    // (cnt+1)/2 is exactly sum(consecutive ranks)/cnt, as the oracle
    // computes it (half-integers are exact doubles).
    val grouped = base.groupBy("prob").agg(
      sum(col("y")).as("n1_in"), count(lit(1)).as("cnt"))
    val g = graft.fit.DistributedRank.withPrefixSum(grouped, Seq("prob"), "cnt")
      .withColumn("avg_rank",
        col("cum_before").cast("double") + (col("cnt").cast("double") + 1.0) / 2.0)
    val a = g.agg(
      Det.dsum(col("avg_rank") * col("n1_in"), 6).as("rank_sum"),
      Det.dsum(col("n1_in"), 6).as("n1"),
      sum(col("cnt")).as("n"))
    a.select(exp(log(col("rank_sum") - col("n1") * (col("n1") + lit(1)) / lit(2))
      - log(col("n1")) - log(col("n").cast("double") - col("n1"))).as("auc"))
  }

  /** M12 weighted variant (reference R/score.R:152-164): case-weighted
    * Wilcoxon AUC with DETERMINISTIC tie-averaging (the reference randomizes
    * tie order — documented deviation; randomization is not reproducible
    * across engines). Weights here are exact integers, so every group
    * statistic is an exact long, the cross-group term
    * `2U = Σ w1g·(2·cumW0 + w0g)` an exact decimal, and the final double is
    * engine-independent. Same scale shape as `m_auc_fixed_score`: grouped
    * map-side-combinable aggregation + distributed prefix sum — never a
    * single-partition window.
    */
  val aucWeighted: Q = Q.sql(
    "m_auc_weighted",
    s"""WITH s AS (
      |  SELECT o_totalprice AS prob,
      |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |         (o_orderkey % 7 + 1)::BIGINT AS w
      |  FROM orders),
      |g AS (SELECT prob,
      |             sum(CASE WHEN y = 1 THEN w ELSE 0 END)::BIGINT AS w1g,
      |             sum(CASE WHEN y = 0 THEN w ELSE 0 END)::BIGINT AS w0g
      |      FROM s GROUP BY prob),
      |c AS (SELECT w1g, w0g,
      |             coalesce(sum(w0g) OVER (ORDER BY prob
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumw0
      |      FROM g),
      |a AS (SELECT sum((w1g * (2*cumw0 + w0g))::DECIMAL(38,0)) AS u2,
      |             sum(w1g)::DOUBLE AS w1, sum(w0g)::DOUBLE AS w0
      |      FROM c)
      |SELECT exp(ln(u2::DOUBLE) - ln(2) - ln(w1) - ln(w0)) AS wauc
      |FROM a""".stripMargin) { (s, dir) =>
    val base = Tables.t(s, dir, "orders").select(
      col("o_totalprice").as("prob"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
      (col("o_orderkey") % 7 + 1).cast("long").as("w"))
    val g = base.groupBy("prob").agg(
      sum(when(col("y") === 1, col("w")).otherwise(lit(0L))).as("w1g"),
      sum(when(col("y") === 0, col("w")).otherwise(lit(0L))).as("w0g"))
    val pre = graft.fit.DistributedRank.withPrefixSum(g, Seq("prob"), "w0g")
    val dec = DecimalType(38, 0)
    val a = pre.agg(
      sum((col("w1g").cast(dec) *
        (col("cum_before").cast(dec) * lit(2) + col("w0g").cast(dec))).cast(dec))
        .as("u2"),
      sum(col("w1g")).cast("double").as("w1"),
      sum(col("w0g")).cast("double").as("w0"))
    a.select(exp(log(col("u2").cast("double")) - log(lit(2.0))
      - log(col("w1")) - log(col("w0"))).as("wauc"))
  }

  /** F1+F9/F10 end-to-end: the gaussian SLOPE path on lineitem features.
    * Iterative optimization — no SQL oracle; the driver records rows/schema.
    * Coefficient correctness is pinned by the ScalaTest closed-form oracles,
    * and every run SELF-CERTIFIES: [[pathToDf]] re-verifies the SLOPE KKT
    * conditions at every kept step (see below).
    */
  val slopePathGaussian: Q = Q.rowsOnly("m_slope_path_gaussian") { (s, dir) =>
    val model = SlopeEstimator.fit(li(s, dir), features, label,
      SlopeConfig(nSigma = 20, kktExport = true))
    pathToDf(s, model)
  }

  /** Binomial SLOPE path: predict return-flag R from the same features. */
  val slopePathBinomial: Q = Q.rowsOnly("m_slope_path_binomial") { (s, dir) =>
    val df = li(s, dir).withColumn("is_r",
      when(col("l_returnflag") === "R", "R").otherwise("NR"))
    val model = SlopeEstimator.fit(df, features, "is_r",
      SlopeConfig(family = "binomial", nSigma = 8, kktExport = true))
    pathToDf(s, model)
  }

  /** Multinomial SLOPE path: 3-class l_returnflag, m−1 = 2 full-rank
    * targets (reference parametrization, not MLlib's pivoted softmax).
    */
  val slopePathMultinomial: Q = Q.rowsOnly("m_slope_path_multinomial") { (s, dir) =>
    val model = SlopeEstimator.fit(li(s, dir), features, "l_returnflag",
      SlopeConfig(family = "multinomial", nSigma = 6, kktExport = true))
    pathToDf(s, model)
  }

  /** Poisson SLOPE path: predict integer-ish l_quantity with a log link. */
  val slopePathPoisson: Q = Q.rowsOnly("m_slope_path_poisson") { (s, dir) =>
    val model = SlopeEstimator.fit(
      li(s, dir).withColumn("qty", col("l_quantity").cast("double")),
      Seq("l_discount", "l_tax", "l_extendedprice"), "qty",
      SlopeConfig(family = "poisson", nSigma = 6, kktExport = true))
    pathToDf(s, model)
  }

  /** The reference plot.Owl data surface (M15) — with a MACHINE-CHECKED
    * exit gate when the fit exported certificate state: every kept path
    * step must satisfy the SLOPE KKT conditions at the DEFAULT solver
    * tolerance (×3 slack for full-space assembly over the screened
    * subset's guarantee; sign consistency is tolerance-free except at
    * near-unpenalized entries — see KktCertificate). A solver /
    * screening / warm-start regression turns these rows-only queries into
    * loud failures instead of silently-wrong row dumps — the auto-σ BH
    * paths get per-step certificates just like the user-σ
    * `m_slope_path_kkt_*` oracles.
    */
  private[queries] def pathToDf(s: SparkSession, model: SlopeModel): DataFrame = {
    if (model.fit.kktState.nonEmpty) {
      val tolCert = 3.0 * SolverConfig().tolInfeas
      val bad = KktCertificate.verdictDf(s, model.fit, tolCert)
        .collect().filterNot(r => r.getBoolean(1) && r.getBoolean(2))
      require(bad.isEmpty,
        s"SLOPE path failed its KKT certificate at steps " +
          s"${bad.map(_.getInt(0)).mkString(",")} (tol $tolCert)")
    }
    model.pathDf(s)
  }

  /** The gradient reduce as a typed Dataset Aggregator (UDAF surface,
    * SURVEY §2.5): gaussian loss + full gradient at a FIXED raw-scale β,
    * exact-decimal accumulation → bit-identical DuckDB oracle.
    */
  val gradientUdaf: Q = {
    val b0 = 1000.0
    val bs = Array(25.0, -2000.0, 1500.0)
    Q.sql(
      "m_gradient_udaf",
      s"""WITH e AS (
         |  SELECT l_quantity AS x1, l_discount AS x2, l_tax AS x3,
         |         ($b0 + ${bs(0)}*l_quantity + ${bs(1)}*l_discount + ${bs(2)}*l_tax)
         |           - l_extendedprice AS r
         |  FROM lineitem)
         |SELECT ${Det.dsumSql("0.5*r*r", 3)} AS loss,
         |       ${Det.dsumSql("r")} AS g_intercept,
         |       ${Det.dsumSql("x1*r")} AS g_quantity,
         |       ${Det.dsumSql("x2*r")} AS g_discount,
         |       ${Det.dsumSql("x3*r")} AS g_tax
         |FROM e""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ds = Tables.spread(li(s, dir)
        .select(col(label).cast("double"),
          array(features.map(f => col(f).cast("double")): _*)))
        .as[(Double, Array[Double])]
      val agg = new GradientAggregator(b0, bs, graft.slope.Gaussian)
      // lazy single plan: the Aggregator IS the aggregation node; the
      // product-encoded result flattens to (loss, grads)
      ds.select(agg.toColumn.name("res")).toDF("loss", "grads")
        .select(col("loss"),
          col("grads")(0).as("g_intercept"),
          col("grads")(1).as("g_quantity"),
          col("grads")(2).as("g_discount"),
          col("grads")(3).as("g_tax"))
    }
  }

  /** F1/F5/F9 end-to-end HARD anchor: at σ → 0 the sorted-L1 penalty
    * vanishes, so the real path machinery (standardize → solve → KKT →
    * back-transform rescale) must land on plain OLS — and 2-feature OLS
    * with intercept is a closed-form 2×2 normal-equation solve, fully
    * expressible in SQL (mirrors the reference's own `lm()` oracle,
    * tests/testthat/test-gaussian.R:1-17). Decimal-exact sums feed the
    * oracle's solve; the solver runs at σ = 1e-14 with tightened ADMM
    * tolerances, so both sides agree far below the 4-decimal rounding.
    */
  val slopeSigma0Gaussian: Q = Q.sql(
    "m_slope_sigma0_gaussian",
    s"""WITH a AS (
       |  SELECT count(*)::DOUBLE AS n,
       |         ${Det.dsumSql("l_quantity")} AS s1,
       |         ${Det.dsumSql("l_discount", 9)} AS s2,
       |         ${Det.dsumSql("l_extendedprice")} AS sy,
       |         ${Det.dsumSql("l_quantity*l_quantity")} AS s11,
       |         ${Det.dsumSql("l_quantity*l_discount", 9)} AS s12,
       |         ${Det.dsumSql("l_discount*l_discount", 9)} AS s22,
       |         ${Det.dsumSql("l_quantity*l_extendedprice", 3)} AS s1y,
       |         ${Det.dsumSql("l_discount*l_extendedprice")} AS s2y
       |  FROM lineitem),
       |c AS (SELECT s11 - s1*s1/n AS a11, s12 - s1*s2/n AS a12,
       |             s22 - s2*s2/n AS a22, s1y - s1*sy/n AS c1,
       |             s2y - s2*sy/n AS c2,
       |             s1/n AS m1, s2/n AS m2, sy/n AS my FROM a),
       |b AS (SELECT (a22*c1 - a12*c2)/(a11*a22 - a12*a12) AS b1,
       |             (a11*c2 - a12*c1)/(a11*a22 - a12*a12) AS b2,
       |             m1, m2, my FROM c)
       |SELECT * FROM (
       |  SELECT 'intercept' AS term, round(my - b1*m1 - b2*m2, 4) AS beta FROM b
       |  UNION ALL SELECT 'l_quantity', round(b1, 4) FROM b
       |  UNION ALL SELECT 'l_discount', round(b2, 4) FROM b)
       |ORDER BY term""".stripMargin) { (s, dir) =>
    import s.implicits._
    val model = SlopeEstimator.fit(li(s, dir), Seq("l_quantity", "l_discount"), label,
      SlopeConfig(sigma = Array(1e-14),
        solver = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
          tolRelGap = 1e-12, tolInfeas = 1e-12)))
    val b = model.coef().head
    Seq(("intercept", b(0, 0)), ("l_quantity", b(1, 0)), ("l_discount", b(2, 0)))
      .toDF("term", "beta")
      .select(col("term"), round(col("beta"), 4).as("beta"))
      .orderBy("term")
  }

  /** F1/F17 PATH-LOOP hard anchor (not just the σ→0 endpoint): constant-λ
    * SLOPE is the lasso, and on an orthonormalized design the lasso is
    * coordinatewise soft-thresholding of the feature–response correlations
    * — closed form at EVERY σ, so a 4-step user-σ path (warm starts, KKT,
    * screening, rescale all engaged per step) gets a hard DuckDB row per
    * coefficient per step. The design is synthesized arithmetic: x1/x2 are
    * ±1 patterns over i mod 4 / mod 2 (exactly centered, exactly
    * orthogonal, centered sum-of-squares exactly n), y is a deterministic
    * modular ramp plus 3·x1 − 1.5·x2. User λ is standardized by n
    * (reference src/regularizationPath.h:52-55), so the engine's threshold
    * is σ·n; the exact-binary σ grid spans the sparsity regimes: both
    * coefficients zeroed (σn=60), one (30), none (11.25, 0.469). Engine
    * path: standardize (l2) → per-σ strong-rule screen → solve → KKT
    * → warm start next σ → rescale; oracle: β̃_j = S(x̃_j·ỹ, σ·n) / ‖x_j‖.
    * All rounded values sit ≥2e-6 from a 4-decimal boundary vs solver
    * tolerance ~1e-12.
    *
    * Two registered variants pin BOTH solvers against the same closed
    * form: the default config routes gaussian through ADMM
    * (`m_slope_path_lasso_ortho`), and `maxGramCols = 0` forces FISTA
    * (`m_slope_path_lasso_ortho_fista`) — the accelerated path every
    * non-gaussian family runs — so F9 gets a hard mid-path oracle too,
    * not just σ→0/MLE endpoints.
    */
  private def lassoOrthoQuery(qname: String, forceFista: Boolean): Q = {
    val nRows = 240
    val sigmas = Array(0.25, 0.125, 0.046875, 0.001953125)
    val stepSql = sigmas.zipWithIndex
      .map { case (s, i) => s"($i, ${s}::DOUBLE)" }.mkString(", ")
    Q.sql(
      qname,
      s"""WITH base AS (
         |  SELECT CASE WHEN i % 4 < 2 THEN 1.0 ELSE -1.0 END AS x1,
         |         CASE WHEN i % 2 = 0 THEN 1.0 ELSE -1.0 END AS x2,
         |         ((7*i) % 23 - 11)*0.25
         |           + 3.0*(CASE WHEN i % 4 < 2 THEN 1.0 ELSE -1.0 END)
         |           - 1.5*(CASE WHEN i % 2 = 0 THEN 1.0 ELSE -1.0 END) AS y
         |  FROM range($nRows) t(i)),
         |a AS (SELECT ${Det.dsumSql("x1*y", 2)} AS s1y,
         |             ${Det.dsumSql("x2*y", 2)} AS s2y,
         |             ${Det.dsumSql("y", 2)} / $nRows.0 AS my
         |      FROM base),
         |c AS (SELECT s1y/sqrt($nRows.0) AS c1, s2y/sqrt($nRows.0) AS c2, my FROM a),
         |s(step, thr) AS (SELECT step, sigma * $nRows.0
         |                 FROM (VALUES $stepSql) v(step, sigma)),
         |b AS (SELECT step,
         |        (CASE WHEN abs(c1) <= thr THEN 0.0
         |              WHEN c1 > 0 THEN c1 - thr ELSE c1 + thr END)
         |          / sqrt($nRows.0) AS b1,
         |        (CASE WHEN abs(c2) <= thr THEN 0.0
         |              WHEN c2 > 0 THEN c2 - thr ELSE c2 + thr END)
         |          / sqrt($nRows.0) AS b2,
         |        my FROM s, c)
         |SELECT * FROM (
         |  SELECT step::INT AS step, 'intercept' AS term, round(my, 4) AS beta FROM b
         |  UNION ALL SELECT step::INT, 'x1', round(b1, 4) FROM b
         |  UNION ALL SELECT step::INT, 'x2', round(b2, 4) FROM b)
         |ORDER BY step, term""".stripMargin) { (s, dir) =>
      import s.implicits._
      val x1 = when(pmod(col("id"), lit(4)) < 2, lit(1.0)).otherwise(lit(-1.0))
      val x2 = when(pmod(col("id"), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
      val y = (pmod(col("id") * 7, lit(23)) - 11).cast("double") * lit(0.25) +
        lit(3.0) * x1 - lit(1.5) * x2
      val model = SlopeEstimator.fit(
        s.range(nRows).select(x1.as("x1"), x2.as("x2"), y.as("y")),
        Seq("x1", "x2"), "y",
        SlopeConfig(sigma = sigmas, lambdaType = "user",
          userLambda = Array(1.0, 1.0),
          maxGramCols = if (forceFista) 0 else 2048,
          solver = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
            tolRelGap = 1e-12, tolInfeas = 1e-12)))
      val rows = model.coef().zipWithIndex.flatMap { case (b, k) =>
        Seq((k, "intercept", b(0, 0)), (k, "x1", b(1, 0)), (k, "x2", b(2, 0)))
      }
      rows.toDF("step", "term", "beta")
        .select(col("step"), col("term"), round(col("beta"), 4).as("beta"))
        .orderBy("step", "term")
    }
  }

  val slopePathLassoOrtho: Q =
    lassoOrthoQuery("m_slope_path_lasso_ortho", forceFista = false)
  val slopePathLassoOrthoFista: Q =
    lassoOrthoQuery("m_slope_path_lasso_ortho_fista", forceFista = true)

  /** G2/G3/G4 HARD anchor: at a saturating σ the single feature is
    * penalized to exactly zero (strong rule + KKT), and the UNPENALIZED
    * intercept must land on the intercept-only MLE — closed form for every
    * family: logit(p̂₊) for binomial {−1,+1} (class names sorted, second
    * class is +1), ln(ȳ) for poisson, and ln(p̂_k/p̂_last) for
    * multinomial's m−1 logsumexp0 parametrization (last sorted class is
    * the implicit-zero reference). Mechanically the engine warm-starts
    * the intercept AT the family null MLE and FISTA's duality-gap
    * certificate confirms optimality there, so a pass certifies three
    * things at once: nullModelFromMeans is the EXACT closed form (this
    * query is what exposed the multinomial formula stalling at 0 — see
    * Family.scala), the primal/dual estimates agree to 1e-9 relative at
    * the true optimum (a broken dual would send FISTA wandering off it), and
    * screening/KKT hold the feature at exactly 0.0 (asserted
    * driver-side). Iterating-solver coverage for these families lives in
    * the glm-limit/Newton ScalaTest oracles; closed-form DuckDB rows from
    * exact integer class counts live here. sf0.01 values sit ≥1.6e-7
    * from every 1e-6 rounding boundary vs solver tol 1e-9 (see the
    * tolerance note below — 1e-12 was below the double-precision gap
    * floor at bench n and only ever exited through the stall guard).
    */
  val interceptMleFamilies: Q = {
    // 1e-9 keeps >100× margin under the 1.6e-7 boundary distance (the
    // docstring's rounding-margin argument) and lets the gap certificate
    // fire AT the warm-start MLE: at 1e-12 the binomial/multinomial gap
    // sits below the double-precision floor at this n, so both anchors
    // burned the full 30-iteration stall window making zero representable
    // progress (measured ×10: 64 data passes → 4, intercepts identical to
    // 12 digits, stallExit true → false — the exit is now the certificate,
    // not the floor guard)
    val tight = SolverConfig(tolAbs = 1e-13, tolRel = 1e-12,
      tolRelGap = 1e-9, tolInfeas = 1e-9)
    def cfg(fam: String) = SlopeConfig(family = fam, sigma = Array(1e6),
      lambdaType = "user",
      // the user λ sequence spans all penalized coefficients: p·m entries
      // (multinomial fits m−1 = 2 targets over the single feature)
      userLambda = Array.fill(if (fam == "multinomial") 2 else 1)(1.0),
      solver = tight)
    Q.sql(
      "m_intercept_mle_families",
      s"""WITH c AS (
         |  SELECT count(*)::DOUBLE AS n,
         |         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::DOUBLE AS na,
         |         sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)::DOUBLE AS nn,
         |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::DOUBLE AS nr,
         |         sum(l_quantity)::DOUBLE AS sq
         |  FROM lineitem)
         |SELECT * FROM (
         |  SELECT 'binomial' AS family, 'intercept' AS term,
         |         round(ln(nr/(n - nr)), 6) AS beta FROM c
         |  UNION ALL SELECT 'multinomial', 'A', round(ln(na/nr), 6) FROM c
         |  UNION ALL SELECT 'multinomial', 'N', round(ln(nn/nr), 6) FROM c
         |  UNION ALL SELECT 'poisson', 'intercept', round(ln(sq/n), 6) FROM c)
         |ORDER BY family, term""".stripMargin) { (s, dir) =>
      import s.implicits._
      val df = li(s, dir)
      val bin = SlopeEstimator.fit(
        df.withColumn("is_r",
          when(col("l_returnflag") === "R", "R").otherwise("NR")),
        Seq("l_tax"), "is_r", cfg("binomial")).coef().head
      val poi = SlopeEstimator.fit(
        df.withColumn("qty", col("l_quantity").cast("double")),
        Seq("l_tax"), "qty", cfg("poisson")).coef().head
      val mul = SlopeEstimator.fit(df, Seq("l_tax"), "l_returnflag",
        cfg("multinomial")).coef().head
      for (b <- Seq(bin, poi, mul); j <- 0 until b.cols)
        require(b(1, j) == 0.0,
          s"saturating sigma must zero the feature, got ${b(1, j)}")
      Seq(("binomial", "intercept", bin(0, 0)),
        ("multinomial", "A", mul(0, 0)),
        ("multinomial", "N", mul(0, 1)),
        ("poisson", "intercept", poi(0, 0)))
        .toDF("family", "term", "beta")
        .select(col("family"), col("term"), round(col("beta"), 6).as("beta"))
        .orderBy("family", "term")
    }
  }

  /** T1 mechanics HARD anchor: the CV machinery with the path fit swapped
    * for a FIXED β — fold assignment (the REAL `TrainSlope.foldExpr` md5
    * recipe), per-fold held-out scoring (mse/mae, decimal-exact), and the
    * mean/se/95% t-CI aggregation are then all SQL-expressible, so the one
    * CV piece no ScalaTest can cross-check against another engine — who
    * lands in which fold — gets a DuckDB row.
    */
  val cvFixedBeta: Q = {
    val (number, rep) = (3, 0)
    val (b0, b1, b2, b3) = (1000.0, 25.0, -2000.0, 1500.0)
    val tq = new org.apache.commons.math3.distribution.TDistribution(
      null, (number - 1).toDouble).inverseCumulativeProbability(0.975)
    Q.sql(
      "t1_cv_fixed_beta",
      s"""WITH e AS (
         |  SELECT l_orderkey * 10 + l_linenumber AS id,
         |         ($b0 + $b1*l_quantity + $b2*l_discount + $b3*l_tax) - l_extendedprice AS err
         |  FROM lineitem),
         |f AS (SELECT ('0x' || substr(md5(id::VARCHAR || ':$rep'), 1, 15))::BIGINT % $number AS fold,
         |             err
         |      FROM e),
         |s AS (SELECT fold,
         |             round(${Det.dsumSql("err*err", 4)} / count(*)::DOUBLE, 6) AS mse,
         |             round(${Det.dsumSql("abs(err)", 2)} / count(*)::DOUBLE, 6) AS mae
         |      FROM f GROUP BY fold),
         |u AS (SELECT 'mse' AS measure, mse AS value FROM s
         |      UNION ALL SELECT 'mae', mae FROM s),
         |a AS (SELECT measure, count(*)::DOUBLE AS n, avg(value) AS mean,
         |             stddev_samp(value) AS sd
         |      FROM u GROUP BY measure)
         |SELECT measure, round(mean, 4) AS mean,
         |       round(sd / sqrt(n), 4) AS se,
         |       round(mean - $tq * sd / sqrt(n), 4) AS lo,
         |       round(mean + $tq * sd / sqrt(n), 4) AS hi
         |FROM a ORDER BY measure""".stripMargin) { (s, dir) =>
      val e = Tables.spread(li(s, dir).select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        ((lit(b0) + lit(b1) * col("l_quantity") + lit(b2) * col("l_discount")
          + lit(b3) * col("l_tax")) - col("l_extendedprice")).as("err")))
      val perFold = e
        .select(TrainSlope.foldExpr("id", rep, number).as("fold"), col("err"))
        .groupBy("fold").agg(
          round(Det.dsum(col("err") * col("err"), 4)
            / count(lit(1)).cast("double"), 6).as("mse"),
          round(Det.dsum(abs(col("err")), 2)
            / count(lit(1)).cast("double"), 6).as("mae"))
      perFold
        .selectExpr("stack(2, 'mse', mse, 'mae', mae) as (measure, value)")
        .groupBy("measure").agg(
          count(lit(1)).cast("double").as("n"),
          avg(col("value")).as("mean"),
          stddev_samp(col("value")).as("sd"))
        .select(col("measure"),
          round(col("mean"), 4).as("mean"),
          round(col("sd") / sqrt(col("n")), 4).as("se"),
          round(col("mean") - lit(tq) * col("sd") / sqrt(col("n")), 4).as("lo"),
          round(col("mean") + lit(tq) * col("sd") / sqrt(col("n")), 4).as("hi"))
        .orderBy("measure")
    }
  }

  /** T1: repeated k-fold CV over the path (deterministic salted-hash
    * folds). Iterative fitting — rows-only for the summary values, but NO
    * LONGER uncertified: every internal fit (each CV cell AND the full-data
    * refit) runs with `kktExport` and must pass the per-step SLOPE KKT
    * certificate before the summary is returned — the same machine-checked
    * exit gate as [[pathToDf]]. The fold/grid mechanics are pinned by
    * TrainSlopeSpec and the `t1_cv_fixed_beta` oracle; the certified
    * verdict table itself is DuckDB-pinned by `t1_train_cv_kkt`.
    */
  val trainCv: Q = Q.rowsOnly("t1_train_cv_gaussian") { (s, dir) =>
    val df = li(s, dir)
      .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber"))
    // FISTA forced: its exit criterion IS the dual-infeasibility bound the
    // certificate checks, so every cell is certifiable at 3×tolInfeas. ADMM
    // stops on primal/dual residuals — at the smallest σ of a grid fixed by
    // the FULL data, a fold's ADMM exit can sit above the certificate
    // threshold (observed in TrainSlopeSpec) without being wrong.
    val t = TrainSlope.train(df, features, label, "id",
      qs = Seq(0.1), number = 3,
      cfg = SlopeConfig(nSigma = 8, kktExport = true, maxGramCols = 0))
    certifyCv(s, t)
    TrainSlope.summaryDf(s, t)
  }

  /** Gate every fit a [[TrainSlope.TrainedSlope]] ran (full-data + cells)
    * through [[KktCertificate.verdictDf]] at the [[pathToDf]] tolerance —
    * ONE Spark job for all fits (the per-fit verdict frames are a few rows
    * each; a collect per fit would pay 4× the job-launch floor).
    */
  private def certifyCv(s: SparkSession, t: TrainSlope.TrainedSlope): Unit = {
    val tolCert = 3.0 * SolverConfig().tolInfeas
    val fits = ("full", t.model.fit) +:
      t.cellFits.map { case ((rep, fold, _), f) => (s"rep${rep}_fold$fold", f) }
    val bad = fits.map { case (cell, f) =>
      KktCertificate.verdictDf(s, f, tolCert).withColumn("cell", lit(cell))
    }.reduce(_.unionByName(_))
      .collect().filterNot(r => r.getBoolean(1) && r.getBoolean(2))
    require(bad.isEmpty,
      s"CV fits failed their KKT certificate at " +
        bad.map(r => s"${r.getString(3)}/step${r.getInt(0)}").mkString(",") +
        s" (tol $tolCert)")
  }

  /** T1 optimality CERTIFICATES, DuckDB-pinned: the CV driver on a USER σ
    * grid (fixed ratios of the probed σmax, so the kept-step count is
    * forced) with `kktExport` threaded through every cell — the full-data
    * refit and all `number` fold fits each re-verify the SLOPE KKT
    * conditions per step in window SQL, and the oracle pins the complete
    * verdict table (every cell × every step certified, grounded by
    * `n_rows`). Fold membership is the deterministic md5 salt
    * (`TrainSlope.foldExpr`, itself oracled by `t1_cv_fixed_beta`), so the
    * cell set is engine-independent. This closes the round-7 gap: the CV
    * query's internal solver output was the last thing nothing re-verified.
    * Same forced-FISTA recipe as the `m_slope_path_kkt_*` queries.
    */
  val trainCvKkt: Q = {
    val ratios = Array(0.5, 0.15, 0.02)
    val number = 3
    val tolCert = 1e-6
    val solver = SolverConfig(tolRelGap = 1e-8, tolInfeas = 1e-8)
    val cellNames = "full" +: (0 until number).map(f => s"rep0_fold$f")
    val valuesSql = (for {
      c <- cellNames
      (r, i) <- ratios.zipWithIndex
    } yield s"('$c', $i, ${r}::DOUBLE, true, true)").mkString(", ")
    Q.sql("t1_train_cv_kkt",
      s"""SELECT v.cell, v.step, v.sigma_ratio, v.kkt_ok, v.sign_ok, n.n_rows
         |FROM (VALUES $valuesSql) v(cell, step, sigma_ratio, kkt_ok, sign_ok)
         |CROSS JOIN (SELECT count(*) AS n_rows FROM lineitem) n
         |ORDER BY v.cell, v.step""".stripMargin) { (s, dir) =>
      import s.implicits._
      val df = li(s, dir)
        .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber"))
      // the FULL fit resolves the ratio grid against its own σmax; each CV
      // cell then inherits the full fit's ABSOLUTE σ grid (TrainSlope sets
      // cfg.sigma, which takes precedence over sigmaRatios) — exactly the
      // trainOwl contract: one grid for every cell
      val t = TrainSlope.train(df, features, label, "id",
        qs = Seq(0.1), number = number,
        cfg = SlopeConfig(sigmaRatios = ratios, kktExport = true,
          maxGramCols = 0, solver = solver))
      val fits = ("full", t.model.fit) +:
        t.cellFits.map { case ((rep, fold, _), f) => (s"rep${rep}_fold$fold", f) }
      require(fits.length == cellNames.length,
        s"expected ${cellNames.length} certified fits, got ${fits.length}")
      fits.foreach { case (cell, f) =>
        require(f.kktState.length == ratios.length,
          s"cell $cell: expected ${ratios.length} certified steps, " +
            s"got ${f.kktState.length}")
      }
      val verdicts = fits.map { case (cell, f) =>
        KktCertificate.verdictDf(s, f, tolCert).withColumn("cell", lit(cell))
      }.reduce(_.unionByName(_))
      val nRows = li(s, dir).count()
      val ratioDf = ratios.zipWithIndex.map { case (r, i) => (i, r) }.toSeq
        .toDF("step", "sigma_ratio")
      verdicts.join(ratioDf, Seq("step"))
        .select(col("cell"), col("step"), col("sigma_ratio"),
          col("kkt_ok"), col("sign_ok"), lit(nRows).as("n_rows"))
        .orderBy("cell", "step")
    }
  }

  /** F1/F9/F12/F13 per-step optimality CERTIFICATES for the real iterative
    * path fits — the piece no closed form can pin. Every kept step exports
    * its full-space gradient, standardized β and absolute λ·σ
    * ([[graft.fit.KktCertificate]]), and the SLOPE KKT conditions
    * (reference src/infeasibility.h:8-12 + src/kktCheck.h:8-37:
    * max cumsum(sort(|∇|, desc) − λ) ≤ max(√eps, tol·λ₀), and
    * sign(−∇_j) = sign(β_j) on the support) are re-verified by Spark SQL
    * window functions — a different substrate than the solver. A
    * user-supplied σ grid (fixed ratios of the probed σmax) forces the
    * step count, so the DuckDB oracle pins the full verdict table: exactly
    * `ratios.length` steps, every one certified, grounded to the fixture by
    * `n_rows`. A solver/screening/warm-start regression that leaves any
    * step short of optimality flips a boolean → hash mismatch.
    *
    * FISTA is forced (`maxGramCols = 0`) so all four families run the
    * solver whose convergence test IS the dual-infeasibility bound; solver
    * tolerances are tightened to hold the certificate at `tolCert` with
    * ~100× margin (measured at sf0.01: worst step infeas/λ₀ ≲ 1e-9).
    */
  private def kktCertQuery(qname: String, famName: String): Q = {
    val ratios = Array(0.7, 0.35, 0.15, 0.05, 0.01)
    val tolCert = 1e-6
    // the certificate bounds INFEASIBILITY (and signs); tolInfeas is the
    // binding solver criterion at 100× margin under tolCert. The duality
    // gap only needs to be tight enough that the momentum iterate has
    // settled — 1e-8 measured ~2× fewer FISTA passes than 1e-10, and 1e-7
    // another 1.6× under it (multinomial ×10: 201 → 125 data passes) with
    // identical verdicts and exported-gradient infeasibility exactly 0 at
    // every step; 1e-6 changes nothing further (feasibility binds below
    // 1e-7), so 1e-7 is the whole gain with a tier of slack kept
    val solver = SolverConfig(tolRelGap = 1e-7, tolInfeas = 1e-8)
    val valuesSql = ratios.zipWithIndex
      .map { case (r, i) => s"($i, ${r}::DOUBLE, true, true)" }.mkString(", ")
    Q.sql(qname,
      s"""SELECT v.step, v.sigma_ratio, v.kkt_ok, v.sign_ok, n.n_rows
         |FROM (VALUES $valuesSql) v(step, sigma_ratio, kkt_ok, sign_ok)
         |CROSS JOIN (SELECT count(*) AS n_rows FROM lineitem) n
         |ORDER BY v.step""".stripMargin) { (s, dir) =>
      import s.implicits._
      val base = li(s, dir)
      val (df, feats, lab) = famName match {
        case "gaussian" => (base, features, label)
        case "binomial" =>
          (base.withColumn("is_r",
            when(col("l_returnflag") === "R", "R").otherwise("NR")),
            features, "is_r")
        case "multinomial" => (base, features, "l_returnflag")
        case "poisson" =>
          (base.withColumn("qty", col("l_quantity").cast("double")),
            Seq("l_discount", "l_tax", "l_extendedprice"), "qty")
      }
      // σ grid as RATIOS of σmax, resolved inside the path driver from the
      // λmax pass it runs anyway (`SlopeConfig.sigmaRatios`) — user-σ
      // semantics, so the kept-step count is exactly ratios.length. (The
      // previous separate nSigma=1 probe fit paid a full standardize +
      // collect + solve just to read σmax.)
      val model = SlopeEstimator.fit(df, feats, lab,
        SlopeConfig(family = famName, sigmaRatios = ratios,
          kktExport = true, maxGramCols = 0, solver = solver))
      require(model.fit.kktState.length == ratios.length,
        s"expected ${ratios.length} certified steps, got ${model.fit.kktState.length}")
      val verdict = KktCertificate.verdictDf(s, model.fit, tolCert)
      val nRows = base.count()
      val ratioDf = ratios.zipWithIndex.map { case (r, i) => (i, r) }.toSeq
        .toDF("step", "sigma_ratio")
      verdict.join(ratioDf, Seq("step"))
        .select(col("step"), col("sigma_ratio"), col("kkt_ok"), col("sign_ok"),
          lit(nRows).as("n_rows"))
        .orderBy("step")
    }
  }

  val slopePathKktGaussian: Q = kktCertQuery("m_slope_path_kkt_gaussian", "gaussian")
  val slopePathKktBinomial: Q = kktCertQuery("m_slope_path_kkt_binomial", "binomial")
  val slopePathKktMultinomial: Q =
    kktCertQuery("m_slope_path_kkt_multinomial", "multinomial")
  val slopePathKktPoisson: Q = kktCertQuery("m_slope_path_kkt_poisson", "poisson")

  val queries: Seq[Q] = Seq(
    standardizeStats, lambdaMaxGaussian, sigmaGridGaussian, scoreFixedBeta,
    aucFixedScore, aucWeighted, gradientUdaf, slopePathGaussian, slopePathBinomial,
    slopePathMultinomial, slopePathPoisson, slopeSigma0Gaussian,
    slopePathLassoOrtho, slopePathLassoOrthoFista, interceptMleFamilies,
    cvFixedBeta, trainCv, trainCvKkt, slopePathKktGaussian, slopePathKktBinomial,
    slopePathKktMultinomial, slopePathKktPoisson)
}
