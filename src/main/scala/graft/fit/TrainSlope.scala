package graft.fit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.slope._

/** Repeated k-fold cross-validation over the SLOPE path — the reference's
  * `trainOwl` (R/trainOwl.R:44-201) re-expressed for the cluster:
  *
  * - The initial full-data fit fixes the σ grid for every cell
  *   (trainOwl.R:69,84).
  * - Fold assignment is a SALTED HASH of a caller-named id column —
  *   deterministic, shuffle-free, reproducible across runs and cluster
  *   layouts (declared spec, replacing the reference's R-RNG row shuffle;
  *   SURVEY.md §7 hard part 5).
  * - The reference parallelizes across (q, fold, repeat) cells and
  *   serializes over rows (PSOCK workers); at cluster scale that inverts:
  *   each cell is a distributed path fit over the shared cached data
  *   (row-level parallelism), with a BOUNDED pool of concurrent cells on
  *   top — a cell alternates between cluster passes and driver-side solver
  *   phases, so a few in-flight cells keep the cluster busy where one
  *   leaves it idle half the time (trainOwl.R:125-144 parLapply analogue;
  *   inversion note in SURVEY §3.3). Cell results assemble in grid order,
  *   so concurrency never changes the output.
  * - Aggregation: mean / se / 95% t-CI per (q, σ, measure)
  *   (trainOwl.R:146-161), optima per measure (:163-166), plus the
  *   full-data model.
  */
object TrainSlope {

  /** Deterministic fold id: 60-bit md5 of "id:rep" mod `number` — the Det
    * recipe, so fold membership is reproducible on ANY engine (the DuckDB
    * oracle `t1_cv_fixed_beta` checks it), any cluster layout and any
    * Spark version. (The previous murmur3 `hash()` was layout-stable but
    * Spark-internal — no other engine could replay the assignment.)
    */
  def foldExpr(idCol: String, rep: Int, number: Int): org.apache.spark.sql.Column =
    pmod(graft.util.Det.md5Hash60(
      concat(col(idCol).cast("string"), lit(":"), lit(rep.toString))),
      lit(number.toLong))

  final case class CellScore(q: Double, sigmaIndex: Int, sigma: Double,
                             fold: Int, rep: Int, measure: String, value: Double)

  final case class TrainedSlope(
      summary: Seq[(Double, Int, Double, String, Double, Double, Double, Double)],
      // (q, sigma_index, sigma, measure, mean, se, lo, hi)
      optima: Map[String, (Double, Double, Double)], // measure -> (q, sigma, best mean)
      model: SlopeModel,
      raw: Seq[CellScore],
      /** Per-CELL path fits, keyed (rep, fold, q), kept ONLY when
        * `cfg.kktExport` is on so each cell's solver output can be
        * re-verified by [[KktCertificate.verdictDf]] — the same per-step
        * optimality gate the path queries use. (The full-data fit's
        * certificate state lives in `model.fit.kktState`.) The retained
        * state is tiny: per kept σ step one p×m gradient, one p×m β and the
        * λ vector — driver-bounded by p·m·steps doubles, NOT by n.
        */
      cellFits: Seq[((Int, Int, Double), SlopeFit)] = Seq.empty)

  def defaultMeasures(family: String): Seq[String] = family match {
    case "binomial"    => Seq("mse", "mae", "deviance", "misclass", "auc")
    case "multinomial" => Seq("mse", "mae", "deviance")
    case _             => Seq("mse", "mae")
  }

  def train(df: DataFrame,
            featureCols: Seq[String],
            labelCol: String,
            idCol: String,
            qs: Seq[Double] = Seq(0.2),
            number: Int = 10,
            repeats: Int = 1,
            measures: Seq[String] = Seq.empty,
            cfg: SlopeConfig = SlopeConfig()): TrainedSlope = {
    require(number > 1, "need at least 2 folds")
    val ms = if (measures.nonEmpty) measures else defaultMeasures(cfg.family)
    val ok = defaultMeasures(cfg.family)
    val used = ms.filter(ok.contains)
    require(used.nonEmpty, s"no valid measure among $ms for family ${cfg.family}")

    val cells = for {
      rep <- 0 until repeats
      fold <- 0 until number
      q <- qs
    } yield (rep, fold, q)

    trainLocal(df, featureCols, labelCol, idCol, qs, number, repeats, used,
      cells, cfg)
      .getOrElse(trainDistributed(df, featureCols, labelCol, idCol, number,
        repeats, used, cells, cfg))
  }

  /** Sub-threshold fast path: ONE flat collect brings the encoded rows plus
    * the per-repeat fold hashes to the driver; the full fit, every cell fit
    * and all scoring run in memory (the reference's own execution shape for
    * data this size). Falls back to the distributed path when the data is
    * over `localFitThreshold` or the features are an assembled vector.
    */
  private def trainLocal(df: DataFrame, featureCols: Seq[String],
                         labelCol: String, idCol: String, qs: Seq[Double],
                         number: Int, repeats: Int, used: Seq[String],
                         cells: Seq[(Int, Int, Double)],
                         cfg: SlopeConfig): Option[TrainedSlope] = {
    val family = Family(cfg.family)
    val vectorInput = featureCols.length == 1 &&
      df.schema(featureCols.head).dataType ==
        org.apache.spark.ml.linalg.SQLDataTypes.VectorType
    if (vectorInput ||
        !SlopeEstimator.localPathTypesOk(df, featureCols.toArray, labelCol, family))
      return None
    val p = featureCols.length
    // cheap size gate FIRST — over-threshold data must not pay the label
    // distinct before falling back to the distributed path
    val n = df.count()
    if (n == 0 || n * p > cfg.effectiveLocalFitThreshold || n > Int.MaxValue) return None
    val classNames = SlopeEstimator.classNamesFor(df, labelCol, family)
    val mTargets = family match {
      case Multinomial => classNames.length - 1
      case _           => 1
    }
    val stringLabel = family == Binomial || family == Multinomial
    val labelExpr =
      if (stringLabel) col(labelCol).cast("string") else col(labelCol).cast("double")
    // deterministic salted-hash fold ids computed ENGINE-side so local and
    // distributed paths assign identical folds
    val foldExprs = (0 until repeats).map(rep =>
      foldExpr(idCol, rep, number).cast("double"))
    val pruned = df.select(
      labelExpr +: (featureCols.map(c => col(c).cast("double")) ++ foldExprs): _*)

    val pw = p + repeats
    val (yFlat, xfFlat) =
      SlopeEstimator.collectFlat(pruned, family, classNames, mTargets, pw)
    val nI = n.toInt
    val x = new Array[Double](nI * p)
    val folds = Array.ofDim[Int](repeats, nI)
    var i = 0
    while (i < nI) {
      System.arraycopy(xfFlat, i * pw, x, i * p, p)
      var r = 0
      while (r < repeats) { folds(r)(i) = xfFlat(i * pw + p + r).toInt; r += 1 }
      i += 1
    }
    val names = featureCols.toArray
    val fullModel = SlopeEstimator.fitLocalArrays(yFlat, x, nI, family,
      mTargets, p, names, classNames, cfg)
    val sigma = fullModel.fit.sigma

    val results = cells.map { case (rep, fold, q) =>
      val f = folds(rep)
      var nTrain = 0
      var r = 0
      while (r < nI) { if (f(r) != fold) nTrain += 1; r += 1 }
      val nTest = nI - nTrain
      // fail loudly, not with NaN means and corrupt optima downstream
      require(nTest > 0,
        s"fold $fold of repeat $rep has no test rows (n=$nI, number=$number); use fewer folds")
      require(nTrain > 0,
        s"fold $fold of repeat $rep has no training rows (n=$nI, number=$number)")
      val yTr = new Array[Double](nTrain * mTargets)
      val xTr = new Array[Double](nTrain * p)
      val yTe = new Array[Double](nTest * mTargets)
      val xTe = new Array[Double](nTest * p)
      var it = 0; var ie = 0
      r = 0
      while (r < nI) {
        if (f(r) != fold) {
          System.arraycopy(yFlat, r * mTargets, yTr, it * mTargets, mTargets)
          System.arraycopy(x, r * p, xTr, it * p, p)
          it += 1
        } else {
          System.arraycopy(yFlat, r * mTargets, yTe, ie * mTargets, mTargets)
          System.arraycopy(x, r * p, xTe, ie * p, p)
          ie += 1
        }
        r += 1
      }
      val m = SlopeEstimator.fitLocalArrays(yTr, xTr, nTrain, family, mTargets,
        p, names, classNames, cfg.copy(sigma = sigma, q = q))
      (used.map(meas => meas -> LocalScore.score(m, yTe, xTe, nTest, p, meas)),
        if (cfg.kktExport) Some(m.fit) else None)
    }
    Some(assemble(cells, results.map(_._1), sigma, used, fullModel, number,
      repeats, cellFits(cells, results.map(_._2))))
  }

  /** Over-threshold path: per-cell distributed fits over the shared cached
    * data with a BOUNDED pool of concurrent cells (see object Scaladoc).
    */
  private def trainDistributed(df: DataFrame, featureCols: Seq[String],
                               labelCol: String, idCol: String, number: Int,
                               repeats: Int, used: Seq[String],
                               cells: Seq[(Int, Int, Double)],
                               cfg: SlopeConfig): TrainedSlope = {
    val fullModel = SlopeEstimator.fit(df, featureCols, labelCol, cfg)
    val sigma = fullModel.fit.sigma
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cells.length, 4)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val sc = df.sparkSession.sparkContext
      val futures = cells.map { case (rep, fold, q) =>
        scala.concurrent.Future {
          // each cell's jobs go to their own FAIR pool (sessionConfigs sets
          // spark.scheduler.mode=FAIR): concurrent path fits then share the
          // cluster round-robin instead of queueing whole stages FIFO, so
          // no cell's solver passes starve behind another's — the engine's
          // analogue of the reference's parLapply over grid cells
          // (R/trainOwl.R:134-144). Output is concurrency-invariant:
          // `assemble` reorders by grid position.
          sc.setLocalProperty("spark.scheduler.pool", s"cv-$rep-$fold-$q")
          try {
            // deterministic salted-hash fold id (shared with trainLocal)
            val foldCol = foldExpr(idCol, rep, number)
            val train = cached.filter(foldCol =!= fold)
            val test = cached.filter(foldCol === fold)
            val m = SlopeEstimator.fit(train, featureCols, labelCol,
              cfg.copy(sigma = sigma, q = q))
            (used.map(meas => meas -> m.score(test, featureCols, labelCol, meas)),
              if (cfg.kktExport) Some(m.fit) else None)
          } finally sc.setLocalProperty("spark.scheduler.pool", null)
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
      assemble(cells, results.map(_._1), sigma, used, fullModel, number,
        repeats, cellFits(cells, results.map(_._2)))
    } finally {
      pool.shutdown()
      cached.unpersist(blocking = false)
    }
  }

  private def cellFits(cells: Seq[(Int, Int, Double)],
                       fits: Seq[Option[SlopeFit]]): Seq[((Int, Int, Double), SlopeFit)] =
    cells.zip(fits).collect { case (key, Some(f)) => (key, f) }

  /** Grid-order assembly of per-cell scores into summary/optima — shared by
    * both substrates so concurrency and locality never change the output.
    */
  private def assemble(cells: Seq[(Int, Int, Double)],
                       results: Seq[Seq[(String, Array[Double])]],
                       sigma: Array[Double], used: Seq[String],
                       fullModel: SlopeModel, number: Int,
                       repeats: Int,
                       fits: Seq[((Int, Int, Double), SlopeFit)] = Seq.empty): TrainedSlope = {
    val raw = for {
      ((rep, fold, q), scores) <- cells.zip(results)
      (meas, vals) <- scores
      k <- vals.indices
    } yield CellScore(q, k, sigma(k), fold, rep, meas, vals(k))

    val grouped = raw.groupBy(c => (c.q, c.sigmaIndex, c.measure))
    val tDist = new org.apache.commons.math3.distribution.TDistribution(null,
      math.max(number * repeats - 1, 1).toDouble)
    val tq = tDist.inverseCumulativeProbability(0.975)
    val summary = grouped.toSeq.map { case ((q, k, meas), cs) =>
      val vals = cs.map(_.value)
      val n = vals.length
      val mean = vals.sum / n
      val sd = if (n > 1)
        math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1)) else 0.0
      val se = sd / math.sqrt(n.toDouble)
      (q, k, cs.head.sigma, meas, mean, se, mean - tq * se, mean + tq * se)
    }.sortBy(t => (t._4, t._1, t._2))

    val optima = used.map { meas =>
      val rows = summary.filter(_._4 == meas)
      val best = if (meas == "auc") rows.maxBy(_._5) else rows.minBy(_._5)
      meas -> (best._1, best._3, best._5)
    }.toMap

    TrainedSlope(summary, optima, fullModel, raw, fits)
  }

  /** CV summary as a DataFrame (the reference's TrainedOwl$summary). */
  def summaryDf(spark: SparkSession, t: TrainedSlope): DataFrame = {
    import spark.implicits._
    t.summary.toDF("q", "sigma_index", "sigma", "measure", "mean", "se", "lo", "hi")
  }
}
