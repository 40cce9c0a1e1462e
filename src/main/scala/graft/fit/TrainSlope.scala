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

  final case class CellScore(q: Double, sigmaIndex: Int, sigma: Double,
                             fold: Int, rep: Int, measure: String, value: Double)

  final case class TrainedSlope(
      summary: Seq[(Double, Int, Double, String, Double, Double, Double, Double)],
      // (q, sigma_index, sigma, measure, mean, se, lo, hi)
      optima: Map[String, (Double, Double, Double)], // measure -> (q, sigma, best mean)
      model: SlopeModel,
      raw: Seq[CellScore])

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
    val fullModel = SlopeEstimator.fit(df, featureCols, labelCol, cfg)
    val sigma = fullModel.fit.sigma
    val ms = if (measures.nonEmpty) measures else defaultMeasures(cfg.family)
    val ok = defaultMeasures(cfg.family)
    val used = ms.filter(ok.contains)
    require(used.nonEmpty, s"no valid measure among $ms for family ${cfg.family}")

    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cells = for {
      rep <- 0 until repeats
      fold <- 0 until number
      q <- qs
    } yield (rep, fold, q)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cells.length, 4)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futures = cells.map { case (rep, fold, q) =>
        scala.concurrent.Future {
          // deterministic salted-hash fold id (murmur3 of (id, rep))
          val foldCol = pmod(hash(col(idCol), lit(rep)), lit(number))
          val train = cached.filter(foldCol =!= fold)
          val test = cached.filter(foldCol === fold)
          val m = SlopeEstimator.fit(train, featureCols, labelCol,
            cfg.copy(sigma = sigma, q = q))
          used.map(meas => meas -> m.score(test, featureCols, labelCol, meas))
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
      val raw = for {
        ((rep, fold, q), scores) <- cells.zip(results)
        (meas, vals) <- scores
        k <- vals.indices
      } yield CellScore(q, k, sigma(k), fold, rep, meas, vals(k))

      val grouped = raw.groupBy(c => (c.q, c.sigmaIndex, c.measure))
      val tDist = new org.apache.commons.math3.distribution.TDistribution(null,
        math.max(number * repeats - 1, 1).toDouble)
      val tq = tDist.inverseCumulativeProbability(0.975)
      val summary = grouped.toSeq.map { case ((q, k, meas), cells) =>
        val vals = cells.map(_.value)
        val n = vals.length
        val mean = vals.sum / n
        val sd = if (n > 1)
          math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1)) else 0.0
        val se = sd / math.sqrt(n.toDouble)
        (q, k, cells.head.sigma, meas, mean, se, mean - tq * se, mean + tq * se)
      }.sortBy(t => (t._4, t._1, t._2))

      val optima = used.map { meas =>
        val rows = summary.filter(_._4 == meas)
        val best = if (meas == "auc") rows.maxBy(_._5) else rows.minBy(_._5)
        meas -> (best._1, best._3, best._5)
      }.toMap

      TrainedSlope(summary, optima, fullModel, raw)
    } finally {
      pool.shutdown()
      cached.unpersist(blocking = false)
    }
  }

  /** CV summary as a DataFrame (the reference's TrainedOwl$summary). */
  def summaryDf(spark: SparkSession, t: TrainedSlope): DataFrame = {
    import spark.implicits._
    t.summary.toDF("q", "sigma_index", "sigma", "measure", "mean", "se", "lo", "hi")
  }
}
