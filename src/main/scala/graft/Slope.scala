package graft

import org.apache.spark.sql.DataFrame
import graft.fit._

/** Public facade — the `owl()` front door of the engine
  * (reference R/owl.R:271). Typical use:
  *
  * {{{
  * import graft.Slope
  * val model = Slope.fit(df, Seq("x1", "x2"), "y")                  // gaussian
  * val cls   = Slope.fit(df, Seq("x1"), "label",
  *               Slope.config(family = "binomial", nSigma = 50))
  * val preds = cls.transform(df, Seq("x1"), predictType = "class")
  * val auc   = cls.score(df, Seq("x1"), "label", "auc")
  * val cv    = Slope.crossValidate(df, Seq("x1", "x2"), "y", idCol = "id")
  * }}}
  */
object Slope {

  def config(family: String = "gaussian",
             intercept: Boolean = true,
             nSigma: Int = 100,
             sigma: Array[Double] = Array.empty,
             lambdaType: String = "gaussian",
             q: Double = -1.0,
             screening: Boolean = true): SlopeConfig =
    SlopeConfig(family = family, intercept = intercept, nSigma = nSigma,
      sigma = sigma, lambdaType = lambdaType, q = q, screening = screening)

  /** Fit a SLOPE path. `featureCols` may be scalar numeric columns or one
    * `ml.linalg.Vector` column.
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          cfg: SlopeConfig = SlopeConfig()): SlopeModel =
    SlopeEstimator.fit(df, featureCols, labelCol, cfg)

  /** Exact-coefficient refit (reference R/coef.R:37-47, `exact = TRUE`):
    * instead of interpolating between stored path steps, refit with the σ
    * grid pinned to exactly the requested values. Needs the data again —
    * a Spark model doesn't retain its training DataFrame, so exactness is
    * a facade-level operation here rather than a model method.
    */
  def coefExact(df: DataFrame, featureCols: Seq[String], labelCol: String,
                sigmas: Array[Double],
                cfg: SlopeConfig = SlopeConfig()): IndexedSeq[breeze.linalg.DenseMatrix[Double]] =
    fit(df, featureCols, labelCol, cfg.copy(sigma = sigmas)).coef(sigmas)

  /** Repeated k-fold cross-validation (the reference's trainOwl). */
  def crossValidate(df: DataFrame, featureCols: Seq[String], labelCol: String,
                    idCol: String,
                    qs: Seq[Double] = Seq(0.2),
                    number: Int = 10,
                    repeats: Int = 1,
                    cfg: SlopeConfig = SlopeConfig()): TrainSlope.TrainedSlope =
    TrainSlope.train(df, featureCols, labelCol, idCol, qs, number, repeats,
      cfg = cfg)

  def save(model: SlopeModel, path: String)(implicit
      spark: org.apache.spark.sql.SparkSession): Unit =
    ModelIO.save(spark, model, path)

  def load(path: String)(implicit
      spark: org.apache.spark.sql.SparkSession): SlopeModel =
    ModelIO.load(spark, path)
}
