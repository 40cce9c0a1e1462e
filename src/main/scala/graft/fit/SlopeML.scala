package graft.fit

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** `spark.ml` Pipeline adapter — the engine's analogue of the reference's
  * caret integration (`R/caretOwl.R:15-269`, SURVEY §2.4 T2): the tuning
  * contract there (tuning grid from an initial path fit, the "submodels"
  * trick reusing one path fit for every σ, predict/prob hooks) maps onto
  * the ml `Estimator`/`Params`/`Model` surface, where the path fit already
  * yields all σ in one pass and `sigmaIndex` selects a submodel.
  *
  * Usage: `new SlopeML().setFeaturesCol("fv").setLabelCol("y")` in an
  * `ml.Pipeline` after a `VectorAssembler`. With `sigmaIndex >= 0` the
  * prediction column is FLAT (double for regression/probability, string for
  * class) so stock evaluators — and therefore `CrossValidator` /
  * `TrainValidationSplit` — consume it directly; with the default −1 the
  * column holds the whole path (n_sigma × m nested arrays), the engine's
  * native all-submodels form.
  */
class SlopeML(override val uid: String) extends Estimator[SlopeMLModel]
  with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("slope"))

  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "assembled features column (VectorUDT)")
  final val labelCol: Param[String] =
    new Param[String](this, "labelCol", "label column")
  final val predictionCol: Param[String] =
    new Param[String](this, "predictionCol", "output column")
  final val family: Param[String] = new Param[String](this, "family",
    "gaussian | binomial | poisson | multinomial",
    ParamValidators.inArray(Array("gaussian", "binomial", "poisson", "multinomial")))
  final val nSigma: IntParam =
    new IntParam(this, "nSigma", "path length", ParamValidators.gt(0))
  final val q: DoubleParam =
    new DoubleParam(this, "q", "BH false-discovery parameter (<=0 = auto)")
  final val fitIntercept: BooleanParam =
    new BooleanParam(this, "fitIntercept", "fit an intercept")
  final val center: BooleanParam =
    new BooleanParam(this, "center", "center features")
  final val scale: Param[String] = new Param[String](this, "scale",
    "feature scaling: l2 | l1 | sd | max | none",
    ParamValidators.inArray(Array("l2", "l1", "sd", "max", "none")))
  final val predictType: Param[String] = new Param[String](this, "predictType",
    "link | response | class",
    ParamValidators.inArray(Array("link", "response", "class")))
  final val sigmaIndex: IntParam = new IntParam(this, "sigmaIndex",
    "path step for a flat prediction column (-1 = whole path, nested)")

  setDefault(featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", family -> "gaussian", nSigma -> 20,
    q -> -1.0, fitIntercept -> true, center -> true, scale -> "l2",
    predictType -> "link", sigmaIndex -> -1)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setFamily(v: String): this.type = set(family, v)
  def setNSigma(v: Int): this.type = set(nSigma, v)
  def setQ(v: Double): this.type = set(q, v)
  def setFitIntercept(v: Boolean): this.type = set(fitIntercept, v)
  def setCenter(v: Boolean): this.type = set(center, v)
  def setScale(v: String): this.type = set(scale, v)
  def setPredictType(v: String): this.type = set(predictType, v)
  def setSigmaIndex(v: Int): this.type = set(sigmaIndex, v)

  private[fit] def config: SlopeConfig = SlopeConfig(
    family = $(family), intercept = $(fitIntercept), center = $(center),
    scale = $(scale), nSigma = $(nSigma), q = $(q))

  override def fit(dataset: Dataset[_]): SlopeMLModel = {
    val inner = SlopeEstimator.fit(dataset.toDF(), Seq($(featuresCol)),
      $(labelCol), config)
    val m = new SlopeMLModel(uid, inner)
    copyValues(m).setParent(this)
  }

  override def copy(extra: ParamMap): SlopeML = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(featuresCol)).dataType == SQLDataTypes.VectorType,
      s"${$(featuresCol)} must be a VectorUDT column (use VectorAssembler)")
    SlopeMLModel.outputSchema(schema, $(predictionCol), $(predictType),
      $(sigmaIndex), multiTarget = $(family) == "multinomial")
  }
}

/** Params-only persistence: an unfitted `SlopeML` saves/loads inside a
  * stock `ml.Pipeline` via the standard params writer.
  */
object SlopeML extends DefaultParamsReadable[SlopeML]

/** Fitted Pipeline model wrapping [[SlopeModel]]. */
class SlopeMLModel private[fit] (override val uid: String,
                                 val slopeModel: SlopeModel)
  extends Model[SlopeMLModel] with MLWritable {

  // params mirror the estimator's prediction-surface subset (copied by fit)
  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "assembled features column")
  final val labelCol: Param[String] =
    new Param[String](this, "labelCol", "label column")
  final val predictionCol: Param[String] =
    new Param[String](this, "predictionCol", "output column")
  final val family: Param[String] = new Param[String](this, "family", "family")
  final val nSigma: IntParam = new IntParam(this, "nSigma", "path length")
  final val q: DoubleParam = new DoubleParam(this, "q", "BH parameter")
  final val fitIntercept: BooleanParam =
    new BooleanParam(this, "fitIntercept", "fit an intercept")
  final val center: BooleanParam = new BooleanParam(this, "center", "center")
  final val scale: Param[String] = new Param[String](this, "scale", "scaling")
  final val predictType: Param[String] =
    new Param[String](this, "predictType", "link | response | class")
  final val sigmaIndex: IntParam =
    new IntParam(this, "sigmaIndex", "path step for a flat column")
  setDefault(featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", family -> "gaussian", nSigma -> 20,
    q -> -1.0, fitIntercept -> true, center -> true, scale -> "l2",
    predictType -> "link", sigmaIndex -> -1)

  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setPredictType(v: String): this.type = set(predictType, v)
  def setSigmaIndex(v: Int): this.type = set(sigmaIndex, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val df = dataset.toDF()
    val out = $(predictionCol)
    val full = slopeModel.transform(df, Seq($(featuresCol)), out,
      predictType = $(predictType))
    val k = $(sigmaIndex)
    if (k < 0) full
    else {
      require(k < slopeModel.fit.sigma.length,
        s"sigmaIndex $k out of range (path has ${slopeModel.fit.sigma.length} steps)")
      // flatten to an evaluator-consumable column: double for single-target
      // numeric predictions, string for class labels. Multinomial keeps the
      // per-class array — collapsing it to element 0 would silently emit
      // only the first class's probability as "the" prediction
      val step = col(out).getItem(k)
      val flat =
        if ($(predictType) == "class") step
        else if (multiTarget) step
        else step.getItem(0)
      full.withColumn(out, flat)
    }
  }

  /** More than one numeric prediction per row (multinomial response/link). */
  private def multiTarget: Boolean =
    slopeModel.fit.betas.headOption.exists(_.cols > 1)

  /** caret `varImp` hook (reference R/caretOwl.R:228-244): per-feature
    * importance = |β| at ONE path step — the interpolated coefficients when
    * `sigma` is given, else the model's `sigmaIndex` submodel (the analogue
    * of caret's `sigmaOpt` fallback; an unset index errors like the
    * reference's "must supply a value of sigma"). The intercept row is
    * excluded and multi-target fits take the first target column, both
    * exactly as the reference does. Returns (feature_index, importance);
    * names live with the upstream VectorAssembler's inputCols.
    */
  def varImp(sigma: Option[Double] = None): DataFrame = {
    val beta = sigma match {
      case Some(s) => slopeModel.coef(Array(s)).head
      case None =>
        val k = $(sigmaIndex)
        require(k >= 0 && k < slopeModel.fit.sigma.length,
          "varImp: set sigmaIndex to a path step or pass sigma explicitly")
        slopeModel.coef()(k)
    }
    val ic = if (slopeModel.fit.intercept) 1 else 0
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    (0 until beta.rows - ic)
      .map(j => (j, math.abs(beta(j + ic, 0))))
      .toDF("feature_index", "importance")
  }

  override def copy(extra: ParamMap): SlopeMLModel = {
    val m = new SlopeMLModel(uid, slopeModel)
    copyValues(m, extra).setParent(parent)
  }

  override def transformSchema(schema: StructType): StructType =
    SlopeMLModel.outputSchema(schema, $(predictionCol), $(predictType),
      $(sigmaIndex), multiTarget)

  override def write: MLWriter = new SlopeMLModel.Writer(this)

  // reader-side param application (set is protected; the companion reader
  // routes through this package-private hook)
  private[fit] def setLoaded(p: Param[_], v: Any): this.type =
    set(p.asInstanceOf[Param[Any]], v)
}

/** Fitted-model persistence compatible with stock `PipelineModel.save` /
  * `load`: a `metadata/` part in the MLlib layout (class, uid, params JSON
  * — what `DefaultParamsReader.loadMetadata` expects) plus the inner
  * [[SlopeModel]] in the open [[ModelIO]] parquet+JSON format.
  */
object SlopeMLModel extends MLReadable[SlopeMLModel] {

  private[fit] class Writer(instance: SlopeMLModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      import org.json4s.{JObject, JValue}
      val spark = sparkSession
      ModelIO.save(spark, instance.slopeModel, s"$path/slopeModel")
      // structural JSON (json4s, like the Reader): hand concatenation
      // would emit an unparseable metadata line for e.g. a uid containing
      // a control character
      def paramsJson(pairs: Seq[(String, JValue)]): JObject = JObject(pairs.toList)
      def enc(p: Param[_], v: Any): JValue =
        JsonMethods.parse(p.asInstanceOf[Param[Any]].jsonEncode(v))
      val setPairs = instance.params.toSeq.flatMap(p =>
        instance.get(p).map(v => p.name -> enc(p, v)))
      val defaultPairs = instance.params.toSeq.flatMap(p =>
        instance.getDefault(p).map(v => p.name -> enc(p, v)))
      val meta: JObject =
        ("class" -> classOf[SlopeMLModel].getName) ~
          ("timestamp" -> System.currentTimeMillis()) ~
          ("sparkVersion" -> spark.version) ~
          ("uid" -> instance.uid) ~
          ("paramMap" -> paramsJson(setPairs)) ~
          ("defaultParamMap" -> paramsJson(defaultPairs))
      import spark.implicits._
      Seq(JsonMethods.compact(JsonMethods.render(meta))).toDF("value")
        .repartition(1).write.mode("overwrite").text(s"$path/metadata")
    }
  }

  override def read: MLReader[SlopeMLModel] = new Reader

  private class Reader extends MLReader[SlopeMLModel] {
    override def load(path: String): SlopeMLModel = {
      val spark = sparkSession
      import org.json4s.jackson.JsonMethods
      import org.json4s.{DefaultFormats, JObject}
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metaStr = spark.read.text(s"$path/metadata").head().getString(0)
      val j = JsonMethods.parse(metaStr)
      val uid = (j \ "uid").extract[String]
      val inner = ModelIO.load(spark, s"$path/slopeModel")
      val m = new SlopeMLModel(uid, inner)
      (j \ "paramMap") match {
        case JObject(fields) => fields.foreach { case (name, v) =>
          val p = m.getParam(name)
          m.setLoaded(p, p.jsonDecode(JsonMethods.compact(JsonMethods.render(v))))
        }
        case _ => // no explicitly-set params recorded
      }
      m
    }
  }
  private[fit] def outputSchema(schema: StructType, outCol: String,
                                pType: String, sigmaIndex: Int,
                                multiTarget: Boolean = false): StructType = {
    val dt: DataType =
      if (sigmaIndex < 0) {
        if (pType == "class") ArrayType(StringType)
        else ArrayType(ArrayType(DoubleType))
      } else {
        if (pType == "class") StringType
        else if (multiTarget) ArrayType(DoubleType)
        else DoubleType
      }
    StructType(schema.fields :+ StructField(outCol, dt, nullable = true))
  }
}
