package graft.fit

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{SparkSession, Row}
import org.apache.spark.sql.functions._
import graft.slope._

/** Model persistence in the MLlib `MLWritable` layout: a `metadata/` JSON
  * part plus a `coefficients/` parquet of (step, row, target, value) —
  * readable by any engine, re-loadable into a `SlopeModel`. (The reference
  * relies on R's serialization; a cluster engine needs an open format.)
  */
object ModelIO {

  def save(spark: SparkSession, model: SlopeModel, path: String): Unit = {
    import spark.implicits._
    val f = model.fit
    val coefs = f.betas.indices.flatMap { k =>
      val b = f.betas(k)
      for (i <- 0 until b.rows; j <- 0 until b.cols) yield (k, i, j, b(i, j))
    }
    coefs.toDF("step", "row", "target", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$path/coefficients")

    def jarr(xs: Iterable[Double]) = xs.mkString("[", ",", "]")
    def jstrs(xs: Iterable[String]) =
      xs.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
    val meta =
      s"""{"family":"${f.family}","intercept":${f.intercept},
         |"sigma":${jarr(f.sigma)},"lambda":${jarr(f.lambda)},
         |"nullDeviance":${f.nullDeviance},
         |"deviances":${jarr(f.deviances)},
         |"devianceRatios":${jarr(f.devianceRatios)},
         |"passes":${f.passes.mkString("[", ",", "]")},
         |"nUnique":${f.nUnique.mkString("[", ",", "]")},
         |"featureNames":${jstrs(model.featureNames)},
         |"classNames":${jstrs(model.classNames)},
         |"nRows":${f.betas.headOption.map(_.rows).getOrElse(0)},
         |"nTargets":${f.betas.headOption.map(_.cols).getOrElse(0)}}""".stripMargin
        .replace("\n", "")
    Seq(meta).toDF("metadata").repartition(1)
      .write.mode("overwrite").text(s"$path/metadata")
  }

  def load(spark: SparkSession, path: String): SlopeModel = {
    val metaStr = spark.read.text(s"$path/metadata").head().getString(0)
    // minimal JSON field extraction (flat, engine-written schema)
    def field(name: String): String = {
      val i = metaStr.indexOf("\"" + name + "\":")
      require(i >= 0, s"metadata field $name missing")
      val start = i + name.length + 3
      var depth = 0
      var end = start
      var done = false
      while (!done && end < metaStr.length) {
        val c = metaStr.charAt(end)
        if (c == '[') depth += 1
        else if (c == ']') depth -= 1
        else if ((c == ',' || c == '}') && depth == 0) done = true
        if (!done) end += 1
      }
      metaStr.substring(start, end)
    }
    def darr(s: String): Array[Double] = {
      val inner = s.stripPrefix("[").stripSuffix("]").trim
      if (inner.isEmpty) Array.empty else inner.split(",").map(_.toDouble)
    }
    def iarr(s: String): Array[Int] = darr(s).map(_.toInt)
    def sarr(s: String): Array[String] = {
      // quote-aware split: commas inside quoted names (e.g. a column named
      // "price, adjusted") must not break elements
      val inner = s.stripPrefix("[").stripSuffix("]")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inQuote = false
      var escaped = false
      var sawAny = false
      inner.foreach { c =>
        if (escaped) { cur += (if (c == '"') '"' else if (c == '\\') '\\' else c); escaped = false }
        else if (inQuote && c == '\\') escaped = true
        else if (c == '"') { inQuote = !inQuote; sawAny = true }
        else if (c == ',' && !inQuote) { out += cur.result(); cur.clear() }
        else if (inQuote) cur += c
      }
      if (sawAny) { out += cur.result() }
      out.toArray
    }

    val nRows = field("nRows").toInt
    val nTargets = field("nTargets").toInt
    val sigma = darr(field("sigma"))
    // one pass over the collected tuples, writing straight into the
    // pre-indexed matrices (no per-step rescans)
    val betaArr = Array.fill(sigma.length)(DenseMatrix.zeros[Double](nRows, nTargets))
    spark.read.parquet(s"$path/coefficients")
      .collect().foreach { r =>
        betaArr(r.getInt(0))(r.getInt(1), r.getInt(2)) = r.getDouble(3)
      }
    val betas = betaArr.toIndexedSeq

    val fit = SlopeFit(
      betas = betas,
      sigma = sigma,
      lambda = darr(field("lambda")),
      nullDeviance = field("nullDeviance").toDouble,
      deviances = darr(field("deviances")),
      devianceRatios = darr(field("devianceRatios")),
      passes = iarr(field("passes")),
      activeSets = IndexedSeq.fill(sigma.length)(Array.empty[Int]),
      diagnostics = IndexedSeq.empty,
      nUnique = iarr(field("nUnique")),
      violations = IndexedSeq.empty,
      family = field("family").stripPrefix("\"").stripSuffix("\""),
      intercept = field("intercept").toBoolean,
      dataPasses = 0L)
    new SlopeModel(fit, sarr(field("featureNames")), sarr(field("classNames")))
  }
}
