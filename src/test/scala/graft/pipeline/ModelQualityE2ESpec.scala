package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.Slope

/** Closes the loop the engine exists for: the binomial SLOPE core FITS the
  * quality classifier that the pipeline layer's model-based filter then
  * APPLIES (`TextPipeline.classifierScore` — the fasttext-filter shape).
  * fit → β → score → filter, end to end, with the fitted β replayed as
  * plain double literals (the same contract `p_model_quality_filter`'s
  * SQL oracle uses for its fixed β).
  */
class ModelQualityE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-model-quality-e2e")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic labeled corpus: prose-like docs are stopword-rich with
    * short tokens and light punctuation; noise docs are long random-ish
    * alphanumeric tokens drowned in punctuation. The quality features
    * (`TextPipeline.qualityColumns`) separate the two by construction —
    * what a hand-labeled quality fixture looks like in production.
    */
  private def labeledCorpus: DataFrame = {
    val sp = spark; import sp.implicits._
    val good = (0 until 120).map { i =>
      val fillers = Seq("cat", "dog", "sun", "day", "home", "tree", "road")
      val words = (0 until 12 + i % 9).map { j =>
        val f = fillers((i + j) % fillers.length)
        Seq("the", f, "and", "it", "was", "in")((j + i) % 6)
      }
      (i.toLong, words.mkString(" ") + ".", "good")
    }
    val bad = (0 until 120).map { i =>
      val junk = (0 until 6 + i % 5).map { j =>
        val seed = i * 31 + j * 7
        (0 until 14 + (seed % 9)).map(k => ('b' + (seed * 13 + k * 5) % 24).toChar).mkString
      }
      (200L + i, junk.mkString(";;", "!!;;", "!!") + ":::;;;!!!", "bad")
    }
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("binomial SLOPE fit feeds classifierScore: fit, filter, and literal-beta replay agree") {
    val df = labeledCorpus.cache()
    // the model's features are EXACTLY the classifierScore features — same
    // expressions, so the fitted beta is directly pluggable
    val t = col("text")
    val nTok = TextPipeline.tokenCount(t).cast("double")
    val nChars = length(t).cast("double")
    val feats = df.select(col("doc_id"), col("label"), col("text"),
      nTok.as("f_tok"),
      (TextPipeline.stopwordCount(t).cast("double") / greatest(nTok, lit(1.0))).as("f_stop"),
      (TextPipeline.punctCount(t).cast("double") / greatest(nChars, lit(1.0))).as("f_punct"),
      (nChars / greatest(nTok, lit(1.0))).as("f_mtl")).cache()

    val model = Slope.fit(feats, Seq("f_tok", "f_stop", "f_punct", "f_mtl"), "label",
      Slope.config(family = "binomial", nSigma = 30))
    assert(model.classNames.toSeq == Seq("bad", "good"),
      "sorted class order must map bad to -1, good to +1")
    // least-regularized end of the path: the deployment beta
    val b = model.fit.betas.last
    assert(b.rows == 5 && b.cols == 1)
    val beta = Array(b(0, 0), b(1, 0), b(2, 0), b(3, 0), b(4, 0))
    assert(beta.drop(1).exists(_ != 0.0), "fit must select at least one feature")

    // FILTER with the fitted beta: z >= 0 <=> predicted 'good'
    val filtered = feats
      .withColumn("z", TextPipeline.classifierScore(col("text"), beta))
      .withColumn("keep", col("z") >= 0.0)
    val verdicts = filtered.select("doc_id", "label", "keep", "z").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3)))
    val acc = verdicts.count(v => v._3 == (v._2 == "good")).toDouble / verdicts.length
    assert(acc >= 0.95, s"fitted filter must separate the training corpus, got $acc")

    // the model's own class prediction and the pipeline filter agree
    val preds = model.transform(feats, Seq("f_tok", "f_stop", "f_punct", "f_mtl"),
        predictType = "class")
      .select(col("doc_id"), element_at(col("pred"), -1).as("cls"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    verdicts.foreach { case (id, _, keep, z) =>
      // guard the one place float association could differ: off-margin rows
      if (math.abs(z) > 1e-9)
        assert((preds(id) == "good") == keep, s"doc $id: transform vs filter")
    }

    // literal-beta replay (the oracle contract): left-associated double
    // arithmetic over the collected features reproduces every z bit-exactly
    val featRows = filtered.select("doc_id", "f_tok", "f_stop", "f_punct", "f_mtl", "z")
      .collect()
    featRows.foreach { r =>
      val z = beta(0) + beta(1) * r.getDouble(1) + beta(2) * r.getDouble(2) +
        beta(3) * r.getDouble(3) + beta(4) * r.getDouble(4)
      assert(java.lang.Double.compare(z, r.getDouble(5)) == 0,
        s"doc ${r.getLong(0)}: literal replay must be bit-exact: $z vs ${r.getDouble(5)}")
    }
    df.unpersist(); feats.unpersist()
  }
}
