package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact-dedup drops duplicate fingerprints within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingPipeline.dedupStream(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:00"), "Hello   World"),
        (ts("2026-01-01 10:00:30"), "hello world"), // same fp within watermark → dropped
        (ts("2026-01-01 10:01:00"), "something else"))
      q.processAllAvailable()
      val rows = sp.sql("SELECT text FROM dedup_out").collect().map(_.getString(0))
      assert(rows.length == 2, rows.toSeq)
      assert(rows.count(_.toLowerCase.contains("hello")) == 1)
    } finally q.stop()
  }

  test("windowed streaming text profile aggregates per (window, lang)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val out = StreamingPipeline.textProfileStream(
      input.toDF().toDF("ts", "lang", "text"), "ts", "5 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("profile_out")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:10"), "en", "the cat and the dog"),
        (ts("2026-01-01 10:01:10"), "en", "a bird in the bush"),
        (ts("2026-01-01 10:02:10"), "de", "der hund und die katze"))
      q.processAllAvailable()
      val rows = sp.sql("SELECT lang, n_docs, sum_tokens FROM profile_out")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      // one entry per lang since all rows share one 5-minute window
      assert(rows.size == 2)
      val en = sp.sql("SELECT n_docs, sum_tokens FROM profile_out WHERE lang='en'").head()
      assert(en.getLong(0) == 2 && en.getLong(1) == 10)
    } finally q.stop()
  }

  test("stateless streaming language-ID tags rows") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[String]
    val out = StreamingPipeline.langIdStream(input.toDF().toDF("text"))
    val q = out.writeStream.format("memory").queryName("lang_out")
      .outputMode("append").start()
    try {
      input.addData("the cat sat on the mat and it was there",
        "le chat est dans la maison et les enfants")
      q.processAllAvailable()
      val rows = sp.sql("SELECT pred_lang FROM lang_out ORDER BY pred_lang")
        .collect().map(_.getString(0))
      assert(rows.sameElements(Array("en", "fr")))
    } finally q.stop()
  }
}
