package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RepetitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-repetition-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDf(rows: (Long, String)*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Reference histogram stats: (max count, argmax gram w/ min-string
    * tie-break, distinct count).
    */
  private def exactStats(grams: Seq[String]): (Long, String, Long) =
    if (grams.isEmpty) (0L, "", 0L)
    else {
      val hist = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = hist.toSeq.minBy { case (g, c) => (-c, g) }
      (best._2, best._1, hist.size.toLong)
    }

  test("topRunStats matches a brute-force histogram on random arrays") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(11)
    val arrays = Seq.fill(60)(Seq.fill(rnd.nextInt(20))(s"g${rnd.nextInt(6)}"))
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
    val got = df.select(col("id"),
      Repetition.topRunStats(array_sort(col("arr"))).as("s"))
      .select(col("id"), col("s.best"), col("s.bestg"), col("s.uniq"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      assert(got(i.toLong) == exactStats(a), s"id=$i arr=$a")
    }
  }

  test("wordGramArray: occurrence order and short-doc guard") {
    val df = docsDf(0L -> "a b a b a", 1L -> "a b")
    val got = df.select(col("doc_id"),
      TextPipeline.wordGramArray(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) == Seq("a b a", "b a b", "a b a"))
    assert(got(1L).isEmpty)
  }

  test("qualityByLang flags repeated-2-gram and duplicate-3-gram docs") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      // "spam spam" 2-gram dominates: 9 occurrences x 9 chars = 81 chars of
      // a 49-char text -> R1 fires; 3-grams all "spam spam spam" -> R2 fires
      (0L, "spam spam spam spam spam spam spam spam spam spam", "en"),
      // varied prose: no flags
      (1L, "the quick brown fox jumps over one lazy dog today", "en"),
      // too short for any gram: clean by construction
      (2L, "hi", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Repetition.qualityByLang(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("de", 1L, 0L, 0L, 1L), ("en", 2L, 1L, 1L, 1L)))
  }
}
