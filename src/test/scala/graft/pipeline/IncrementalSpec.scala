package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class IncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-incremental-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("tagNew: exact verdicts match a plain anti-join") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(17)
    val seenKeys = Seq.fill(200)(s"k${rnd.nextInt(300)}").distinct
    val incoming = Seq.tabulate(150)(i => (i.toLong, s"k${rnd.nextInt(400)}"))
    val seenDf = seenKeys.toDF("k")
    val incDf = incoming.toDF("id", "k")
    val got = Incremental.tagNew(incDf, seenDf, col("k"), expectedItems = 1024L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val seenSet = seenKeys.toSet
    incoming.foreach { case (id, k) =>
      assert(got(id) == !seenSet.contains(k), s"id=$id k=$k")
    }
  }

  test("tagNew: exact even when the bloom is saturated (many false positives)") {
    val sp = spark; import sp.implicits._
    // expectedItems=1 for 500 inserted keys -> tiny sketch, fpp near 1:
    // every incoming row becomes a candidate; the semi join must still
    // produce exactly the true dups.
    val seenDf = (0 until 500).map(i => s"s$i").toDF("k")
    val incDf = Seq((1L, "s17"), (2L, "nope"), (3L, "s499"), (4L, "fresh")).toDF("id", "k")
    val got = Incremental.tagNew(incDf, seenDf, col("k"), expectedItems = 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("tagNew: empty history marks everything new") {
    val sp = spark; import sp.implicits._
    val seenDf = Seq.empty[String].toDF("k")
    val incDf = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val got = Incremental.tagNew(incDf, seenDf, col("k"), expectedItems = 16L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("mightContain has no false negatives") {
    val sp = spark; import sp.implicits._
    val keys = (0 until 1000).map(i => s"k$i")
    val bloom = Incremental.buildBloom(keys.toDF("k"), col("k"), expectedItems = 1000L)
    val hits = keys.toDF("k")
      .filter(Incremental.mightContain(bloom, col("k")))
      .count()
    assert(hits == 1000L)
  }
}
