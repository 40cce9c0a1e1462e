package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native driver-literal lookups must agree exactly with the
  * `typedlit` map + `element_at` forms they replaced (the streaming twins'
  * batch ≡ stream pins ride on that equality), in both codegen and
  * interpreted execution, including inside higher-order-function lambdas.
  */
class BroadcastLookupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-broadcastlookup-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def bothPaths(body: => Unit): Unit = {
    body
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try body
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("inLongSet equals element_at(typedlit(map)).isNotNull on hits, misses and nulls") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    val keys = (0 until 1000).map(_ => rnd.nextLong()).distinct
    val keyMap = keys.map(_ -> 1).toMap
    val probes = keys.take(200) ++ (0 until 300).map(_ => rnd.nextLong()) ++
      Seq(Long.MinValue, Long.MaxValue, 0L)
    bothPaths {
      val df = probes.toDF("k")
        .withColumn("native", BroadcastLookup.inLongSet(col("k"), keyMap.keys))
        .withColumn("literal", element_at(typedlit(keyMap), col("k")).isNotNull)
      assert(df.filter(col("native") =!= col("literal")).count() == 0)
      val n = Seq[Option[Long]](None).toDF("k")
        .select(BroadcastLookup.inLongSet(col("k"), keyMap.keys)).collect().head
      assert(n.isNullAt(0))
    }
  }

  test("mapGetLong equals element_at(typedlit(map)) incl. misses → null, inside transform()") {
    val sp = spark; import sp.implicits._
    val vocab = Map("the" -> 100L, "a" -> 50L, "zebra" -> 1L, "" -> 7L,
      "é中文" -> 3L)
    val rows = Seq(
      Seq("the", "a", "miss", "zebra"),
      Seq("", "é中文", "THE"),
      Seq.empty[String])
    bothPaths {
      val df = rows.toDF("toks")
        .withColumn("native",
          transform(col("toks"), t => BroadcastLookup.mapGetLong(t, vocab)))
        .withColumn("literal",
          transform(col("toks"), t => element_at(typedlit(vocab), t)))
      assert(df.filter(col("native") =!= col("literal")).count() == 0)
      // top-level (non-lambda) probe with null key
      val n = Seq[Option[String]](None).toDF("t")
        .select(BroadcastLookup.mapGetLong(col("t"), vocab)).collect().head
      assert(n.isNullAt(0))
      // empty map: every probe misses (the bigram c2Rep-empty case)
      val e = Seq("x").toDF("t")
        .select(BroadcastLookup.mapGetLong(col("t"), Map.empty[String, Long]))
        .collect().head
      assert(e.isNullAt(0))
    }
  }
}
