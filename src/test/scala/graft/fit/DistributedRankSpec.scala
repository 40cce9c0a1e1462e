package graft.fit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct properties of the distributed prefix-sum primitive (the AUC
  * oracles exercise it end-to-end; this pins the primitive itself):
  * cum_before must equal the brute-force strict-predecessor sum for any
  * weights, any partitioning, duplicate keys, and empty/1-row inputs —
  * and overflow must be loud, never a wrapped total.
  */
class DistributedRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-rank-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cum_before equals the brute-force strict-predecessor sum") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(19)
    // duplicate order keys on purpose: rows tie, groups don't exist here —
    // callers pre-group, but the primitive must still be deterministic in
    // (key) order because equal keys carry equal pre-grouped rows
    val rows = (0 until 500).map(i =>
      (rng.nextInt(40).toDouble, i.toLong, rng.nextInt(1000).toLong))
    val df = rows.toDF("k", "id", "w").groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("w").as("w"))
    val out = DistributedRank.withPrefixSum(df, Seq("k"), "w")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.length == out.map(_._1).distinct.length)
    // brute force over the grouped table
    val grouped = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val sortedKeys = grouped.keys.toSeq.sorted
    var cum = 0L
    val expect = sortedKeys.map { k =>
      val c = cum; cum += grouped(k); (k, c)
    }.toMap
    out.foreach { case (k, _, before) =>
      assert(before == expect(k), s"key $k: $before != ${expect(k)}")
    }
    // output arrives range-sorted by construction
    assert(out.map(_._1).sameElements(out.map(_._1).sorted))
  }

  test("empty and single-row inputs") {
    val sp = spark; import sp.implicits._
    val empty = Seq.empty[(Double, Long)].toDF("k", "w")
    assert(DistributedRank.withPrefixSum(empty, Seq("k"), "w").count() == 0)
    val one = Seq((5.0, 42L)).toDF("k", "w")
    val r = DistributedRank.withPrefixSum(one, Seq("k"), "w").head()
    assert(r.getLong(2) == 0L)
  }

  test("overflow fails loudly instead of wrapping") {
    val sp = spark; import sp.implicits._
    val big = Seq((1.0, Long.MaxValue - 5), (2.0, 10L), (3.0, 10L))
      .toDF("k", "w")
    // overflow can surface driver-side (offsets scanLeft) as a bare
    // ArithmeticException, or executor-side wrapped in SparkException
    val ex = intercept[Exception] {
      DistributedRank.withPrefixSum(big, Seq("k"), "w").collect()
    }
    assert(ex.isInstanceOf[ArithmeticException] ||
      ex.isInstanceOf[org.apache.spark.SparkException], ex.toString)
  }
}
