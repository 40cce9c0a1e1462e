package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TemporalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-temporal-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("asofJoin matches brute force: latest at-or-before per key, ties included, nulls before first") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(31)
    val leftRows = (0 until 300).map(i =>
      (i.toLong, (i % 7).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L)))
    val rightRows = (0 until 80).map(i =>
      ((i % 7).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L), i * 1.5))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")

    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap

    leftRows.foreach { case (id, k, ts) =>
      val expect = rightRows.filter(r => r._1 == k && !r._2.after(ts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got(id) == expect, s"id=$id key=$k")
    }
    // a right row at EXACTLY the left timestamp is included (at-or-before)
    val l1 = Seq((1L, 0L, new java.sql.Timestamp(5000L))).toDF("id", "k", "ts")
    val r1 = Seq((0L, new java.sql.Timestamp(5000L), 9.0)).toDF("k", "ts", "v")
    assert(TemporalJoin.asofJoin(l1, r1, Seq("k"), "ts", Seq("v"))
      .head().getDouble(3) == 9.0)
  }

  test("rangeJoinBucketed matches brute-force containment, end exclusive, overlaps kept") {
    val sp = spark; import sp.implicits._
    val base = 1700000000L
    val events = (0 until 500).map(i =>
      (i.toLong, new java.sql.Timestamp((base + i * 137) * 1000L)))
      .toDF("eid", "ts")
    // overlapping intervals, one ending exactly on a bucket boundary
    val intervals = Seq(
      (0, base, base + 3600),
      (1, base + 1800, base + 7200),          // overlaps 0 and 2
      (2, base + 3600, base + 3600 * 4),      // starts on a boundary
      (3, base + 3600 * 10, base + 3600 * 12) // empty-ish tail
    ).map { case (id, s0, e0) =>
      (id, new java.sql.Timestamp(s0 * 1000L), new java.sql.Timestamp(e0 * 1000L))
    }.toDF("wid", "ws", "we")

    val got = TemporalJoin.rangeJoinBucketed(events, intervals, "ts", "ws", "we",
        bucketSeconds = 3600)
      .select("eid", "wid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    val evLocal = (0 until 500).map(i => (i.toLong, base + i * 137))
    val ivLocal = Seq((0, base, base + 3600), (1, base + 1800, base + 7200),
      (2, base + 3600, base + 3600 * 4), (3, base + 3600 * 10, base + 3600 * 12))
    val expect = (for {
      (eid, t) <- evLocal
      (wid, s0, e0) <- ivLocal
      if t >= s0 && t < e0
    } yield (eid, wid)).toSet
    assert(got == expect)
    // an event exactly at an interval end is NOT included
    assert(!got.exists { case (eid, wid) =>
      wid == 0 && evLocal.toMap.apply(eid) == base + 3600 })
  }
}
