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

  test("asofJoin is row-wise: a null in the LATEST right row wins over older non-nulls") {
    val sp = spark; import sp.implicits._
    // latest at-or-before row (ts=20) carries v=null, a=2 — the result must
    // be THAT row's (null, 2), not v=5.0 resurrected from ts=10
    val left = Seq((1L, 1L, new java.sql.Timestamp(30000L))).toDF("id", "k", "ts")
    val right = Seq(
      (1L, new java.sql.Timestamp(10000L), Some(5.0), Some(1L)),
      (1L, new java.sql.Timestamp(20000L), None, Some(2L)))
      .toDF("k", "ts", "v", "a")
    val row = TemporalJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v", "a")).head()
    assert(row.isNullAt(3), s"expected latest row's null v, got ${row.get(3)}")
    assert(row.getLong(4) == 2L)
    // guards: empty keys and reserved names fail fast
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(left, right, Seq.empty, "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(left.withColumn("_side",
        org.apache.spark.sql.functions.lit(0)), right, Seq("k"), "ts", Seq("v"))
    }
  }

  test("asofJoin two-level bucketed plan matches the single-window plan under a hot key") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(57)
    // key 0 is pathologically hot (90% of rows); keys 1-4 normal. Bucket
    // width 1000s over a ~100000s span → the hot key spreads over ~100
    // (key, bucket) window partitions instead of one.
    val leftRows = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) (i % 4) + 1L else 0L
      (i.toLong, k, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L))
    }
    val rightRows = (0 until 150).map { i =>
      val k = if (i % 5 == 0) (i % 4) + 1L else 0L
      (k, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L), i * 2.5)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")

    def res(bucket: Long) =
      TemporalJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"), bucket)
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap

    val plain = res(0L)
    val bucketed = res(1000L)
    assert(plain == bucketed)
    // empty buckets between right updates still carry the value forward
    val lGap = Seq((1L, 9L, new java.sql.Timestamp(90000000L))).toDF("id", "k", "ts")
    val rGap = Seq((9L, new java.sql.Timestamp(1000L), 7.5)).toDF("k", "ts", "v")
    assert(TemporalJoin.asofJoin(lGap, rGap, Seq("k"), "ts", Seq("v"), 10L)
      .head().getDouble(3) == 7.5)
  }

  test("rangeJoinBucketed keeps matches for sub-second interval ends on bucket boundaries") {
    val sp = spark; import sp.implicits._
    val base = 1700000000L // seconds; bucket width 3600 aligned
    // interval end = next bucket boundary + 0.5s; event 0.2s past the
    // boundary is INSIDE the interval and must survive the bucket math
    val ev = Seq((1L, new java.sql.Timestamp(base * 1000L + 3600000L + 200L)))
      .toDF("eid", "ts")
    val iv = Seq((0, new java.sql.Timestamp(base * 1000L),
      new java.sql.Timestamp(base * 1000L + 3600000L + 500L)))
      .toDF("wid", "ws", "we")
    val got = TemporalJoin.rangeJoinBucketed(ev, iv, "ts", "ws", "we", 3600)
      .select("eid", "wid").collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("rangeJoinBucketed fails loudly on a corrupt interval with end <= start") {
    val sp = spark; import sp.implicits._
    val base = 1700000000L
    val ev = Seq((1L, new java.sql.Timestamp(base * 1000L))).toDF("eid", "ts")
    // end is far BEFORE start: with sequence's default -1 step this would
    // silently explode one row per bucket down the whole span; the pinned
    // +1 step makes it an error instead
    val bad = Seq((0, new java.sql.Timestamp(base * 1000L),
      new java.sql.Timestamp((base - 3600 * 1000) * 1000L)))
      .toDF("wid", "ws", "we")
    intercept[Throwable] {
      TemporalJoin.rangeJoinBucketed(ev, bad, "ts", "ws", "we", 3600).collect()
    }
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
