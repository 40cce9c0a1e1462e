package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The scale-rehearsal generator's whole value is its invariants: a k×
  * corpus must stress k× the rows WITHOUT changing per-capita structure.
  * Each test pins one of those invariants exactly.
  */
class ScaleRehearsalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-scale-rehearsal-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("document cipher preserves length, whitespace, punctuation and intra-replica equality; changes cross-replica text") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "The quick brown fox, jumps! Over the lazy dog.", "en", "web", 46L),
      (2L, "The quick brown fox, jumps! Over the lazy dog.", "en", "web", 46L), // exact dup of 1
      (3L, "something else entirely here", "en", "book", 28L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")

    val r0 = ScaleRehearsal.documentsReplica(docs, 0).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val r3 = ScaleRehearsal.documentsReplica(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // replica 0 is a pass-through
    assert(r0(1L) == "The quick brown fox, jumps! Over the lazy dog.")
    val stride = 300000000L
    // cipher is length-preserving and leaves non-letters fixed
    assert(r3(stride + 1L).length == 46)
    assert(r3(stride + 1L).count(_ == ' ') == r0(1L).count(_ == ' '))
    assert(r3(stride + 1L).filterNot(_.isLetter) == r0(1L).filterNot(_.isLetter))
    // exact duplicates stay exact duplicates inside the replica
    assert(r3(stride + 1L) == r3(stride + 2L))
    // but the replica's text differs from the original (no cross-replica dups)
    assert(r3(stride + 1L) != r0(1L))
    // cipher is a bijection: distinct docs stay distinct
    assert(r3(stride + 1L) != r3(stride + 3L))
  }

  test("document cipher is deterministic across invocations") {
    val sp = spark; import sp.implicits._
    val docs = Seq((7L, "abcdef ghij", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = ScaleRehearsal.documentsReplica(docs, 5).collect()(0).getString(1)
    val b = ScaleRehearsal.documentsReplica(docs, 5).collect()(0).getString(1)
    assert(a == b)
  }

  test("embedding permutation preserves intra-replica cosine exactly and norms per vector") {
    val sp = spark; import sp.implicits._
    val dim = 8
    val rng = new scala.util.Random(11)
    val vecs = (0 until 6).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() - 0.5f), i % 2))
    val df = vecs.toDF("vec_id", "embedding", "label")

    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

    val out = ScaleRehearsal.embeddingsReplica(df, 2, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val stride = 200000000L

    // permutation: same multiset of components per vector
    vecs.foreach { case (id, v, _) =>
      assert(out(stride + id).sorted.sameElements(v.sorted))
    }
    // orthogonal map: every pairwise dot product is exactly preserved
    for (i <- vecs.indices; j <- i + 1 until vecs.length) {
      val orig = dot(vecs(i)._2.toSeq, vecs(j)._2.toSeq)
      val perm = dot(out(stride + i), out(stride + j))
      assert(math.abs(orig - perm) < 1e-12, s"pair ($i,$j)")
    }
  }

  test("events replica shifts keys, preserving per-key timeline shape") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      (1L, 1000L, 10L, "click", 1.0, "{}"),
      (2L, 2000L, 10L, "view", 2.0, "{}"),
      (3L, 1500L, 11L, "click", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val r1 = ScaleRehearsal.eventsReplica(events, 1)
    val byUser = r1.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser == Map(100000010L -> 2L, 100000011L -> 1L))
    // ts and payload untouched
    val row = r1.filter(col("event_id") === 100000001L).collect()(0)
    assert(row.getLong(1) == 1000L && row.getDouble(4) == 1.0)
  }
}
