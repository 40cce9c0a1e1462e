package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The span/removal operators persist a MEMORY_AND_DISK token substrate,
  * eagerly checkpoint the (small) cut/span table, then release the
  * substrate. A FAILED checkpoint job must release it too — the
  * `try/finally` around each `localCheckpoint()` — or one failed removal
  * in a long-lived production session pins a corpus-sized cache for the
  * session lifetime. This spec forces the failure (a poisoned text column
  * that raises mid-job) through every eager entry point and asserts the
  * session's cache is as empty afterwards as it was before.
  */
class CacheHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-cachehygiene-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** A small duplicated corpus whose `ptext` column evaluates fine for
    * most rows and RAISES on the poisoned one — `raise_error` under a
    * `when`, so the failure happens inside the distributed job (exactly
    * where a corrupt input row would), not at plan time.
    */
  private def poisoned(): DataFrame = {
    val sp = spark; import sp.implicits._
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    (Seq(
      0L -> s"$dup one two three",
      1L -> s"zero $dup four five",
      2L -> "BOOM unique text here entirely",
      3L -> "other words nothing shared") ++
      (4L until 12L).map(i => i -> s"filler $i $dup tail $i"))
      .toDF("doc_id", "text")
      .withColumn("ptext",
        when(col("text").contains("BOOM"),
          raise_error(lit("poisoned row"))).otherwise(col("text")))
  }

  /** Cached-RDD ids present in the context (the substrate persists land
    * here; localCheckpoints of FAILED jobs never materialize).
    */
  private def cachedIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def poisonFailed(e: Throwable): Boolean =
    e != null && (Option(e.getMessage).exists(_.contains("poisoned row")) ||
      poisonFailed(e.getCause))

  private def assertFailsClean(body: DataFrame => Any): Unit = {
    val before = cachedIds()
    val docs = poisoned()
    val e = intercept[Exception] { body(docs) }
    // the poison must be what failed the job, not an unrelated analysis error
    assert(poisonFailed(e), s"unexpected failure: $e")
    // GC of failed-job temp blocks is async; the CACHE entries (what the
    // finally releases) must be gone synchronously
    val leaked = cachedIds() -- before
    assert(leaked.isEmpty, s"failed job leaked cached RDDs: $leaked")
  }

  test("removeDupSpansExact releases the token substrate when the job fails") {
    assertFailsClean(d =>
      Dedup.removeDupSpansExact(d, minLen = 4, textCol = "ptext").count())
  }

  test("removeDupSpans (multi-order) releases the substrate on failure") {
    assertFailsClean(d =>
      Dedup.removeDupSpans(d, ns = Seq(3, 5), minLen = 4, textCol = "ptext").count())
  }

  test("dupSpanProfileMulti releases the substrate on failure") {
    assertFailsClean(d =>
      Dedup.dupSpanProfileMulti(d, ns = Seq(3, 5), minLen = 4,
        textCol = "ptext").count())
  }

  test("incrementalRemoveDupSpansExact releases the increment substrate on failure") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(
      100L -> "alpha beta gamma delta epsilon zeta eta theta corpus",
      101L -> "alpha beta gamma delta epsilon zeta eta theta twice")
      .toDF("doc_id", "text")
    val idx = Dedup.buildExactSubstrIndex(corpus, minLen = 4)
    try {
      val before = cachedIds()
      val e = intercept[Exception] {
        Dedup.incrementalRemoveDupSpansExact(poisoned(), idx,
          textCol = "ptext").count()
      }
      assert(poisonFailed(e), s"unexpected failure: $e")
      val leaked = cachedIds() -- before
      assert(leaked.isEmpty, s"failed probe leaked cached RDDs: $leaked")
    } finally idx.unpersist()
  }

  test("the successful path retains ONLY the checkpointed cut table") {
    val sp = spark; import sp.implicits._
    val before = cachedIds()
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 12L).map(i => i -> s"filler $i $dup tail $i")
      .toDF("doc_id", "text")
    val out = Dedup.removeDupSpansExact(docs, minLen = 4)
    assert(out.count() > 0)
    // exactly ONE cached RDD may remain: the localCheckpoint of the small
    // per-affected-doc cut table, owned by the returned DataFrame (it is
    // what lets the lazy emit tail replay without re-running the corpus
    // aggregate). The corpus-sized token substrate must be GONE.
    val retained = cachedIds() -- before
    assert(retained.size <= 1,
      s"successful removal left more than the cut checkpoint cached: $retained")
  }
}
