package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the native winnowing kernel to the exploded `Window`-min
  * definition: per window of w consecutive k-gram composite keys
  * `c = (md5₆₀ mod 2⁴⁰)·2²³ + (2²³−1−i)`, the minimum decoded to
  * (pos, fp) — brute-forced per document here (naive per-window scan, no
  * deque), and cross-checked as whole DataFrames (`Winnow.selected`
  * native vs `Winnow.selectedExploded`) on random text with planted
  * copies, short docs, and Unicode. Both codegen and interpreted paths.
  */
class WinnowFpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-winnowfps-test")
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

  private val FpMod = 1L << 40
  private val PosMod = 1L << 23

  /** Naive reference: all composite keys, then a per-window linear min. */
  private def brute(s: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val l = s.toLowerCase(java.util.Locale.ROOT)
    val cps = l.codePoints().toArray
    val L = cps.length
    if (L < k + w - 1) return Seq.empty
    val m = L - k + 1
    val comp = (0 until m).map { i0 =>
      val gram = new String(cps, i0, k)
      val h40 = Md5Hash60.hash60(
        gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % FpMod
      h40 * PosMod + (PosMod - 1 - (i0 + 1))
    }
    (0 until m - w + 1).map { i0 =>
      val mc = comp.slice(i0, i0 + w).min
      (PosMod - 1 - (mc % PosMod), mc / PosMod)
    }
  }

  private val cases = Seq(
    "abcdefghij",                    // exactly k+w-1 at (7,4): one window
    "abcdefghi",                     // one short: empty
    "", "aaaaaaaaaaaaaaaaaaaa",      // degenerate repeats → all-tie windows
    "The quick brown fox jumps over the lazy dog",
    "é中文 mixed höla 中a文 with some more length to it",
    "😀 emoji x😀y tail with padding characters",
    "abc " * 50)

  test("kernel equals the naive per-window minimum on every shape") {
    for (s <- cases; (k, w) <- Seq((7, 4), (3, 2), (5, 1))) {
      val out = WinnowFpsOps.select(UTF8String.fromString(s), k, w)
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      assert(got == brute(s, k, w), s"case '$s' k=$k w=$w")
    }
  }

  test("native selected() equals the exploded Window-min form on a planted-copy corpus") {
    val sp = spark; import sp.implicits._
    import graft.pipeline.Winnow
    val rnd = new scala.util.Random(71)
    val alpha = "abcdefgh "
    def randText(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val t0 = randText(300)
    val corpus = Seq(
      0L -> t0, 1L -> t0, 2L -> randText(300),
      3L -> (randText(80) + t0.substring(100, 180) + randText(80)),
      4L -> "short", 5L -> "é中文 but long enough to fingerprint here")
      .toDF("doc_id", "text")
    bothPaths {
      val native = Winnow.selected(corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(x => (x._2, x._3)).toSeq).toMap
      val exploded = Winnow.selectedExploded(corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(x => (x._2, x._3)).toSeq).toMap
      assert(native == exploded)
    }
  }

  test("documents past the gram cap fail loudly; NULL text yields NULL") {
    val sp = spark; import sp.implicits._
    val r = Seq[String](null).toDF("t")
      .select(WinnowFps.winnowFps(col("t"), 7, 4).as("s")).head()
    assert(r.isNullAt(0))
    // the cap guard fires BEFORE any hashing, so an 8.4M-char doc is cheap
    // to probe directly at the kernel level
    val over = "a" * (7 - 1 + (1 << 23)) // exactly 2^23 grams: one too many
    val e = intercept[IllegalStateException] {
      WinnowFpsOps.select(UTF8String.fromString(over), 7, 4)
    }
    assert(e.getMessage.contains("gram cap"))
    // one gram fewer is inside the cap and must select (spot: no throw)
    assert(WinnowFpsOps.select(
      UTF8String.fromString("a" * (7 - 2 + (1 << 23))), 7, 4).numElements() > 0)
  }

  test("malformed UTF-8 degrades gracefully (no array overflow)") {
    // same guard as MinhashSigOps: the offset array is sized by the
    // byte-scan worst case, not numChars, so hostile bytes (where the two
    // counts disagree) select deterministically instead of throwing
    val hostile = Seq(
      Array[Byte](0xE4.toByte, 'A', 'B', 'C', 'D', 'E', 'F', 'G', 'H', 'I', 'J', 'K'),
      Array[Byte]('x', 0xC3.toByte, 'y', 'z', 'w', 'q', 0x85.toByte, 'r', 's', 't', 'u', 'v'))
    hostile.foreach { bs =>
      val s = UTF8String.fromBytes(bs)
      val a = WinnowFpsOps.select(s, 5, 4)
      val b = WinnowFpsOps.select(s, 5, 4)
      assert(a.numElements() == b.numElements())
    }
  }
}
