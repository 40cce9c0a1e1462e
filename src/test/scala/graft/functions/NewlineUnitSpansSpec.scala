package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct unit coverage for the native unit-span kernel. The binding
  * property: `newline_unit_spans(text, minRun)` must equal the retained
  * generic regex fold (`ParagraphDedup.unitSpansHof` — the definition)
  * for both shipped separators on ANY input: adversarial newline runs
  * (leading/trailing/adjacent — empty units), multi-byte and
  * supplementary Unicode around and between newlines, `\r`/blank-line
  * whitespace (NOT separators under the shipped regexes), and empty
  * text. Exercised on the static kernel directly, under whole-stage
  * codegen, and with codegen disabled (interpreted nullSafeEval), plus a
  * randomized corpus sweep.
  */
class NewlineUnitSpansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-newlineunitspans-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def kernel(s: String, minRun: Int): Seq[(Long, Long)] = {
    val arr = NewlineUnitSpanOps.spans(UTF8String.fromString(s), minRun)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  /** Reference derivation straight from split semantics on code points. */
  private def oracle(s: String, sepRegex: String): Seq[(Long, Long)] = {
    val pieces = s.split(sepRegex, -1)
    val seps = sepRegex.r.findAllIn(s).toSeq
    assert(seps.size == pieces.length - 1, "interleave identity")
    var cur = 0L
    pieces.zipAll(seps, "", "").map { case (p, sep) =>
      val st = cur
      val en = cur + p.codePointCount(0, p.length) - 1L
      cur = en + 1L + (if (sep.isEmpty) 0L else sep.codePointCount(0, sep.length).toLong)
      (st, en)
    }
  }

  private val cases = Seq(
    "", "a", "\n", "\n\n", "\n\n\n", "a\nb", "a\n\nb", "a\n\n\nb",
    "\na", "a\n", "\n\na", "a\n\n", "\n\nx\n\n", "a\nb\n\nc\nd",
    "par one\n\npar two\n\n\npar three", "a\n \nb", "a\r\n\r\nb",
    "é\n\nü", "日本\n語\n\n中文", "a😀\n\n😀b",
    "😀\n😀", "tab\t\n\nx", "  \n\n  ")

  test("kernel equals split semantics for both shipped separators") {
    for (s <- cases) {
      assert(kernel(s, 2) == oracle(s, "\n{2,}"), s"paragraph: ${s.replace("\n", "\\n")}")
      assert(kernel(s, 1) == oracle(s, "\n"), s"line: ${s.replace("\n", "\\n")}")
    }
  }

  test("kernel equals the generic fold Column-for-Column, codegen on and off") {
    val sqls = Seq("true", "false")
    for (codegen <- sqls) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val ss = spark; import ss.implicits._
        val df = cases.toDF("t")
        val joined = df.select(
          NewlineUnitSpans.newlineUnitSpans(col("t"), 2).as("k2"),
          graft.pipeline.ParagraphDedup.unitSpansHof(col("t"), "\n{2,}").as("h2"),
          NewlineUnitSpans.newlineUnitSpans(col("t"), 1).as("k1"),
          graft.pipeline.ParagraphDedup.unitSpansHof(col("t"), "\n").as("h1"))
        assert(joined.filter(col("k2") =!= col("h2") || col("k1") =!= col("h1"))
          .count() == 0L, s"codegen=$codegen")
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("randomized corpus: kernel == fold for both separators") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = Array("a", "b", " ", "\n", "\n", "é", "日", "😀", "\t", "\r")
    val docs = Seq.fill(300) {
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (s <- docs) {
      assert(kernel(s, 2) == oracle(s, "\n{2,}"), s.replace("\n", "\\n"))
      assert(kernel(s, 1) == oracle(s, "\n"), s.replace("\n", "\\n"))
    }
  }

  test("malformed UTF-8 degrades deterministically (no crash, spans cover the string)") {
    // a truncated lead byte or a bare continuation byte breaks the
    // numChars/byte-scan agreement other kernels had to size buffers for;
    // here there is no buffer to overflow, but the spans must still be
    // deterministic, start at 0, be contiguous (next.st == prev.en + sep),
    // and never index past the char count the same byte-scan rule yields.
    val hostile = Seq(
      Array[Byte](0xE4.toByte, '\n', '\n', 'A', 'B'),
      Array[Byte]('x', 0xC3.toByte, '\n', 0x85.toByte, '\n', 'r'),
      Array[Byte](0x85.toByte, 0x85.toByte, '\n', '\n', 'a'))
    for (bs <- hostile; minRun <- Seq(1, 2)) {
      val s = UTF8String.fromBytes(bs)
      val a = NewlineUnitSpanOps.spans(s, minRun)
      val b = NewlineUnitSpanOps.spans(s, minRun)
      def seq(g: org.apache.spark.sql.catalyst.util.GenericArrayData) =
        (0 until g.numElements()).map { i =>
          val r = g.getStruct(i, 2); (r.getLong(0), r.getLong(1))
        }
      assert(seq(a) == seq(b), "non-deterministic on hostile bytes")
      val spans = seq(a)
      assert(spans.head._1 == 0L)
      spans.foreach { case (st, en) => assert(en >= st - 1) }
      assert(spans.sliding(2).forall {
        case Seq((_, en1), (st2, _)) => st2 > en1; case _ => true
      })
    }
  }

  test("dispatcher routes shipped separators to the kernel, custom to the fold") {
    val ss = spark; import ss.implicits._
    val df = Seq("a\n \nb\n\nc").toDF("t")
    // shipped: native expression appears in the plan
    val shipped = df.select(graft.pipeline.ParagraphDedup
      .unitSpans(col("t"), graft.pipeline.ParagraphDedup.ParagraphSep))
    assert(shipped.queryExecution.analyzed.toString.contains("newline_unit_spans"))
    // custom regex: fold path, and the tolerant blank-line notion differs
    // from the shipped pure-newline notion exactly on "\n \n"
    val tolerant = df.select(graft.pipeline.ParagraphDedup
      .unitSpans(col("t"), "\n[\t ]*(?:\n[\t ]*)+").as("v"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(tolerant.size == 3) // "a", "b", "c" — "\n \n" IS a break here
    val strict = shipped.as[Seq[(Long, Long)]].head
    assert(strict.size == 2)   // "a\n \nb", "c" — not a break under \n{2,}
  }
}
