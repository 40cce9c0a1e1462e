package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct unit coverage for the rolling 128-bit window hashes: the rolled
  * O(1)-per-step recurrence must equal a brute-force per-window polynomial
  * evaluation (the definition it implements), and the NULL / short-array
  * semantics must match [[WordGrams]] (NULL array or element → NULL;
  * fewer than n tokens → empty). Exercised on three paths: the static
  * kernel directly (what generated code calls), the Column in whole-stage
  * codegen, and the Column with codegen disabled (interpreted
  * nullSafeEval).
  */
class RollingGramHashesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-rollinggram-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute force: evaluate each window's two polynomials from scratch,
    * h = ((t_0·B + t_1)·B + t_2)·B + …, over the same per-token hashes the
    * kernel uses. Mod-2⁶⁴ arithmetic is Long overflow, so plain Scala
    * multiplication/addition IS the reference semantics.
    */
  private def brute(tokens: Seq[String], n: Int): Seq[(Long, Long)] = {
    val t1 = tokens.map(t => RollingGramOps.tokenHash(UTF8String.fromString(t)))
    val t2 = t1.map(RollingGramOps.tokenHash2)
    (0 to tokens.length - n).map { i =>
      var h1 = 0L; var h2 = 0L
      var j = i
      while (j < i + n) {
        h1 = h1 * RollingGramOps.B1 + t1(j)
        h2 = h2 * RollingGramOps.B2 + t2(j)
        j += 1
      }
      (h1, h2)
    }
  }

  private def kernel(tokens: Seq[String], n: Int): Seq[(Long, Long)] = {
    val arr = new GenericArrayData(
      tokens.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])
    val out = RollingGramOps.hashes(arr, n)
    assert(out != null, "kernel returned NULL for a non-null token array")
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  private def bothPaths(body: => Unit): Unit = {
    body
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try body
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("rolled recurrence equals brute-force window polynomials (kernel)") {
    val rnd = new scala.util.Random(41)
    val alphabet = Vector("the", "cat", "sat", "on", "a", "mat", "", "é中文",
      "x" * 300)
    for (len <- Seq(1, 2, 7, 50, 257); n <- Seq(1, 2, 3, 8, 32, 50)) {
      val toks = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
      val got = kernel(toks, n)
      val want = brute(toks, n)
      assert(got == want, s"len=$len n=$n")
      assert(got.length == math.max(0, len - n + 1))
    }
  }

  test("repeated tokens produce equal window hashes exactly where windows repeat") {
    val toks = Seq("a", "b", "a", "b", "a", "b", "a")
    val h = kernel(toks, 3) // windows: aba bab aba bab aba
    assert(h(0) == h(2) && h(2) == h(4))
    assert(h(1) == h(3))
    assert(h(0) != h(1))
  }

  test("fewer than n tokens → empty array; NULL element / NULL array → NULL") {
    val short = new GenericArrayData(Array[Any](UTF8String.fromString("only")))
    val s = RollingGramOps.hashes(short, 2)
    assert(s != null && s.numElements() == 0)
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("b")))
    assert(RollingGramOps.hashes(withNull, 2) == null)
  }

  test("rolling_gram_keys mixes exactly h1 ^ rotl(h2, 32) with identical window/null semantics") {
    val toks = Seq("to", "be", "or", "not", "to", "be", "é中文", "")
    for (n <- Seq(1, 2, 3, 8)) {
      val want = kernel(toks, n).map { case (h1, h2) =>
        h1 ^ java.lang.Long.rotateLeft(h2, 32) }
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val out = RollingGramOps.keys(arr, n)
      val got = (0 until out.numElements()).map(out.getLong)
      assert(got == want, s"n=$n")
    }
    val short = new GenericArrayData(Array[Any](UTF8String.fromString("only")))
    val s = RollingGramOps.keys(short, 2)
    assert(s != null && s.numElements() == 0)
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null))
    assert(RollingGramOps.keys(withNull, 1) == null)
  }

  test("Column form matches the kernel on both codegen and interpreted paths") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      Seq("to", "be", "or", "not", "to", "be"),
      Seq("single"),
      Seq.empty[String],
      null,
      Seq("a", null, "b"), // NULL element → NULL result
      Seq.fill(100)("dup"))
    bothPaths {
      val got = rows.toDF("toks")
        .select(RollingGramHashes.rollingGramHashes(col("toks"), 3).as("h"))
        .collect()
      rows.zip(got).foreach {
        case (null, r) => assert(r.isNullAt(0))
        case (toks, r) if toks.contains(null) => assert(r.isNullAt(0))
        case (toks, r) =>
          val want = kernel(toks, 3)
          val hs = r.getSeq[Row](0).map(x => (x.getLong(0), x.getLong(1)))
          assert(hs == want, s"toks=$toks")
      }
    }
  }
}
