package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SketchDecontamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-sketch-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDf(rows: (Long, String)*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ---- Misra–Gries ----

  test("MG summarize: superset guarantee on a single stream") {
    val rnd = new Random(7)
    // skewed stream: token t_i with weight ~ 1/(i+1)
    val stream = Seq.fill(5000)(s"t${math.min(19, (1 / (rnd.nextDouble() + 0.02)).toInt)}")
    val k = 8
    val (n, summary) = Sketch.mgSummarize(stream.iterator, k)
    assert(n == stream.size)
    assert(summary.size <= k)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustHave = exact.collect { case (t, c) if c * k > n => t }
    mustHave.foreach(t => assert(summary.contains(t), s"missing heavy hitter $t"))
    // MG undercount bound: exact - N/k <= sketch <= exact
    summary.foreach { case (t, c) =>
      assert(c <= exact(t) && c >= exact(t) - n / k)
    }
  }

  test("MG merge keeps the guarantee across arbitrary splits") {
    val rnd = new Random(13)
    val stream = Seq.fill(4000)(s"w${(rnd.nextGaussian().abs * 4).toInt}")
    val k = 6
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val mustHave = exact.collect { case (t, c) if c * k > n => t }.toSet
    for (splits <- Seq(2, 3, 7)) {
      val parts = stream.grouped(math.ceil(stream.size.toDouble / splits).toInt).toSeq
      val merged = parts.map(p => Sketch.mgSummarize(p.iterator, k))
        .reduce((a, b) => Sketch.mgMerge(a, b, k))
      assert(merged._1 == n)
      assert(merged._2.size <= k)
      mustHave.foreach(t => assert(merged._2.contains(t), s"splits=$splits lost $t"))
    }
  }

  test("heavyHittersExact: exact counts, deterministic across partitionings") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(29)
    val toks = Seq.fill(3000)(s"x${(rnd.nextGaussian().abs * 3).toInt}")
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 5
    val expected = exact.toSeq.collect { case (t, c) if c * k > toks.size => (t, c) }
      .sortBy { case (t, c) => (-c, t) }
    for (parts <- Seq(1, 4)) {
      val df = sp.sparkContext.parallelize(toks, parts).toDF("tok")
      val got = Sketch.heavyHittersExact(df, k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("countMin: never underestimates, exact sans collisions, partition-independent") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(31)
    val toks = Seq.fill(2000)(s"t${(rnd.nextGaussian().abs * 4).toInt}")
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (d, w) = (4, 64) // small w forces some collisions
    val probes = exact.keys.toSeq.sorted ++ Seq("absent_token")
    var first: Map[String, Long] = null
    for (parts <- Seq(1, 7)) {
      val df = sp.sparkContext.parallelize(toks, parts).toDF("tok")
      val sketch = Sketch.countMinSketch(df, d, w)
      // total mass per hash row == N (every occurrence lands in one bucket)
      val rowMass = sketch.groupBy("r").agg(sum("cnt").as("m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rowMass.values.forall(_ == toks.size.toLong), s"parts=$parts $rowMass")
      val est = Sketch.countMinEstimate(sketch, probes, d, w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probes.foreach { p =>
        assert(est(p) >= exact.getOrElse(p, 0L), s"CM underestimated $p")
      }
      if (first == null) first = est
      else assert(est == first, "sketch estimates depend on partitioning")
    }
    // single-distinct-token corpus: no collision possible → estimate exact
    val solo = Seq.fill(17)("only").toDF("tok")
    val soloEst = Sketch.countMinEstimate(
      Sketch.countMinSketch(solo, d, w), Seq("only"), d, w).collect()
    assert(soloEst.head.getLong(1) == 17L)
  }

  test("heavyHittersExact: empty input") {
    val sp = spark; import sp.implicits._
    val df = Seq.empty[String].toDF("tok")
    assert(Sketch.heavyHittersExact(df, 5).collect().isEmpty)
  }

  // ---- Decontamination ----

  test("docNgrams: count, content, and short-doc guard") {
    val df = docsDf(
      0L -> "a b c d e",
      1L -> "a b c",      // shorter than n=4 → no grams
      2L -> "a b c d a b c d") // repeated gram → distinct collapses
    val grams = Decontaminate.docNgrams(df, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(grams.count(_._1 == 0L) == 2) // "a b c d", "b c d e"
    assert(grams.count(_._1 == 1L) == 0)
    // doc 2 grams: abcd, bcda, cdab, dabc, abcd → 4 distinct
    assert(grams.count(_._1 == 2L) == 4)
    // doc 0 and doc 2 share the hash of "a b c d"
    val d0 = grams.filter(_._1 == 0L).map(_._2).toSet
    val d2 = grams.filter(_._1 == 2L).map(_._2).toSet
    assert(d0.intersect(d2).size == 1)
  }

  test("contaminatedFlag: native lookup == semi-join verdicts on random unicode corpora") {
    // randomized pin of the round-8 lookup-substrate swap: for arbitrary
    // messy text (unicode, punctuation runs, empty/short docs), the
    // row-local flag against evalGramArray must flag EXACTLY the docs the
    // distributed semi join flags, and the array and map forms must agree
    val rnd = new Random(97)
    val vocab = Vector("the", "café", "Ω", "naïve", "0x7f", "dog,", "--", "a",
      "中文词", "fox", "...", "eée", "tab\tsep", "N°5", "word")
    def doc(len: Int): String =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (round <- 0 until 5) {
      val n = 2 + round % 3 // gram orders 2, 3, 4
      val train = docsDf((0L until 40L).map(i => i -> doc(rnd.nextInt(14))): _*)
      val evalDocs = docsDf((100L until 110L).map(i => i -> doc(2 + rnd.nextInt(10))): _*)
      val viaJoin = Decontaminate.contaminatedDocs(train, evalDocs, n)
        .collect().map(_.getLong(0)).toSet
      val arr = Decontaminate.evalGramArray(evalDocs, n)
      if (arr.nonEmpty) {
        // the tagged public form and the raw private internals must agree
        val viaFlag = train.withColumn("c",
            Decontaminate.contaminatedFlag(col("text"),
              Decontaminate.evalGrams(evalDocs, n)))
          .filter(col("c")).collect().map(_.getLong(0)).toSet
        assert(viaFlag == viaJoin, s"round $round n=$n: flag $viaFlag != join $viaJoin")
        val viaRaw = train.withColumn("c",
            Decontaminate.contaminatedFlag(col("text"), arr, n,
              md5Substrate = true))
          .filter(col("c")).collect().map(_.getLong(0)).toSet
        assert(viaRaw == viaJoin, s"round $round n=$n: raw internals diverged")
      }
      // the rolling opt-in must be self-consistent too (array build, flag
      // probe and semi join all keyed on the same rolling substrate)
      val arrRoll = Decontaminate.evalGramArray(evalDocs, n, md5Substrate = false)
      if (arrRoll.nonEmpty) {
        val joinRoll = Decontaminate
          .contaminatedDocs(train, evalDocs, n, md5Substrate = false)
          .collect().map(_.getLong(0)).toSet
        val flagRoll = train.withColumn("c",
            Decontaminate.contaminatedFlag(col("text"),
              Decontaminate.EvalGrams(arrRoll, n, md5Substrate = false)))
          .filter(col("c")).collect().map(_.getLong(0)).toSet
        assert(flagRoll == joinRoll, s"round $round n=$n: rolling flag diverged")
      }
    }
  }

  test("rolling-key substrate yields the same verdicts as the md5 gram-string form") {
    // the md5-on-gram-string chain is the independently-derived twin: a
    // rolling-key bug (recurrence, mixing, window count, null semantics)
    // would produce a different contaminated-id set on messy text
    val rnd = new Random(101)
    val vocab = Vector("the", "café", "Ω", "naïve", "0x7f", "dog,", "--", "a",
      "中文词", "fox", "...", "eée", "tab\tsep", "N°5", "word")
    def doc(len: Int): String =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def md5Contaminated(train: org.apache.spark.sql.DataFrame,
        evalDocs: org.apache.spark.sql.DataFrame, n: Int): Set[Long] = {
      val ev = Decontaminate.docNgramsMd5(evalDocs, n).select("gh").distinct()
      Decontaminate.docNgramsMd5(train, n)
        .join(ev, Seq("gh"), "left_semi").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
    }
    for (round <- 0 until 5) {
      val n = 2 + round % 3
      val train = docsDf((0L until 40L).map(i => i -> doc(rnd.nextInt(14))): _*)
      val evalDocs = docsDf((100L until 110L).map(i => i -> doc(2 + rnd.nextInt(10))): _*)
      val rolling = Decontaminate
        .contaminatedDocs(train, evalDocs, n, md5Substrate = false)
        .collect().map(_.getLong(0)).toSet
      assert(rolling == md5Contaminated(train, evalDocs, n), s"round $round n=$n")
      // and the md5 DEFAULT path is the md5 twin by construction
      val viaDefault = Decontaminate.contaminatedDocs(train, evalDocs, n)
        .collect().map(_.getLong(0)).toSet
      assert(viaDefault == rolling, s"round $round n=$n: default != rolling")
    }
  }

  test("contaminatedDocs flags exactly the overlapping train docs") {
    val train = docsDf(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "completely different words appear in this one here",
      12L -> "we embed quick brown fox jumps inside padding text")
    val eval = docsDf(100L -> "quick brown fox jumps far away")
    val hits = Decontaminate.contaminatedDocs(train, eval, 4)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 12L))
  }

  test("contaminationBySource counts every train doc once") {
    val sp = spark; import sp.implicits._
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "sA"),
      (11L, "completely different words appear in this one here", "sA"),
      (12L, "nothing shared at all with anything else", "sB"))
      .toDF("doc_id", "text", "source")
    val eval = docsDf(100L -> "quick brown fox jumps far away")
    val out = Decontaminate.contaminationBySource(train, eval, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("sA", 2L, 1L), ("sB", 1L, 0L)))
  }

  // ---- Exact quantiles (query-level twin of the oracle formula) ----

  test("lower-index quantile formula picks the right ranks") {
    // cnt=5: p25 idx=(4)//4+1=2, p50 idx=4//2+1=3, p75 idx=12//4+1=4
    val sorted = Seq(10, 20, 30, 40, 50)
    def idx(cnt: Int, num: Int, den: Int) = ((cnt - 1) * num) / den + 1
    assert(sorted(idx(5, 1, 4) - 1) == 20)
    assert(sorted(idx(5, 1, 2) - 1) == 30)
    assert(sorted(idx(5, 3, 4) - 1) == 40)
  }
}
