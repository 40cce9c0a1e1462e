package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native vec_dot must be a drop-in for the interpreted
  * aggregate(zip_with(...)) formulation it replaced: bit-identical sums
  * (same element-order double accumulation), NULL propagation, mixed
  * float/double inputs, and it must stay inside whole-stage codegen.
  */
class VecDotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot is bit-identical to the zip_with/aggregate formulation") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(7)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    val rows = df.select(
      VecFunctions.vecDot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("mixed float/double arrays and literal centroids work") {
    val sp = spark; import sp.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val cent = typedLit(Seq(0.5, -1.0, 2.0))
    val out = df.select(VecFunctions.vecDot(col("v"), cent)).head().getDouble(0)
    assert(out == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("null array, null element, or length mismatch yields NULL (zip_with parity)") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 1.0f)),
      (2L, null, Array[java.lang.Float](1.0f, 1.0f)),
      (3L, Array[java.lang.Float](2.0f, 3.0f, 99.0f), Array[java.lang.Float](4.0f, 5.0f)),
      (4L, Array[java.lang.Float](2.0f, 3.0f), Array[java.lang.Float](4.0f, 5.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VecFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty) // 3-dim vs 2-dim: corrupt width must not score
    assert(out(4L).contains(2.0 * 4.0 + 3.0 * 5.0))
  }

  test("integral element types widen to double like the cast formulation") {
    val sp = spark; import sp.implicits._
    val df = Seq((Array(1, 2, 3), Array(10L, 20L, 30L))).toDF("a", "b")
    val v = df.select(VecFunctions.vecDot(col("a"), col("b"))).head().getDouble(0)
    assert(v == 10.0 + 40.0 + 90.0)
  }

  test("vec_dot stays inside whole-stage codegen") {
    val df = spark.range(10).select(
      transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("float")).as("a"),
      transform(sequence(lit(0), lit(7)), i => (col("id") * i).cast("float")).as("b"))
    val plan = df.select(VecFunctions.vecDot(col("a"), col("b")).as("d"))
      .queryExecution.executedPlan
    val hasWsc = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, s"no WholeStageCodegen in:\n$plan")
  }

  test("vec_cosine is bit-identical to the composed dot/(norm*norm) form") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(13)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    def hofNorm(c: org.apache.spark.sql.Column) = sqrt(hofDot(c, c))
    val rows = df.select(
      VecFunctions.vecCosine(col("a"), col("b")).as("fast"),
      (hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b")))).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("GraftExtensions exposes vec_dot and vec_cosine to SQL") {
    ensureExtensionsSession()
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("GraftExtensions exposes word_grams and gram_run_stats to SQL") {
    ensureExtensionsSession()
    val r = spark.sql(
      """SELECT word_grams(array('a', 'b', 'a', 'b'), 2) AS g,
        |       gram_run_stats(array('a', 'b', 'a', 'b'), 2) AS s""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    val s = r.getStruct(1)
    assert(s.getLong(0) == 2L && s.getString(1) == "a b" && s.getLong(2) == 2L)
  }

  /** Swap the shared session for one with GraftExtensions installed
    * (extensions only apply at session construction). Idempotent, so the
    * extension tests are order-independent.
    */
  private def ensureExtensionsSession(): Unit =
    if (!spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions"))) {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
    }

  test("vec_quantize_int8 is bit-identical to the transform/array_max composition") {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(23)
    val rows = (0 until 200).map { i =>
      val v =
        if (i == 0) Array.fill(16)(0f)         // all-zero vector: scale 0
        else if (i == 1) Array(1f)             // single element: q = 127
        else Array.fill(16)(rng.nextFloat() * 20 - 10)
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    // the interpreted composition this expression replaced
    val dv = transform(col("v"), x => x.cast("double"))
    val s = array_max(transform(dv, x => abs(x))) / lit(127.0)
    val refQ = when(s === 0, transform(dv, _ => lit(0).cast("tinyint")))
      .otherwise(transform(dv, x => floor(x / s + lit(0.5)).cast("tinyint")))
    val qz = VecQuantizeInt8.vecQuantizeInt8(col("v"))
    val got = df.select(col("id"), qz.getField("scale").as("fs"), s.as("rs"),
      qz.getField("q").as("fq"), refQ.as("rq")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"scale @id ${r.getLong(0)}")
      assert(r.getSeq[Byte](3) == r.getSeq[Byte](4), s"q @id ${r.getLong(0)}")
    }
    // null array and null element both poison to NULL
    val nulls = Seq((0L, null: Array[java.lang.Float]),
      (1L, Array[java.lang.Float](1.0f, null))).toDF("id", "v")
    val outs = nulls.select(VecQuantizeInt8.vecQuantizeInt8(col("v"))).collect()
    assert(outs.forall(_.isNullAt(0)))
    // SQL surface
    Seq((1L, Array(0.5f, -1.0f))).toDF("id", "v").createOrReplaceTempView("vq_t")
    val viaSql = sp.sql("SELECT vec_quantize_int8(v).q FROM vq_t").head().getSeq[Byte](0)
    assert(viaSql == Seq[Byte](64, -127))
  }

  test("optimizer rule rewrites the aggregate(zip_with(...)) idiom to vec_dot") {
    ensureExtensionsSession()
    val df = spark.range(50).select(
      transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("float")).as("a"),
      transform(sequence(lit(0), lit(7)), i => (col("id") * i + 1).cast("float")).as("b"))
    val hof = df.select(hofDot(col("a"), col("b")).as("d"))
    val optimized = hof.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[VecDot])),
      s"rule did not fire:\n$optimized")
    // and the rewritten plan computes the same values as the native call
    val viaRule = hof.collect().map(_.getDouble(0))
    val direct = df.select(VecFunctions.vecDot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(viaRule.sameElements(direct))
    // a NON-matching shape (zero = 1.0) must be left alone
    val other = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!other.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VecDot])))
    // bare (uncast) multiply over NON-double arrays must be left alone too:
    // int products wrap and float products round BEFORE widening, but
    // VecDot widens first — a rewrite would change results
    val ints = spark.range(3).select(
      transform(sequence(lit(0), lit(2)), i => (col("id") + lit(100000)).cast("int")).as("a"),
      transform(sequence(lit(0), lit(2)), i => (col("id") + lit(100000)).cast("int")).as("b"))
    val bare = ints.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!bare.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VecDot])),
      "bare int multiply must not be rewritten")
  }

  test("GraftExtensions exposes the text kernels to SQL") {
    ensureExtensionsSession()
    val r = spark.sql(
      """SELECT text_tokens('The CAT, sat!') AS toks,
        |       normalize_text('  A  b\tC ') AS norm,
        |       token_char_spans('!ab cd').spans AS spans,
        |       bpeish_count('ab1 ?x') AS bp,
        |       simhash_fp(';;;') AS fp_null,
        |       minhash_sig('abcdef', 5, 2) AS sig""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("the", "cat", "sat"))
    assert(r.getString(1) == "a b\tc".replace("\t", " "))
    assert(r.getSeq[org.apache.spark.sql.Row](2)
      .map(x => (x.getLong(0), x.getLong(1))) == Seq((1L, 2L), (4L, 5L)))
    assert(r.getInt(3) == 4) // "ab" + "1" + "?" + "x"
    assert(r.isNullAt(4), "token-free text must yield NULL simhash")
    assert(r.getSeq[Long](5).length == 2)
    // literal-arg enforcement: a non-foldable k must be rejected
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig('abc', cast(id AS int), 2) FROM range(1)").head()
    }
    assert(err.getMessage.contains("literal int"))
  }
}
