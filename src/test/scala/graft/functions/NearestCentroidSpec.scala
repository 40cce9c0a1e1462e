package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** `NearestCentroid` must be BIT-IDENTICAL to the `least(...)`-chain
  * column form it replaced in `Similarity.ivfAssign` / `ivfPqTopK` —
  * same fold arithmetic, ties to the lowest cid, NaN scores lose. The
  * suite compares the two formulations on every row, including the
  * adversarial cases: exact score ties (duplicate centroids), zero-norm
  * vectors and centroids (NaN cosine), and ragged widths.
  */
class NearestCentroidSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic "vectors" including zero rows and centroid copies. */
  private def vecs(n: Int, d: Int): Seq[Seq[Long]] =
    (0 until n).map { r =>
      if (r % 7 == 3) Seq.fill(d)(0L) // zero-norm: NaN cosine vs everything
      else (0 until d).map(i => ((r * 31 + i * 17) % 23 - 11).toLong)
    }

  private def df(rows: Seq[Seq[Long]]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
  }

  private def leastChainCosine(cents: Array[Array[Long]]) = {
    val choices = cents.zipWithIndex.map { case (c, i) =>
      struct((-VecFunctions.vecCosine(col("v"), typedLit(c.toSeq))).as("negCos"),
        lit(i).as("cid"))
    }
    (if (choices.length == 1) choices.head else least(choices: _*)).getField("cid")
  }

  private def leastChainL2(cents: Array[Array[Long]]) = {
    val choices = cents.zipWithIndex.map { case (c, i) =>
      val cl = typedLit(c.toSeq)
      val d2 = VecFunctions.vecDot(col("v"), col("v")) -
        lit(2.0) * VecFunctions.vecDot(col("v"), cl) +
        VecFunctions.vecDot(cl, cl)
      struct(d2.as("d2"), lit(i).as("cid"))
    }
    (if (choices.length == 1) choices.head else least(choices: _*)).getField("cid")
  }

  private def assertAgree(data: DataFrame, a: org.apache.spark.sql.Column,
                          b: org.apache.spark.sql.Column): Unit = {
    val diff = data.select(col("id"), a.as("x"), b.as("y"))
      .filter(not(col("x") <=> col("y")))
      .collect()
    assert(diff.isEmpty, s"forms disagree on rows: ${diff.mkString(", ")}")
  }

  test("cosine argmax matches the least-chain, incl. ties and NaN rows") {
    val d = 8
    // duplicate centroid 2 == centroid 5 → every row near them is a TIE
    // that must resolve to cid 2; centroid 4 is all-zero → NaN cosine
    val base = vecs(6, d).map(_.toArray)
    val cents = Array(base(0), base(1), base(2), base(4), Array.fill(d)(0L), base(2))
    val data = df(vecs(64, d))
    assertAgree(data, NearestCentroid.byCosine(col("v"), cents),
      leastChainCosine(cents))
  }

  test("L2 argmin matches the least-chain, incl. ties and zero rows") {
    val d = 8
    val base = vecs(6, d).map(_.toArray)
    val cents = Array(base(1), base(3), Array.fill(d)(0L), base(3))
    val data = df(vecs(64, d))
    assertAgree(data, NearestCentroid.byL2(col("v"), cents),
      leastChainL2(cents))
  }

  test("single centroid, k=1") {
    val cents = Array(Array(1L, 2L, 3L))
    val data = df(Seq(Seq(1L, 2L, 3L), Seq(-5L, 0L, 2L)))
    assertAgree(data, NearestCentroid.byCosine(col("v"), cents),
      leastChainCosine(cents))
  }

  test("width mismatch and NULL input give NULL") {
    val cents = Array(Array(1L, 2L, 3L, 4L))
    val data = df(Seq(Seq(1L, 2L, 3L))) // width 3 vs centroid width 4
      .union(df(Seq(Seq(1L))).select(col("id") + 10, lit(null).cast("array<bigint>")))
    val out = data.select(NearestCentroid.byCosine(col("v"), cents).as("c")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("rounded cosine matches the semanticDedup least-chain, incl. round-ties") {
    val d = 8
    // real-valued centroids with a scaled copy: cos(v, c) == cos(v, 2c)
    // EXACTLY is rare in floating point, but after round(..., 9) the two
    // collapse to ties on many rows — the argmax must then take the
    // lowest cid, exactly like the (negCos, cid) struct comparison
    val rnd = new scala.util.Random(11)
    val base = Array.fill(5)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    val cents: Array[Array[Double]] =
      base ++ Array(base(1).map(_ * 2.0), Array.fill(d)(0.0))
    val cids = Array(7L, 3L, 12L, 1L, 9L, 2L, 30L) // arbitrary labels
    val data = df(vecs(64, d))
    val leastChain = {
      val choices = cents.zip(cids).map { case (c, cid) =>
        struct((-round(VecFunctions.vecCosine(col("v"), typedLit(c.toSeq)), 9))
          .as("negCos"), lit(cid).as("cid"))
      }
      least(choices.toIndexedSeq: _*).getField("cid")
    }
    val sortedIdx = cids.zipWithIndex.sortBy(_._1)
    val exprForm = element_at(
      typedLit(sortedIdx.map(_._1).toSeq),
      NearestCentroid.byCosineRounded(col("v"),
        sortedIdx.map { case (_, i) => cents(i) }, digits = 9) + lit(1))
    assertAgree(data, exprForm, leastChain)
  }

  test("large k stays a constant-size plan (k = 512 evaluates)") {
    val d = 16
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(512)(Array.fill(d)((rnd.nextInt(41) - 20).toLong))
    val data = df(vecs(32, d))
    // the least-chain at k=512 would emit ~100k-term generated code; the
    // expression form must evaluate fine — cross-check against a driver
    // argmax on the collected rows
    val got = data.select(col("id"), NearestCentroid.byCosine(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = data.select(col("id"), col("v")).collect().map { r =>
      val v = r.getSeq[Long](1).map(_.toDouble).toArray
      var best = 0; var bestCos = Double.NegativeInfinity
      cents.zipWithIndex.foreach { case (c, i) =>
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        v.indices.foreach { j =>
          ab += v(j) * c(j); aa += v(j) * v(j); bb += c(j).toDouble * c(j)
        }
        val cos = ab / (math.sqrt(aa) * math.sqrt(bb))
        if (cos > bestCos) { bestCos = cos; best = i }
      }
      r.getLong(0) -> best
    }.toMap
    assert(got == want)
  }
}
