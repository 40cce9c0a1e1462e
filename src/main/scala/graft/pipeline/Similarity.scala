package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Det

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, as a production pipeline needs both:
  * - `cosineTopK`: brute-force cosine of a (small) probe set against the
  *   corpus — the exactness baseline. Probe⋈corpus is a broadcast of the
  *   probes, NOT an all-pairs corpus join; cost is linear in corpus size.
  * - `lshBuckets` / `lshTopK`: random-hyperplane (sign) LSH — the scale
  *   path. Hyperplane entries are md5-derived ±1, so the same buckets are
  *   reproducible in any engine (and in the DuckDB oracle).
  */
object Similarity {

  /** Elementwise double-dot of two numeric-array columns, summed in element
    * order (deterministic; matches an oracle's sequential accumulation).
    * Backed by the native codegen'd [[graft.functions.VecDot]] expression —
    * the equivalent `aggregate(zip_with(...))` formulation runs on the
    * interpreted higher-order-function path and was the measured bottleneck
    * of every similarity query.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass native cosine (see [[graft.functions.VecCosine]]) —
    * bit-identical to `dot(a,b) / (norm(a) * norm(b))` but walks the
    * arrays once instead of three times.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VecFunctions.vecCosine(a, b)

  /** Top-k nearest neighbours (cosine) of each probe row. `probePred`
    * selects the probes (e.g. `vec_id % 100 === 0`). Cosine is rounded to 9
    * decimals BEFORE ranking so tie-breaking (then by candidate id) is
    * engine-independent.
    */
  def cosineTopK(embeddings: DataFrame, probePred: Column, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = embeddings.filter(probePred)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val cands = embeddings.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = cands.crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(cosine(col("pv"), col("cv")), 9).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "cand_id", "cos")
  }

  /** Symmetric per-vector max-abs int8 quantization of the embedding
    * column — the 4× storage compression every 100 TB vector corpus wants
    * at rest. Output: (id, scale float, q array<tinyint>) with
    * `q[i] = floor(x[i]/scale + 0.5)`, scale = max|x|/127 (the Det
    * floor-grid rounding, so both engines of an oracle agree bit-exactly);
    * an all-zero vector quantizes to zeros with scale 0. Backed by the
    * native codegen'd [[graft.functions.VecQuantizeInt8]] — the composed
    * `transform`/`array_max` form runs every element through the
    * interpreted lambda evaluator twice.
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val qz = graft.functions.VecQuantizeInt8.vecQuantizeInt8(col(vecCol))
    embeddings.select(col(idCol), qz.as("_qz"))
      .select(col(idCol),
        col("_qz").getField("scale").cast("float").as("scale"),
        col("_qz").getField("q").as("q"))
  }

  /** Brute-force cosine top-k over the int8-QUANTIZED vectors: the two
    * per-vector scales cancel out of the cosine, so the score is exact
    * integer arithmetic over the byte arrays (one double division at the
    * end) — engine-independent without any dequantization, and the dot
    * products run on the same native [[graft.functions.VecDot]] codegen
    * (byte getter). Same probe-broadcast shape as [[cosineTopK]].
    */
  def int8CosineTopK(embeddings: DataFrame, probePred: Column, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // zero vectors (scale 0) quantize to all-zero bytes whose cosine is
    // NaN — and Spark sorts NaN ABOVE every real score, so one zero
    // vector would take rank 1 for every probe; they have no defined
    // direction, so exclude them from both sides
    val qt = quantizeInt8(embeddings, idCol, vecCol)
      .filter(col("scale") =!= 0.0)
    // identical ranking recipe to the exact path by construction
    cosineTopK(qt, probePred, k, idCol, vecCol = "q")
  }

  /** Sign-LSH bucket id (0..2^nPlanes−1) for each vector: bit s is the sign
    * of the projection onto a pseudo-random ±1 hyperplane derived from
    * md5("h<s>-<dim>").
    */
  /** ±1 hyperplane entry for (plane s, dim d): parity of
    * md5Hash60("h<s>-<d>") — computed driver-side (the table is
    * data-independent; evaluating the md5 expression per ROW costs
    * planes×dims hashes per vector across the whole corpus for identical
    * values). Bit-identical to the SQL oracle's in-query md5.
    */
  private[pipeline] def planeWeight(s: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"h$s-$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  def lshBucket(embeddings: DataFrame, nPlanes: Int = 8,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val unrolled = embeddings
      .select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"), col("v").cast("double").as("v"))
    // probe the actual embedding width once (1-row job) — the weight tables
    // become compact literal arrays instead of per-row md5 evaluations
    val dims = embeddings.select(size(col(vecCol))).head().getInt(0)
    // all nPlanes projections in one wide aggregation (a plane-column
    // explode would multiply the shuffle volume by nPlanes)
    val projAggs = (0 until nPlanes).map { s =>
      val weights = array((0 until dims).map(d => lit(planeWeight(s, d))): _*)
      sum(col("v") * element_at(weights, col("d") + 1)).as(s"proj_$s")
    }
    val assemble = (0 until nPlanes).map(s =>
      s"(CASE WHEN proj_$s > 0 THEN shiftleft(cast(1 as bigint), $s) ELSE cast(0 as bigint) END)")
      .mkString(" + ")
    unrolled.groupBy("vec_id")
      .agg(projAggs.head, projAggs.tail: _*)
      .select(col("vec_id"), expr(assemble).as("bucket"))
  }

  /** Bucket occupancy histogram — the partition-balance diagnostic for the
    * LSH index.
    */
  def lshBucketHistogram(embeddings: DataFrame, nPlanes: Int = 8): DataFrame =
    lshBucket(embeddings, nPlanes)
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")

  /** Embedding-cosine near-duplicate pairs: candidates from shared LSH
    * buckets (equi-join on the bucket key — never all-pairs), verified by
    * exact cosine ≥ threshold. The embedding-space analogue of
    * MinHash-then-Jaccard-verify.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         nPlanes: Int = 8): DataFrame = {
    val buckets = lshBucket(embeddings, nPlanes)
    val withB = embeddings.select(col("vec_id"), col("embedding"))
      .join(buckets, Seq("vec_id"))
    val a = withB.select(col("bucket"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = withB.select(col("bucket").as("bucket_b"), col("vec_id").as("v2"),
      col("embedding").as("e2"))
    // no distinct: each vector has exactly one bucket, so (v1, v2) pairs
    // are already unique — a distinct here would re-shuffle the output
    a.join(b, col("bucket") === col("bucket_b") && col("v1") < col("v2"))
      .select(col("v1"), col("v2"), round(cosine(col("e1"), col("e2")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---------------------------------------------------------------- IVF --

  /** IVF (inverted-file) centroids: deterministic spherical k-means over
    * the embedding column. Init = the k lowest-id vectors normalized
    * (declared spec — no RNG, reproducible on any cluster layout); each
    * Lloyd iteration is ONE data pass accumulating per-cluster sums
    * against broadcast centroids (assignment = max cosine ≡ max dot
    * after normalization, ties to the lowest cluster id); new centroids are
    * the normalized means, empty clusters keep their previous centroid.
    *
    * Bitwise determinism: per-partition partial buffers are folded on the
    * driver in PARTITION-ID order — a plain treeAggregate combines partials
    * in task-completion order, and double addition is order-sensitive, so
    * two identical runs would differ in the last ulps (observed in the
    * spec). The partial set is P·k·(d+1) doubles — at depth-2 treeAggregate
    * the driver already receives √P such buffers, so this changes the
    * constant, not the shape; for P beyond ~10⁴ partitions add one
    * fixed-pairing pre-combine level.
    *
    * The centroid table is k×d doubles — driver-held, like the solver's β.
    * At 100 TB the build costs `iters` full scans and the index state stays
    * tiny; queries then touch only `nProbe` inverted lists.
    */
  def ivfCentroids(embeddings: DataFrame, k: Int = 16, iters: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Array[Array[Double]] = {
    def normalized(a: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) a else a.map(_ / n)
    }
    val init: Array[Array[Double]] = embeddings
      .orderBy(col(idCol)).limit(k).select(vecCol).collect()
      .map(r => normalized(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(init.nonEmpty, "ivfCentroids: empty input")
    val d = init.head.length
    val rows = graft.util.Tables.spread(embeddings.select(vecCol)).rdd
      .map(r => normalized(r.getSeq[Float](0).map(_.toDouble).toArray))
    var centroids = init
    for (_ <- 0 until iters) {
      val bc = rows.sparkContext.broadcast(centroids)
      // per-partition buffer: [sums (k·d), counts (k)], folded in pid order
      val partials = rows.mapPartitionsWithIndex { (pid, it) =>
        val cs = bc.value
        val buf = new Array[Double](k * d + k)
        it.foreach { v =>
          var best = 0; var bestDot = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            var dot = 0.0; var i = 0
            while (i < d) { dot += cs(c)(i) * v(i); i += 1 }
            if (dot > bestDot) { bestDot = dot; best = c }
            c += 1
          }
          var i = 0
          while (i < d) { buf(best * d + i) += v(i); i += 1 }
          buf(k * d + best) += 1.0
        }
        Iterator.single(pid -> buf)
      }.collect().sortBy(_._1)
      val agg = new Array[Double](k * d + k)
      partials.foreach { case (_, b) =>
        var i = 0; while (i < agg.length) { agg(i) += b(i); i += 1 }
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (agg(k * d + c) > 0.0)
          normalized(Array.tabulate(d)(i => agg(c * d + i)))
        else centroids(c)
      }
      bc.destroy()
    }
    centroids
  }

  /** Cluster assignment as a pure Catalyst expression: per-centroid dots
    * against LITERAL centroid arrays (no UDF — stays in codegen), argmax
    * via the comparable-struct `least` trick with ties to the lowest
    * cluster id. Cosine is rounded to 9 decimals first so the argmax is
    * engine-independent (same recipe as the oracled top-k queries).
    */
  def ivfAssign(embeddings: DataFrame, centroids: Array[Array[Double]],
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val ev = col(vecCol)
    val choices = centroids.zipWithIndex.map { case (c, i) =>
      val cv = typedLit(c.toSeq)
      // centroids are unit-norm, so cosine = dot / |ev|
      struct((-round(dot(ev, cv) / norm(ev), 9)).as("negCos"), lit(i).as("cid"))
    }
    val best = if (choices.length == 1) choices.head else least(choices: _*)
    embeddings.select(col(idCol).as("vec_id"), best.getField("cid").as("cluster"))
  }

  /** IVF approximate top-k: each probe scans only its `nProbe` nearest
    * inverted lists. Probes are collected (tiny set), their candidate
    * clusters computed driver-side against the k×d centroid table, and the
    * (probe × cluster) fan-out equi-joins the assignment — never a corpus
    * cross join. Exact cosine then ranks within the candidate set.
    */
  def ivfTopK(embeddings: DataFrame, probePred: Column, topK: Int,
              k: Int = 16, iters: Int = 2, nProbe: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              maxProbes: Int = 10000): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = ivfCentroids(embeddings, k, iters, idCol, vecCol)
    val assign = ivfAssign(embeddings, centroids, idCol, vecCol)
    val cands = embeddings
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .join(assign.withColumnRenamed("vec_id", "cand_id"), Seq("cand_id"))

    // the probe set is pulled to the driver by CONTRACT (tiny, broadcast
    // back out) — enforce the contract instead of trusting it: the limit
    // bounds what can ever reach driver memory, and one excess row proves
    // the predicate was too broad, so fail fast (same spirit as the LSH
    // bucket-blowup guard)
    val probeRows = embeddings.filter(probePred)
      .select(col(idCol), col(vecCol)).limit(maxProbes + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    require(probeRows.length <= maxProbes,
      s"ivfTopK: probePred selects more than maxProbes=$maxProbes rows; " +
        "narrow the predicate or raise maxProbes")
    val probeClusters = probeRows.flatMap { case (pid, pv) =>
      val norm = math.sqrt(pv.map(x => x * x).sum)
      val byDot = centroids.zipWithIndex.map { case (c, i) =>
        val dot = c.zip(pv).map { case (a, b) => a * b }.sum
        (-dot / math.max(norm, Double.MinPositiveValue), i)
      }.sorted.take(nProbe)
      byDot.map { case (_, cid) => (pid, pv.toSeq, cid) }
    }
    import spark.implicits._
    val probesDf = probeClusters.toSeq
      .toDF("probe_id", "pv", "cluster")
      .select(col("probe_id"), col("pv").cast("array<float>").as("pv"), col("cluster"))

    val scored = cands.join(broadcast(probesDf), Seq("cluster"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(cosine(col("pv"), col("cv")), 9).as("cos"))
      // a vector can appear in several of a probe's clusters only via
      // distinct clusters, and assignment is unique — no dedup needed
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("probe_id", "rank", "cand_id", "cos")
  }

  /** Approximate top-k: exact cosine ranking restricted to same-bucket
    * candidates (the IVF-style scale path; recall traded for a bucket-local
    * join instead of a corpus scan per probe).
    */
  def lshTopK(embeddings: DataFrame, probePred: Column, k: Int,
              nPlanes: Int = 8): DataFrame = {
    val buckets = lshBucket(embeddings, nPlanes)
    val withB = embeddings.select(col("vec_id"), col("embedding"))
      .join(buckets, Seq("vec_id"))
    val probes = withB.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("bucket"))
    val cands = withB
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("bucket"))
    val scored = probes.join(cands, Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(cosine(col("pv"), col("cv")), 9).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "cand_id", "cos")
  }
}
