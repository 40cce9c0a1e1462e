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

  /** Fixed-point grid for the IVF index: vectors quantize to
    * `vq[i] = floor(x[i]·1e6 + 0.5)` longs before ANY index arithmetic.
    * DECLARED SPEC, chosen for engine-independence: every dot/norm over
    * gridded vectors is a sum of integer-valued terms whose partials stay
    * far below 2⁵³, so the accumulation is EXACT in any order on any
    * engine — the learned centroids and cluster assignments are
    * bit-reproducible, which is what lets the END-TO-END index
    * (`p_ann_ivf_topk`) carry a full DuckDB oracle instead of a rows-only
    * check. Recall impact of 1e-6 quantization on unit-scale embeddings is
    * nil; final candidate SCORING still uses the raw float vectors (the
    * `p_cosine_topk` recipe).
    */
  val IvfGrid = 1e6

  private[pipeline] def gridVec(xs: Array[Double]): Array[Long] =
    xs.map { x =>
      // keeps gridded dots exact in double: d·(10·1e6)² < 2⁵³ up to d≈90
      require(math.abs(x) <= 10.0,
        s"IVF grid assumes unit-scale embeddings, |$x| > 10")
      math.floor(x * IvfGrid + 0.5).toLong
    }

  /** Exact gridded cosine: integer dot/norms (loud on overflow), one float
    * division at the end — bit-identical to DuckDB evaluating
    * `list_dot_product / (sqrt·sqrt)` over the same integer-valued lists.
    */
  private[pipeline] def cosGrid(a: Array[Long], b: Array[Long]): Double = {
    var ab = 0L; var aa = 0L; var bb = 0L; var i = 0
    while (i < a.length) {
      ab = Math.addExact(ab, Math.multiplyExact(a(i), b(i)))
      aa = Math.addExact(aa, Math.multiplyExact(a(i), a(i)))
      bb = Math.addExact(bb, Math.multiplyExact(b(i), b(i)))
      i += 1
    }
    ab.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  }

  private def argmaxCluster(v: Array[Long], cs: Array[Array[Long]]): Int = {
    var best = 0; var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val cos = cosGrid(v, cs(c))
      if (cos > bestCos) { bestCos = cos; best = c } // strict > : ties keep lowest cid
      c += 1
    }
    best
  }

  /** IVF (inverted-file) centroids: deterministic spherical k-means over
    * the GRIDDED embedding column (see [[IvfGrid]]). Init = the k
    * lowest-id vectors (no RNG — reproducible on any cluster layout); each
    * Lloyd iteration is ONE data pass accumulating per-cluster component
    * sums against broadcast centroids (assignment = max exact gridded
    * cosine, ties to the lowest cluster id); a new centroid is the
    * component-wise mean re-gridded (`floor(sum/count + 0.5)`), and an
    * empty cluster keeps its previous centroid.
    *
    * All accumulation is exact longs, so ANY combine order gives the same
    * bits — the pass is a plain `treeAggregate` (the previous double-sum
    * version had to fold partials in partition-id order, and was still
    * only run-deterministic, not layout-deterministic).
    *
    * The centroid table is k×d longs — driver-held, like the solver's β.
    *
    * SCALE GUARD: Lloyd passes aggregate over a BOUNDED deterministic
    * sample — the `trainSampleCap` vectors with the lowest
    * md5₆₀('ivfs-' || id), ties by id (layout-independent and
    * oracle-reproducible, the `Det.md5Hash60` recipe every sampler here
    * uses). Centroid quality needs a representative sample, not the
    * corpus: training cost is one top-N hash scan plus `iters`·O(cap)
    * on the cached sample, instead of `iters` full corpus scans — the
    * scans stay O(corpus) only where the work is (assignment). Under the
    * cap the sample IS the corpus, merely reordered, and the exact-long
    * accumulation is combine-order-free, so centroids are bit-identical
    * to full-corpus training (which keeps the sf-scale oracles pinned).
    */
  def ivfCentroids(embeddings: DataFrame, k: Int = 16, iters: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   trainSampleCap: Int = 8192): Array[Array[Long]] = {
    val init: Array[Array[Long]] = embeddings
      .orderBy(col(idCol)).limit(k).select(vecCol).collect()
      .map(r => gridVec(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(init.nonEmpty, "ivfCentroids: empty input")
    require(trainSampleCap >= init.length,
      s"trainSampleCap=$trainSampleCap smaller than k=${init.length}")
    val kk = init.length
    val d = init.head.length
    val rows = embeddings
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .orderBy(Det.md5Hash60(concat(lit("ivfs-"), col("_id").cast("string"))),
        col("_id"))
      .limit(trainSampleCap)
      .select(col("_v"))
      // the top-N lands in one partition; spread the Lloyd work back out
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
      .rdd
      .map(r => gridVec(r.getSeq[Float](0).map(_.toDouble).toArray))
      .cache() // iterated `iters` times; bounded at cap rows
    var centroids = init
    for (_ <- 0 until iters) {
      val bc = rows.sparkContext.broadcast(centroids)
      // buffer layout: [component sums (kk·d) | member counts (kk)]
      val agg = rows.treeAggregate(new Array[Long](kk * d + kk))(
        (buf, v) => {
          val best = argmaxCluster(v, bc.value)
          var i = 0
          while (i < d) {
            buf(best * d + i) = Math.addExact(buf(best * d + i), v(i)); i += 1
          }
          buf(kk * d + best) += 1
          buf
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          a
        })
      bc.destroy()
      val prev = centroids
      centroids = Array.tabulate(kk) { c =>
        val n = agg(kk * d + c)
        if (n > 0)
          Array.tabulate(d)(i => math.floor(agg(c * d + i).toDouble / n + 0.5).toLong)
        else prev(c)
      }
    }
    rows.unpersist(blocking = false)
    centroids
  }

  /** Cluster assignment as a pure Catalyst expression: vectors grid to
    * longs in-plan, exact gridded cosine against the driver-held centroid
    * matrix via [[graft.functions.NearestCentroid]] — one constant-size
    * codegen'd loop whatever k is (the previous `least(...)` chain over k
    * per-centroid `VecCosine` structs emitted O(k·d) generated code,
    * which caps k well below the ~√N list counts a 100 TB inverted file
    * wants; `NearestCentroidSpec` pins the two forms bit-identical,
    * including ties → lowest cid and NaN handling). No rounding needed:
    * every compared value is bit-identical across engines by
    * construction.
    */
  def ivfAssign(embeddings: DataFrame, centroids: Array[Array[Long]],
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val vq = transform(col(vecCol),
      x => floor(x.cast("double") * lit(IvfGrid) + lit(0.5)).cast("long"))
    embeddings.withColumn("_vq", vq)
      .select(col(idCol).as("vec_id"),
        graft.functions.NearestCentroid.byCosine(col("_vq"), centroids)
          .as("cluster"))
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
    // nProbe nearest lists by the same exact gridded cosine the index was
    // built with; (−cos, cid) sort ties to the lowest cid — both engines
    // compare identical bits, so the probe→cluster fan-out is oracle-exact
    val probeClusters = probeRows.flatMap { case (pid, pv) =>
      val pq = gridVec(pv)
      centroids.zipWithIndex
        .map { case (c, i) => (-cosGrid(pq, c), i) }
        .sorted.take(nProbe)
        .map { case (_, cid) => (pid, pv.toSeq, cid) }
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

  // ------------------------------------------------ Product quantization --

  /** Grid-quantized copy of the embedding column (the [[IvfGrid]] spec):
    * all PQ arithmetic runs over these integer-valued longs, so distances
    * are exact in any engine and any accumulation order. Enforces the same
    * |x| ≤ 10 bound as the driver-side [[gridVec]] (loudly, via
    * `assert_true`): the ADC sums stay in LongType here, but an engine
    * accumulating in DOUBLE (or a future caller crossing 2⁵³) would
    * silently diverge between Spark's truncating and DuckDB's rounding
    * long casts. Within the bound, a squared component diff is ≤ 4·10¹⁴,
    * so a per-subspace sum stays under 2⁵³ for ds ≤ 22 dims even in
    * double; unit-scale embeddings (|x| ≤ 1) are safe to ds ≈ 2200.
    */
  private def pqGrid(vecCol: Column): Column =
    transform(vecCol, x =>
      when(assert_true(abs(x.cast("double")) <= lit(10.0),
        lit("PQ grid assumes unit-scale embeddings (|x| <= 10)")).isNull,
        floor(x.cast("double") * lit(IvfGrid) + lit(0.5)).cast("long")))

  /** Explode a gridded vector into its m subvectors: one row per
    * (subspace s, slice). `dim` must be divisible by m.
    */
  private def pqSubspaces(gq: Column, m: Int, dim: Int): Column = {
    val ds = dim / m
    explode(array((0 until m).map { s =>
      struct(lit(s).as("s"), slice(gq, s * ds + 1, ds).as("sv"))
    }: _*))
  }

  /** Loud cap on codebooks pulled to the driver for row-local encoding:
    * k·m rows of ds longs — broadcast-sized by construction (the PQ point
    * is a SMALL code set), but enforce it instead of trusting it.
    */
  private val MaxCodebookRows = 1 << 20

  /** Row-local PQ encode: `(keys..., s, code)` for every subspace of the
    * gridded vector column `gqCol`, argmin-ing against a DRIVER-HELD
    * codebook via [[graft.functions.NearestCentroid]] — m constant-size
    * codegen'd loops and a `posexplode`, NO join and NO aggregation.
    *
    * The join+`min(struct(d2, code))` form this replaces materialized
    * m·k rows PER VECTOR through a broadcast join and then shuffled them
    * back down in a groupBy — ~256 M intermediate rows at the ×1000
    * rehearsal decade (2 M vectors, m=8, k=16) for what is an O(k·ds)
    * per-row loop. Semantics are pinned identical: same exact
    * integer-valued double d² arithmetic in the same association order
    * (`(aa − 2ab) + bb`), ties to the LOWEST code id (codewords are laid
    * out in ascending code order per subspace, and the expression's
    * strict `<` keeps the first best).
    */
  private def pqEncodeCols(cbRows: Array[(Long, Int, Array[Long])],
                           m: Int, ds: Int, gqCol: Column): Column = {
    require(cbRows.length <= MaxCodebookRows,
      s"pqEncode: codebook has ${cbRows.length} rows, over the " +
        s"$MaxCodebookRows driver cap")
    val bySub: Array[(Array[Long], Array[Array[Long]])] =
      Array.tabulate(m) { s =>
        val rows = cbRows.filter(_._2 == s).sortBy(_._1)
        require(rows.nonEmpty, s"pqEncode: codebook has no codes for subspace $s")
        (rows.map(_._1), rows.map(_._3))
      }
    val codeCols = (0 until m).map { s =>
      val idx = graft.functions.NearestCentroid.byL2(
        slice(gqCol, s * ds + 1, ds), bySub(s)._2)
      element_at(typedLit(bySub(s)._1.toSeq), idx + lit(1))
    }
    posexplode(array(codeCols: _*))
  }

  /** PQ codebook from the k lowest-id vectors (the literal-centroid recipe
    * of `p_ann_ivf_assign`, so an oracle can reconstruct it by id): one row
    * per (subspace s, code), where `code` is the source vector's id and
    * `cw` its gridded subvector. k·m rows — broadcast-sized by
    * construction.
    */
  def pqCodebook(embeddings: DataFrame, k: Int, m: Int, dim: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    embeddings.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("code"), pqGrid(col(vecCol)).as("gq"))
      .select(col("code"), pqSubspaces(col("gq"), m, dim).as("e"))
      .select(col("code"), col("e.s").as("s"), col("e.sv").as("cw"))
  }

  /** Product-quantization encoding (Jégou et al., "Product quantization
    * for nearest neighbor search", IEEE TPAMI 2011): each vector's m
    * subvectors map to their nearest codeword by exact gridded squared-L2
    * (ties to the lowest code id). Returns the long format (vec_id, s,
    * code) — m small ints per vector, the 8×-compressed at-rest
    * representation ADC scoring consumes directly.
    *
    * Shape: ONE row-local scan — the codebook rides driver-held into m
    * constant-size [[graft.functions.NearestCentroid]] loops (see
    * [[pqEncodeCols]]); no join, no shuffle, no per-vector fan-out. d2
    * terms are integer-valued doubles < 2⁵³ (grid bound ±1e7 per
    * component), so every distance is exact.
    */
  def pqEncode(embeddings: DataFrame, codebook: DataFrame, m: Int, dim: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    // codebook is broadcast-sized by contract — pull it to the driver
    // (bounded + loud) and encode ROW-LOCALLY instead of exploding m·k
    // rows per vector through a broadcast join and shuffling them back
    // down in a groupBy (see [[pqEncodeCols]])
    val cbRows = codebook
      .select(col("code").cast("long"), col("s").cast("int"), col("cw"))
      .limit(MaxCodebookRows + 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    embeddings
      .select(col(idCol).as("vec_id"), pqGrid(col(vecCol)).as("gq"))
      .select(col("vec_id"),
        pqEncodeCols(cbRows, m, dim / m, col("gq")).as(Seq("s", "code")))
  }

  /** Learned PQ codebooks: per-subspace Lloyd iterations over the gridded
    * subvectors, all m subspaces trained in ONE `treeAggregate` pass per
    * iteration (buffer = m·k·(ds+1) longs — e.g. 1 152 at m=8, k=16,
    * ds=8 — driver-held like the IVF centroid table). Init = the k
    * lowest-id vectors' subvectors ([[pqCodebook]]'s recipe); assignment
    * = argmin exact gridded squared-L2 with ties to the lowest code;
    * update = component mean re-gridded; an empty code keeps its previous
    * codeword. All accumulation is exact longs, so the learned codebooks
    * are bit-identical under any partitioning (asserted in PipelineSpec).
    *
    * Returns codebooks(s)(c) = gridded codeword; feed [[pqCodebookDf]]
    * into [[pqEncode]]/[[pqTopK]].
    */
  def pqTrain(embeddings: DataFrame, k: Int, m: Int, dim: Int, iters: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Array[Array[Long]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val ds = dim / m
    val init: Array[Array[Long]] = embeddings
      .orderBy(col(idCol)).limit(k).select(vecCol).collect()
      .map(r => gridVec(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(init.nonEmpty, "pqTrain: empty input")
    val kk = init.length
    // codebooks(s)(c)(d0)
    var cb: Array[Array[Array[Long]]] =
      Array.tabulate(m, kk)((s, c) => init(c).slice(s * ds, s * ds + ds))
    val rows = graft.util.Tables.spread(embeddings.select(vecCol)).rdd
      .map(r => gridVec(r.getSeq[Float](0).map(_.toDouble).toArray))

    def argminCode(v: Array[Long], off: Int, cws: Array[Array[Long]]): Int = {
      var best = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < cws.length) {
        var d = 0L; var i = 0
        val cw = cws(c)
        while (i < cw.length) {
          val diff = v(off + i) - cw(i)
          d = Math.addExact(d, Math.multiplyExact(diff, diff)); i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest code
        c += 1
      }
      best
    }

    for (_ <- 0 until iters) {
      val bc = rows.sparkContext.broadcast(cb)
      // buffer layout per subspace s: [sums (kk·ds) | counts (kk)]
      val span = kk * ds + kk
      val agg = rows.treeAggregate(new Array[Long](m * span))(
        (buf, v) => {
          var s = 0
          while (s < m) {
            val best = argminCode(v, s * ds, bc.value(s))
            val base = s * span + best * ds
            var i = 0
            while (i < ds) {
              buf(base + i) = Math.addExact(buf(base + i), v(s * ds + i)); i += 1
            }
            buf(s * span + kk * ds + best) += 1
            s += 1
          }
          buf
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          a
        })
      bc.destroy()
      cb = Array.tabulate(m, kk) { (s, c) =>
        val n = agg(s * span + kk * ds + c)
        if (n == 0L) cb(s)(c) // empty code: keep previous codeword
        else Array.tabulate(ds) { i =>
          math.floor(agg(s * span + c * ds + i).toDouble / n + 0.5).toLong
        }
      }
    }
    cb
  }

  /** Trained codebooks as the (code, s, cw) DataFrame [[pqEncode]] and
    * [[pqTopK]] consume (codes are 0..k−1 here, not vector ids).
    */
  def pqCodebookDf(spark: org.apache.spark.sql.SparkSession,
                   cb: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    val rows = for {
      s <- cb.indices; c <- cb(s).indices
    } yield (c.toLong, s, cb(s)(c).toSeq)
    rows.toDF("code", "s", "cw")
  }

  /** PQ top-k with asymmetric distance computation (ADC): probes stay
    * unquantized; per (probe, subspace, code) the exact gridded d² makes a
    * lookup table, and a candidate's approximate distance is the sum of
    * its m codes' LUT entries. All-join formulation — the LUT is a
    * DataFrame keyed (s, code), so scoring is one broadcast equi-join
    * against the encoded corpus plus a map-side-combinable sum: no
    * driver-side LUT literals, no per-probe plan.
    *
    * At 100 TB: candidates live as m bytes each (the encode output),
    * the LUT is |probes|·m·k rows (broadcast), and the scored stream is
    * map-side-reduced from m rows to 1 per (probe, candidate) before the
    * shuffle. Ranking partitions by probe like [[cosineTopK]].
    */
  def pqTopK(embeddings: DataFrame, codebook: DataFrame, probePred: Column,
             topK: Int, m: Int, dim: Int, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val enc = pqEncode(embeddings, codebook, m, dim, idCol, vecCol)
    val probeSub = embeddings.filter(probePred)
      .select(col(idCol).as("probe_id"), pqGrid(col(vecCol)).as("gq"))
      .select(col("probe_id"), pqSubspaces(col("gq"), m, dim).as("e"))
      .select(col("probe_id"), col("e.s").as("s"), col("e.sv").as("pv"))
    val pd2 = dot(col("pv"), col("pv")) - lit(2.0) * dot(col("pv"), col("cw")) +
      dot(col("cw"), col("cw"))
    val lut = probeSub.join(codebook, Seq("s"))
      .select(col("probe_id"), col("s"), col("code"), pd2.as("pd2"))
    val scored = enc.join(broadcast(lut), Seq("s", "code"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("pd2")).cast("long").as("d2"))
      .filter(col("vec_id") =!= col("probe_id"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("cand_id"), col("d2"))
  }

  /** IVF-PQ: the FAISS flagship index shape (Jégou et al. 2011, §IV —
    * "IVFADC"), composed from the exact-integer pieces already here.
    * Vectors coarse-assign to their nearest of `kLists` centroids by exact
    * gridded squared-L2 (row-local [[graft.functions.NearestCentroid]]
    * over the driver-held centroid matrix — no shuffle, constant-size
    * generated code at any `kLists`), and product quantization runs on the
    * RESIDUAL `gq − centroid` (integer subtraction on the grid, so still
    * exact): the residual codebook is the `kCodes` lowest-id vectors'
    * residuals (the literal-id recipe every PQ oracle here uses), encode
    * is per-subspace argmin d² — row-local via [[pqEncodeCols]], no join —
    * and a probe scores ONLY the `nProbe` lists nearest to it — its
    * per-list residual LUT equi-joins the encoded corpus on
    * (cluster, s, code), so unprobed lists never enter the plan.
    *
    * At 100 TB: assignment + encode are ONE row-local scan (the centroid
    * table and codebook ride driver-held into codegen'd loops); the index
    * at rest is m bytes + a cluster id per vector; a query touches
    * |probes|·nProbe lists via one broadcast equi-join, map-side-combining
    * m rows per (probe, cand) before the shuffle. Distances stay exact integers end-to-end (unit-scale
    * embeddings: residual components ≤ 2·10⁶ + 1, squared ≤ 4.4·10¹²,
    * comfortably inside 2⁵³ for any realistic ds·m).
    */
  def ivfPqTopK(embeddings: DataFrame, probePred: Column, topK: Int,
                kLists: Int, nProbe: Int, kCodes: Int, m: Int, dim: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(nProbe >= 1 && nProbe <= kLists, s"nProbe $nProbe out of [1, $kLists]")
    // coarse centroid table: kLists×dim longs, driver-held like ivfTopK's
    val centroids: Array[Array[Long]] = embeddings
      .orderBy(col(idCol)).limit(kLists).select(vecCol).collect()
      .map(r => gridVec(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(centroids.length == kLists, s"fewer than $kLists vectors")
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    def d2To(c: Array[Long]) = {
      val cl = typedLit(c.toSeq)
      dot(col("gq"), col("gq")) - lit(2.0) * dot(col("gq"), cl) + dot(cl, cl)
    }
    val assignChoices = centroids.zipWithIndex.map { case (c, i) =>
      struct(d2To(c).as("d2"), lit(i).as("cid"))
    }
    // corpus-side coarse assignment: one constant-size codegen loop over
    // the centroid matrix (NearestCentroidSpec pins it bit-identical to
    // the `least` chain over `assignChoices`, which would emit O(k·d)
    // generated code — the N-row path must survive k ≈ √N list counts).
    // The PROBE side below keeps the k-branch array_sort: it needs the
    // nProbe BEST lists, not the single best, and only runs on the tiny
    // probe set — still k-bounded by codegen size, like `centLit`.
    val bestCluster = graft.functions.NearestCentroid.byL2(col("gq"), centroids)
    // (vec_id, cluster, rq): gridded residual vs the assigned centroid —
    // row-local, one scan, nothing shuffles
    val residuals = embeddings
      .select(col(idCol).as("vec_id"), pqGrid(col(vecCol)).as("gq"))
      .withColumn("cluster", bestCluster)
      .withColumn("rq", zip_with(col("gq"),
        element_at(centLit, col("cluster") + 1), (a, b) => a - b))
      .select(col("vec_id"), col("cluster"), col("rq"))
    // residual codebook: collected ONCE (kCodes·m rows, tiny by
    // construction) — the same driver-held codewords feed both the
    // row-local corpus encode (no join, no shuffle — see
    // [[pqEncodeCols]]) and the probe-side LUT join below
    val cbRows = residuals.orderBy(col("vec_id")).limit(kCodes)
      .select(col("vec_id").as("code"), pqSubspaces(col("rq"), m, dim).as("e"))
      .select(col("code"), col("e.s").as("s"), col("e.sv").as("cw"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val codebook = cbRows.toSeq.map { case (c, s, cw) => (c, s, cw.toSeq) }
      .toDF("code", "s", "cw")
    val subD2 = dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("cw")) +
      dot(col("cw"), col("cw"))
    val enc = residuals
      .select(col("vec_id"), col("cluster"),
        pqEncodeCols(cbRows, m, dim / m, col("rq")).as(Seq("s", "code")))
      .select(col("vec_id"), col("cluster"), col("s"), col("code"))
    // probes: nProbe nearest lists by the SAME exact d², ties to the
    // lowest cid (array_sort on (d2, cid) structs); per-list residual LUT
    val probes = embeddings.filter(probePred)
      .select(col(idCol).as("probe_id"), pqGrid(col(vecCol)).as("gq"))
      .withColumn("cluster",
        explode(slice(array_sort(array(assignChoices: _*)), 1, nProbe)
          .getField("cid")))
      .withColumn("rq", zip_with(col("gq"),
        element_at(centLit, col("cluster") + 1), (a, b) => a - b))
    val lut = probes
      .select(col("probe_id"), col("cluster"), pqSubspaces(col("rq"), m, dim).as("e"))
      .select(col("probe_id"), col("cluster"), col("e.s").as("s"), col("e.sv").as("sv"))
      .join(broadcast(codebook), Seq("s"))
      .select(col("probe_id"), col("cluster"), col("s"), col("code"),
        subD2.as("pd2"))
    val scored = enc.join(broadcast(lut), Seq("cluster", "s", "code"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("pd2")).cast("long").as("d2"))
      .filter(col("vec_id") =!= col("probe_id"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("cand_id"), col("d2"))
  }

  // ---------------------------------------------------------- SemDeDup --

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540; the reference has no embedding surface — this is
    * brief-extension territory): shard the corpus into semantic clusters
    * by broadcast-centroid argmax (row-local [[graft.functions.NearestCentroid]]
    * over the driver-held centroid matrix — no join, no shuffle to
    * assign, constant-size generated code at any k), generate candidate pairs
    * only WITHIN a cluster (equi-join on the cluster id — never
    * all-pairs; the paper's k-means sharding), verify with the rounded
    * exact cosine, and keep the lowest-id member of every near-identical
    * neighborhood: a vector is dropped iff some lower-id same-cluster
    * vector sits at cosine >= threshold from it. Greedy keep-lowest is
    * deterministic and join-expressible — no iterative component
    * resolution on the hot path (`Dedup.dupClusters` composes on top when
    * the full grouping is wanted).
    *
    * Zero-norm vectors have no direction (cosine NaN): excluded up front
    * from assignment, pairing and output, mirroring [[int8CosineTopK]].
    *
    * At scale: assignment is one map-only pass; the pair stage shuffles
    * each vector once on its cluster id, and cluster sizes bound the
    * quadratic term exactly as bucket sizes do in [[cosineNearDupPairs]]
    * (skewed clusters re-split by AQE; the centroid count trades cluster
    * size against recall, like the paper's k). The assignment frame fans
    * out three ways (both pair sides + the verdict join), so it is
    * persisted for the pair stage and the tiny drop set is materialized
    * eagerly; the returned frame replays only the map-only assignment.
    *
    * Output: (vec_id, cluster, kept) for every nonzero-norm vector.
    */
  def semanticDedup(embeddings: DataFrame, centroids: Seq[(Long, Seq[Double])],
                    threshold: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "semanticDedup: no centroids")
    val nz = embeddings
      .filter(dot(col(vecCol), col(vecCol)) > 0.0)
      .select(col(idCol).as("vec_id"), col(vecCol).as("ev"))
    // constant-size codegen'd argmax whatever the centroid count (the
    // previous `least` chain over per-centroid `(−round(cos,9), cid)`
    // structs emitted O(k·d) generated code — SemDeDup at corpus scale
    // wants k in the tens of thousands). Centroids sorted by cid so the
    // expression's ties-to-lowest-INDEX rule lands on the lowest cid,
    // exactly like the struct comparison; round-9-then-compare semantics
    // are pinned bit-identical by `NearestCentroidSpec`.
    val sorted = centroids.sortBy(_._1)
    val bestIdx = graft.functions.NearestCentroid.byCosineRounded(
      col("ev"), sorted.map(_._2.toArray).toArray, digits = 9)
    val cidOf = typedLit(sorted.map(_._1))
    val assigned = nz.withColumn("cluster", element_at(cidOf, bestIdx + lit(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cluster").as("c_a"), col("vec_id").as("v1"),
      col("ev").as("e1"))
    val b = assigned.select(col("cluster").as("c_b"), col("vec_id").as("v2"),
      col("ev").as("e2"))
    val drops = a.join(b, col("c_a") === col("c_b") && col("v1") < col("v2"))
      .filter(round(cosine(col("e1"), col("e2")), 9) >= threshold)
      .select(col("v2").as("vec_id")).distinct()
      .localCheckpoint() // eager: tiny, and forces the pair stage now
    assigned.unpersist(blocking = false)
    // the checkpointed drop set carries no stats, so the static plan would
    // sort-merge; it is |dups|-sized by construction — broadcast it
    assigned.join(broadcast(drops.withColumn("_drop", lit(true))), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("_drop").isNull.as("kept"))
  }

  /** Approximate top-k: exact cosine ranking restricted to same-bucket
    * candidates (see [[lshBucket]]).
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
