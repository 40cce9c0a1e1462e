package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequency sketches for token streams.
  *
  * Misra–Gries heavy hitters: a one-pass, fixed-memory (k counters)
  * per-partition summary. Merging summaries (sum counts, then subtract the
  * (k+1)-th largest and drop non-positives — Agarwal et al., "Mergeable
  * Summaries", PODS'12) preserves the guarantee that every item with
  * global count > N/k survives in the merged candidate set. The sketch's
  * counts are only approximate (error <= N/k) and DEPEND on partitioning,
  * so the distributed answer is made deterministic the same way the LSH
  * dedup is: a second exact pass restricted to the <= k candidates (an
  * `isin` literal filter pushed into the scan — never a full-vocabulary
  * groupBy) recovers exact counts, and the final `count*k > N` cut is
  * partition-independent.
  *
  * Scale notes (100 TB): pass 1 is map-side only — each task emits one
  * <= k-entry map, reduced executor-side by `Dataset.reduce`; no shuffle
  * of token rows. Pass 2 filters to <= k tokens before its groupBy, so the
  * shuffle carries at most k distinct keys per partition.
  */
object Sketch {

  /** One Misra–Gries update step on a mutable counter map capped at k. */
  def mgUpdate(counters: mutable.Map[String, Long], item: String, k: Int): Unit =
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        // decrement-all; drop zeros (amortized O(1) per stream item)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.foreach { case (t, c) =>
          if (c == 1L) dead += t else counters.update(t, c - 1)
        }
        dead.foreach(counters.remove)
    }

  /** Sketch one partition: (items seen, counter map with <= k entries). */
  def mgSummarize(items: Iterator[String], k: Int): (Long, Map[String, Long]) = {
    val counters = mutable.Map.empty[String, Long]
    var n = 0L
    items.foreach { it => n += 1; mgUpdate(counters, it, k) }
    (n, counters.toMap)
  }

  /** Merge two (count, summary) pairs, re-capping at k entries. */
  def mgMerge(a: (Long, Map[String, Long]), b: (Long, Map[String, Long]),
      k: Int): (Long, Map[String, Long]) = {
    val summed = mutable.Map.empty[String, Long]
    a._2.foreach { case (t, c) => summed.update(t, c) }
    b._2.foreach { case (t, c) => summed.update(t, summed.getOrElse(t, 0L) + c) }
    val merged =
      if (summed.size <= k) summed.toMap
      else {
        val cut = summed.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        summed.iterator.collect { case (t, c) if c > cut => t -> (c - cut) }.toMap
      }
    (a._1 + b._1, merged)
  }

  /** Distributed pass 1: total item count + candidate set (superset of all
    * items with count > N/k), from one scan with map-side-only sketches.
    */
  def mgCandidates(tokens: Dataset[String], k: Int): (Long, Set[String]) = {
    if (tokens.isEmpty) return (0L, Set.empty)
    import tokens.sparkSession.implicits._
    val (n, summary) = tokens
      .mapPartitions(it => Iterator.single(mgSummarize(it, k)))
      .reduce((a, b) => mgMerge(a, b, k))
    (n, summary.keySet)
  }

  /** Exact heavy hitters over a one-column DataFrame of tokens: all tokens
    * with count * k > N, exact counts, ordered by (count desc, token).
    * Deterministic regardless of partitioning: the sketch only prunes.
    */
  def heavyHittersExact(tokens: DataFrame, k: Int, tokCol: String = "tok"): DataFrame = {
    import tokens.sparkSession.implicits._
    val (n, cand) = mgCandidates(tokens.select(col(tokCol)).as[String], k)
    tokens
      .filter(col(tokCol).isin(cand.toSeq.sorted: _*))
      .groupBy(tokCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .orderBy(col("cnt").desc, col(tokCol))
  }

  /** Count-Min sketch over a token column — the OTHER classic mergeable
    * frequency sketch next to Misra–Gries: `d` hash rows × `w` buckets
    * of counters; an item's estimate is the MIN over its d buckets and
    * never underestimates (Cormode–Muthukrishnan 2005; overestimate
    * ≤ 2N/w with prob ≥ 1−2⁻ᵈ). Where MG's sketch depends on partition
    * order (hence the exact second pass above), CM bucket counts are
    * plain sums — the map-side-combinable groupBy IS the distributed
    * sketch merge, the result is bit-deterministic, and the shuffle
    * after partial aggregation carries at most d·w rows per task
    * regardless of corpus size. Hash row j salts the shared md5₆₀
    * recipe with `cms{j}-`, so a SQL oracle reproduces the exact bucket
    * layout. Output: (r, b, cnt) for non-empty buckets.
    */
  def countMinSketch(tokens: DataFrame, d: Int, w: Int,
      tokCol: String = "tok"): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1, w >= 1; got d=$d w=$w")
    tokens.select(col(tokCol).as("t"))
      .select(explode(expr(s"sequence(0, ${d - 1})")).as("r"), col("t"))
      .select(col("r"),
        (graft.util.Det.md5Hash60(
          concat(lit("cms"), col("r").cast("string"), lit("-"), col("t"))) % w).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]]: min over the d bucket
    * counters of each probe (absent buckets count 0). The probe set is a
    * driver-held literal — the deployment shape is "query yesterday's
    * sketch", and the sketch itself is d·w rows, broadcastable at any
    * corpus size.
    */
  def countMinEstimate(sketch: DataFrame, probes: Seq[String], d: Int,
      w: Int): DataFrame = {
    require(probes.nonEmpty, "probe set is empty")
    val sp = sketch.sparkSession
    import sp.implicits._
    val pdf = (for { p <- probes; j <- 0 until d } yield (p, j))
      .toDF("probe", "r")
      .withColumn("b", graft.util.Det.md5Hash60(
        concat(lit("cms"), col("r").cast("string"), lit("-"), col("probe"))) % w)
    pdf.join(sketch, Seq("r", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("probe").agg(min(col("cnt")).as("est_cnt"))
  }
}
