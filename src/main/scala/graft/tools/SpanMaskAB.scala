package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import java.nio.file.{Files, Paths}

/** A/B/C-adjudicate `Packing.spanMaskReport`'s plan shape (the round-9
  * verdict's open trade: the round-8 persist of the span substrate cost
  * +0.3 s at sf0.1 against an avoided double execution that was CLAIMED,
  * not measured, to dominate at scale).
  *
  * Three variants of the same computation, identical outputs asserted:
  *
  *   - `fanout_free`: the SHIPPED shape — cheap tokenize scan feeds
  *     packing, `Dedup.dupIslands` (affected docs only) feeds the mask
  *     join; the gram substrate is evaluated exactly once, no persist.
  *   - `legacy_persist`: the round-8/9 shape — one bundled
  *     `dupSpanIntervals` frame consumed by both packing and the mask
  *     join, persisted MEMORY_AND_DISK across the fan-out.
  *   - `legacy_recompute`: the bundled frame with no persist (the
  *     substrate executes once per consumer).
  *
  * Runs interleaved A/B/C/A/B/C so a drifting box biases no variant,
  * reports per-variant min. Writes one JSON line:
  *
  * `{"metric":"spanmask_persist_ab","sf":...,"fanout_free_sec":...,
  *   "persist_on_sec":...,"persist_off_sec":...,"*_runs":[...],
  *   "n_shards_out":...,"steal_pct":...}`
  *
  * Usage: runMain graft.tools.SpanMaskAB <sfDir> [outPath]
  */
object SpanMaskAB {

  private def cpuStat(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val parts = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        Some((parts.sum, if (parts.length > 7) parts(7) else 0L))
      } finally src.close()
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("SPANMASK_AB.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .appName("graft-spanmask-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    // the p_pack_span_masks production parameters
    val (n, nShards, seqLen, salt) = (8, 4, 128, "mask0")
    val docs = graft.util.Tables.t(spark, sfDir, "documents")
    val P = graft.pipeline.Packing

    def legacy(persist: Boolean): DataFrame = {
      val spansRaw = graft.pipeline.Dedup.dupSpanIntervals(docs, n)
        .filter(col("n_tokens") > 0)
      val spans =
        if (persist) spansRaw.persist(StorageLevel.MEMORY_AND_DISK) else spansRaw
      // faithful to the round-8/9 shape: the mask join consumes the FULL
      // bundled frame (empty islands explode to nothing), not a
      // pre-filtered one
      val out = P.maskRollup(
        P.packChunks(spans, "doc_id", "n_tokens", nShards, seqLen, salt),
        spans, seqLen)
        .localCheckpoint()
      spans.unpersist(blocking = false)
      out
    }

    def run(mode: String): (Seq[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val df = mode match {
        case "shipped" => P.spanMaskReport(docs, n, nShards, seqLen, salt)
        case "persist" => legacy(persist = true)
        case "recompute" => legacy(persist = false)
      }
      val rows = df.orderBy("shard").collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_mask_tokens"))).toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    // interleave AND rotate the order per round: drift hits every variant
    // equally, and no variant always runs last (warmup/page-cache bias)
    val modes = Seq("shipped", "persist", "recompute")
    val rounds = (0 until 3).map { r =>
      val rot = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      rot.map(m => m -> run(m)).toMap
    }
    val outputs = rounds.flatMap(_.values.map(_._1)).distinct
    require(outputs.size == 1,
      s"variants disagree on (shard, n_mask_tokens): $outputs")

    def runsOf(m: String) = rounds.map(_(m)._2)
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"spanmask_persist_ab","sf":"$sfDir",""" +
        s""""fanout_free_sec":${runsOf("shipped").min},""" +
        s""""persist_on_sec":${runsOf("persist").min},""" +
        s""""persist_off_sec":${runsOf("recompute").min},""" +
        s""""fanout_free_runs":[${runsOf("shipped").mkString(",")}],""" +
        s""""on_runs":[${runsOf("persist").mkString(",")}],""" +
        s""""off_runs":[${runsOf("recompute").mkString(",")}],""" +
        s""""n_shards_out":${outputs.head.size},""" +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
