package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** A/B-adjudicate the multi-order span family's window-key substrate
  * (round-10 verdict "Next round" #5): rolling 128-bit polynomial hashes
  * ([[graft.functions.RollingGramHashes]], O(L) per doc, 2 longs per
  * window) vs md5 over materialized gram strings (O(L·n) concatenation,
  * 1 long per window). The CPU term favors rolling; the dup-set
  * distinct/groupBy shuffles 8 more bytes per window row — this measures
  * which wins at the production parameters on real data.
  *
  * Two operators × two substrates, interleaved and rotated per round so
  * host drift biases nothing; per-variant min over rounds; outputs
  * asserted identical across substrates (the geometry pin, corpus-scale
  * this time). Writes one JSON line:
  *
  * `{"metric":"span_substrate_ab","sf":...,
  *   "multi_rolling_sec":...,"multi_md5_sec":...,
  *   "removal_rolling_sec":...,"removal_md5_sec":...,"*_runs":[...],
  *   "steal_pct":...}`
  *
  * Usage: runMain graft.tools.SpanSubstrateAB <sfDir> [outPath]
  */
object SpanSubstrateAB {

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
    val outPath = args.lift(1).getOrElse("SPANSUBSTRATE_AB.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .appName("graft-spansubstrate-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val docs = graft.util.Tables.spread(
      graft.util.Tables.t(spark, sfDir, "documents"))
    val D = graft.pipeline.Dedup

    // the p_dup_spans_multi / p_dup_span_removal production parameters
    val profNs = Seq(8, 16, 32); val profMinLen = 50
    val remNs = Seq(8, 16, 32); val remMinLen = 20

    // fingerprints, not full collects: cheap, order-free, pins geometry
    def profileFp(md5: Boolean): DataFrame =
      D.dupSpanProfileMulti(docs, profNs, profMinLen, md5Substrate = md5)
        .agg(count(lit(1)).as("n"),
          sum(col("n_spans")).as("spans"),
          sum(col("covered_tokens")).as("covered"),
          max(col("longest_span")).as("longest"))
    def removalFp(md5: Boolean): DataFrame =
      D.removeDupSpans(docs, remNs, remMinLen, md5Substrate = md5)
        .agg(count(lit(1)).as("pieces"),
          sum(col("n_tokens")).as("toks"),
          sum(col("cut_tokens")).as("cut"),
          bit_xor(xxhash64(col("doc_id"), col("piece_idx"), col("st"),
            col("en"), col("text"))).as("geom"))

    def run(mode: String): (Seq[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val df = mode match {
        case "multi_rolling" => profileFp(md5 = false)
        case "multi_md5" => profileFp(md5 = true)
        case "removal_rolling" => removalFp(md5 = false)
        case "removal_md5" => removalFp(md5 = true)
      }
      val rows = df.collect().toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val modes = Seq("multi_rolling", "multi_md5", "removal_rolling", "removal_md5")
    val rounds = (0 until 3).map { r =>
      val rot = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      rot.map(m => m -> run(m)).toMap
    }
    for (pair <- Seq(("multi_rolling", "multi_md5"), ("removal_rolling", "removal_md5"))) {
      val fps = rounds.flatMap(rr => Seq(rr(pair._1)._1, rr(pair._2)._1)).distinct
      require(fps.size == 1, s"substrates disagree on ${pair._1} geometry: $fps")
    }

    def runsOf(m: String) = rounds.map(_(m)._2)
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"span_substrate_ab","sf":"$sfDir",""" +
        modes.map(m => s""""${m}_sec":${runsOf(m).min}""").mkString(",") + "," +
        modes.map(m => s""""${m}_runs":[${runsOf(m).mkString(",")}]""").mkString(",") + "," +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
