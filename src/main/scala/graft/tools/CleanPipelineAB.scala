package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** A/B the composed cleanup's INTERMEDIATE-materialization choice at
  * decade scale: the shipped [[graft.pipeline.CleanPipeline.cleanCorpus]]
  * hands the removal stage a LAZY cleaned corpus, so stage 2's substrate
  * persist AND its lazy emission tail each re-derive the paragraph chain
  * (cheap over raw parquet, not free over 2.5 M derived pages at ×1000 —
  * `p_clean_pipeline` read d3 1.17 where both components sit ≤ 0.85).
  * Variants, rotated-interleaved × reps, piece geometry pinned identical:
  *
  *   - `lazy`: the shipped composition (re-derive per consumer)
  *   - `ckpt`: `localCheckpoint` the cleaned (doc_id, text) corpus before
  *     stage 2 (single derivation; corpus-sized block-manager residency —
  *     the local stand-in for staging the cleaned corpus to the lake
  *     between passes, which is what a 100 TB run would do)
  *
  * Usage: runMain graft.tools.CleanPipelineAB <sfDir> [outPath] [reps]
  */
object CleanPipelineAB {

  private def cpuStat(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        Some((f.sum, if (f.length > 7) f(7) else 0L))
      } finally src.close()
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("CLEANPIPE_AB.json")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .appName("graft-cleanpipe-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val P = graft.pipeline.CleanPipeline
    // the same two-doc page synthesis as the p_clean_pipeline query, so
    // the A/B exercises the real paragraph structure (raw documents are
    // single-unit word soup — the paragraph stage would be trivial)
    val docs = graft.util.Tables.spread(
        graft.util.Tables.t(spark, sfDir, "documents"))
      .select(explode(array(expr("doc_id div 4"), expr("doc_id div 4 - 1")))
        .as("page_id"), col("doc_id"), col("text"))
      .filter(col("page_id") >= 0)
      .groupBy("page_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text")), "\n\n").as("text"))
      .select(col("page_id").as("doc_id"), col("text"))

    def fp(df: DataFrame): Seq[org.apache.spark.sql.Row] =
      df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("doc_id"), col("piece_idx"),
          col("st"), col("en"))), lit(0L))).collect().toSeq

    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    def run(mode: String): (Seq[org.apache.spark.sql.Row], Double) = {
      drop()
      val t0 = System.nanoTime()
      val rows = mode match {
        case "lazy" => fp(P.cleanCorpus(docs, minLen = 20))
        case "ckpt" =>
          val cleaned = P.rejoinKept(
            graft.pipeline.ParagraphDedup.dedupUnits(docs), "\n\n")
            .localCheckpoint()
          fp(graft.pipeline.Dedup.removeDupSpansExact(cleaned, 20))
      }
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val modes = Seq("lazy", "ckpt")
    val rounds = (0 until reps).map { r =>
      val rot = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      rot.map(m => m -> run(m)).toMap
    }
    val fps = rounds.flatMap(rr => modes.map(m => rr(m)._1)).distinct
    require(fps.size == 1, s"variants disagree on piece geometry: $fps")

    def runsOf(m: String) = rounds.map(_(m)._2)
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"cleanpipe_ab","sf":"$sfDir","shuffle_partitions":$parts,""" +
        modes.map(m => s""""${m}_sec":${runsOf(m).min}""").mkString(",") + "," +
        modes.map(m => s""""${m}_runs":[${runsOf(m).mkString(",")}]""").mkString(",") + "," +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
