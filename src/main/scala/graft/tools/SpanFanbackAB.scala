package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** A/B-adjudicate the multi-order span family's DUPLICATION-VERDICT PLAN:
  * the round-13 window shape (ONE gram-keyed exchange; `min/max(doc_id)
  * over (partition by n, g1, g2)` decides ">= 2 distinct docs" and the
  * keeper on every raw window row in place — the shipped
  * `Dedup.multiDupIntervals`/`removalCutIntervals`) vs the round-12
  * aggregate + join-back shape (per-gram (min, max) dup set, joined back
  * to the raw stream — retained as `multiDupIntervalsJoin`/
  * `removalCutIntervalsJoin`). The join shape re-shuffles the full tagged
  * stream a second time and re-scans the substrate for the probe side
  * once the dup set outgrows a broadcast — the named residual behind the
  * family's ×1000 d3 ≈ 1.1–1.4 (VERDICT r12); the window shape moves the
  * stream through exactly one exchange + sort and zero joins.
  *
  * Both operators' interval stages are measured (the downstream row-local
  * folds are identical code in both shapes); interval multisets are
  * pinned identical across shapes via (count, xor) fingerprints.
  * Rotated-interleave × `reps` rounds, min per variant. Writes one JSON
  * line.
  *
  * Usage: runMain graft.tools.SpanFanbackAB <sfDir> [outPath] [reps]
  */
object SpanFanbackAB {

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
    val outPath = args.lift(1).getOrElse("SPANFANBACK_AB.json")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .appName("graft-spanfanback-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val ns = Seq(8, 16, 32)
    val D = graft.pipeline.Dedup
    // both shapes read the same warm persisted substrate, so the timing
    // isolates the verdict plan (the join shape's SECOND substrate scan
    // reads the cache here — on a cold 100 TB run it would re-read the
    // lake, so this A/B UNDERSTATES the window shape's advantage)
    val base = graft.util.Tables.spread(
        graft.util.Tables.t(spark, sfDir, "documents"))
      .select(col("doc_id"),
        graft.pipeline.TextPipeline.tokens(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()

    def fp(iv: DataFrame): Seq[org.apache.spark.sql.Row] =
      iv.agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("doc_id"), col("st"), col("en"))),
          lit(0L)).as("x")).collect().toSeq

    def run(mode: String): (Seq[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val rows = mode match {
        case "multi_window" => fp(D.multiDupIntervals(base, ns, md5 = false))
        case "multi_join" => fp(D.multiDupIntervalsJoin(base, ns, md5 = false))
        case "removal_window" => fp(D.removalCutIntervals(base, ns, md5 = false))
        case "removal_join" => fp(D.removalCutIntervalsJoin(base, ns, md5 = false))
      }
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val modes = Seq("multi_window", "multi_join", "removal_window", "removal_join")
    val rounds = (0 until reps).map { r =>
      val rot = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      rot.map(m => m -> run(m)).toMap
    }
    for (pair <- Seq(("multi_window", "multi_join"),
        ("removal_window", "removal_join"))) {
      val fps = rounds.flatMap(rr => Seq(rr(pair._1)._1, rr(pair._2)._1)).distinct
      require(fps.size == 1, s"shapes disagree on ${pair._1} intervals: $fps")
    }
    base.unpersist(blocking = false)

    def runsOf(m: String) = rounds.map(_(m)._2)
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"span_fanback_ab","sf":"$sfDir","shuffle_partitions":$shufflePartitions,""" +
        modes.map(m => s""""${m}_sec":${runsOf(m).min}""").mkString(",") + "," +
        modes.map(m => s""""${m}_runs":[${runsOf(m).mkString(",")}]""").mkString(",") + "," +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
