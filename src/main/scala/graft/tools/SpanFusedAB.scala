package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** A/B-adjudicate the multi-order span family's ORDER PLAN: the fused
  * shape (all gram orders in one tagged generator pass → ONE
  * `(n, g1, g2)`-keyed dup-set shuffle and ONE probe join — the shipped
  * `Dedup.multiDupIntervals`/`removalCutIntervals`) vs the round-10
  * chained shape (one gram chain PER ORDER: |ns| substrate scans per
  * consumer, |ns| separate dup-set shuffles, unioned at the end —
  * reconstructed inline here from the public window-key functions, the
  * SpanMaskAB pattern for retired variants). Same total rows either way;
  * the fused form trades |ns| stage barriers for one wider key.
  *
  * Both operators' interval stages are measured (the downstream row-local
  * folds are identical code in both shapes and would only dilute the
  * signal); interval multisets are pinned identical across shapes via
  * (count, xor) fingerprints. Rotated-interleave × 3 rounds, min per
  * variant. Writes one JSON line.
  *
  * Usage: runMain graft.tools.SpanFusedAB <sfDir> [outPath]
  */
object SpanFusedAB {

  private def cpuStat(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        Some((f.sum, if (f.length > 7) f(7) else 0L))
      } finally src.close()
    } catch { case _: Throwable => None }

  /** The retired round-10 shape: per-order rolling-hash chains, unioned.
    * `keeperAware = false` is the profile's dup-set semi join,
    * `true` the removal's keeper-excluding inner join.
    */
  private def chainedIntervals(base: DataFrame, ns: Seq[Int],
      keeperAware: Boolean): DataFrame =
    ns.map { n =>
      val grams = base.select(col("doc_id"),
          posexplode(graft.functions.RollingGramHashes
            .rollingGramHashes(col("toks"), n)))
        .select(col("doc_id"), col("pos").cast("long").as("i"),
          col("col.h1").as("g1"), col("col.h2").as("g2"))
      val iv =
        if (keeperAware) {
          val dupSet = grams.select("doc_id", "g1", "g2").distinct()
            .groupBy("g1", "g2")
            .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("keeper"))
            .filter(col("nd") >= 2).select("g1", "g2", "keeper")
          grams.join(dupSet, Seq("g1", "g2"))
            .filter(col("doc_id") =!= col("keeper"))
        } else {
          val dupSet = grams.select("doc_id", "g1", "g2").distinct()
            .groupBy("g1", "g2").agg(count(lit(1)).as("nd"))
            .filter(col("nd") >= 2).select("g1", "g2")
          grams.join(dupSet, Seq("g1", "g2"), "left_semi")
        }
      iv.select(col("doc_id"), col("i").as("st"),
        (col("i") + lit((n - 1).toLong)).as("en"))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("SPANFUSED_AB.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .appName("graft-spanfused-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val ns = Seq(8, 16, 32)
    val D = graft.pipeline.Dedup
    val base = graft.util.Tables.spread(
        graft.util.Tables.t(spark, sfDir, "documents"))
      .select(col("doc_id"),
        graft.pipeline.TextPipeline.tokens(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // fill once: both shapes read the same warm substrate

    def fp(iv: DataFrame): Seq[org.apache.spark.sql.Row] =
      iv.agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("doc_id"), col("st"), col("en"))),
          lit(0L)).as("x")).collect().toSeq

    def run(mode: String): (Seq[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val rows = mode match {
        case "multi_fused" => fp(D.multiDupIntervals(base, ns, md5 = false))
        case "multi_chained" => fp(chainedIntervals(base, ns, keeperAware = false))
        case "removal_fused" => fp(D.removalCutIntervals(base, ns, md5 = false))
        case "removal_chained" => fp(chainedIntervals(base, ns, keeperAware = true))
      }
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val modes = Seq("multi_fused", "multi_chained", "removal_fused", "removal_chained")
    val rounds = (0 until 3).map { r =>
      val rot = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      rot.map(m => m -> run(m)).toMap
    }
    for (pair <- Seq(("multi_fused", "multi_chained"),
        ("removal_fused", "removal_chained"))) {
      val fps = rounds.flatMap(rr => Seq(rr(pair._1)._1, rr(pair._2)._1)).distinct
      require(fps.size == 1, s"shapes disagree on ${pair._1} intervals: $fps")
    }
    base.unpersist(blocking = false)

    def runsOf(m: String) = rounds.map(_(m)._2)
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"span_fused_ab","sf":"$sfDir",""" +
        modes.map(m => s""""${m}_sec":${runsOf(m).min}""").mkString(",") + "," +
        modes.map(m => s""""${m}_runs":[${runsOf(m).mkString(",")}]""").mkString(",") + "," +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
