package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Adjudicate the round-12 two-quiet-window bench discrepancy (VERDICT
  * r12 finding 1): seven string-kernel queries read 2–3× apart between
  * the committed headline window (69.4 s total, steal 0.41 %) and the
  * driver's post-snapshot window (83.3 s, steal 0.02 %) on byte-identical
  * code, while fit/join/ANN queries read 1.00× — steal is ruled out by
  * its own per-query coherence protocol, so the cause is either an
  * in-JVM bimodal execution mode or an environmental one (GC/heap state,
  * page-cache, THP fragmentation).
  *
  * Protocol: the seven SUSPECTS run rotated-interleaved with six ANCHORS
  * (queries both windows agree on to ≤ 3 %), each run isolated exactly
  * like `graft.Bench` (unpersist + clearCache + System.gc), EVERY run
  * recorded (not just the min) so within-JVM bimodality is visible, and
  * each run carries its GC-collection-time delta so a GC-bound slow mode
  * names itself in the artifact. Anchors adjudicate the window: if the
  * anchors sit at their agreed values while the suspects land on one
  * side's numbers, that side is the true steady state of THIS window and
  * the other window carried a mode the suite's min-of-2-3 could not
  * cancel.
  *
  * Usage: runMain graft.tools.TextFamilyAB <sfDir> [outPath] [reps]
  */
object TextFamilyAB {

  /** The seven 2–3× queries named in VERDICT r12 finding 1. */
  val Suspects: Seq[String] = Seq(
    "p_vocab_topk", "p_text_profile", "p_paragraph_dedup", "p_line_dedup",
    "p_dup_gram_profile", "p_bigram_topk", "p_substr_removal_fixedpoint")

  /** Both-window-stable controls (ratio within ~3 % between the two
    * disputed artifacts), spanning plan families: ANN scan, iterative
    * fit, relational set-op, windowed span family, weighted sampling.
    */
  val Anchors: Seq[String] = Seq(
    "p_ann_int8_topk", "m_slope_path_kkt_gaussian", "p_length_batching",
    "q10_setops", "p_dup_spans", "p_mixture_budget_bucketed")

  private def cpuStat(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        Some((f.sum, if (f.length > 7) f(7) else 0L))
      } finally src.close()
    } catch { case _: Throwable => None }

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("TEXTFAMILY_AB.json")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-textfamily-ab")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val names = Suspects ++ Anchors
    names.foreach(n => require(graft.SparkEntry.queries.contains(n), n))

    // identical isolation to graft.Bench.force, so a mode that only
    // manifests under the suite's own discipline is reproduced here
    def timed(name: String): (Double, Double) = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3)
    }

    // warm-up (JVM + codegen + parquet footers), unreported
    timed("p_exact_dedup")

    val runs = scala.collection.mutable.Map.empty[String, Vector[(Double, Double)]]
      .withDefaultValue(Vector.empty)
    for (r <- 0 until reps) {
      val rot = names.drop(r % names.size) ++ names.take(r % names.size)
      rot.foreach(n => runs(n) = runs(n) :+ timed(n))
    }

    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    def block(ns: Seq[String]) = ns.map { n =>
      val rs = runs(n)
      s""""$n":{"min":${rs.map(_._1).min},""" +
        s""""runs":[${rs.map(_._1).mkString(",")}],""" +
        s""""gc_sec":[${rs.map(_._2).mkString(",")}]}"""
    }.mkString(",")
    val heapMax = Runtime.getRuntime.maxMemory() >> 20
    val json =
      s"""{"metric":"textfamily_ab","sf":"$sfDir","reps":$reps,""" +
        s""""cpus":$cpus,"heap_max_mb":$heapMax,""" +
        s""""suspects":{${block(Suspects)}},"anchors":{${block(Anchors)}},""" +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
