package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Measures the index-amortized deployment shape of incremental near-dup
  * detection: the convenience entry point (corpus `DataFrame` arg)
  * rebuilds the corpus-side rep-collapse/shingle/minhash/band chain every
  * call, while the deployed daily-crawl loop builds a
  * [[graft.pipeline.Dedup.NearDupIndex]] ONCE and pays only the
  * increment-side chain per batch. This rehearsal times, on a given
  * corpus dir (documents table, split 90/10 corpus/increment by doc_id
  * hash):
  *
  *   - `convenience_sec`: one full `incrementalNearDup(inc, corpus)` call
  *   - `build_sec`: `buildNearDupIndex(corpus)` + materialization
  *   - `probe_sec`: `incrementalNearDup(inc, index)` against the warm
  *     index (min of 2 — the second probe is the steady state)
  *
  * The deployed per-batch cost is `probe_sec`; `build_sec` amortizes over
  * every batch until the index is rebuilt. Writes INCPROBE.json.
  *
  * Usage: runMain graft.tools.IncrementalProbe <sfDir> [outPath]
  */
object IncrementalProbe {

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
    val outPath = args.lift(1).getOrElse("INCPROBE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stat0 = cpuStat()

    val docs = graft.util.Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) >= 5)
    // 90/10 split on a doc_id hash — deterministic, id-disjoint by
    // construction (the operator's contract)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val inc = docs.filter(pmod(col("doc_id"), lit(10)) === 0)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    // warm-up: parquet footers + codegen on a cheap pass
    docs.count()

    val (_, convenience) = timed {
      graft.pipeline.Dedup.incrementalNearDup(inc, corpus, threshold = 0.7).count()
    }
    drop()

    val (idx, build) = timed {
      val i = graft.pipeline.Dedup.buildNearDupIndex(corpus)
      // materialize both persisted frames — deployment would write them out
      i.docStore.count(); i.bands.count()
      i
    }
    val (n1, probe1) = timed {
      graft.pipeline.Dedup.incrementalNearDup(inc, idx, 0.7).count()
    }
    val (n2, probe2) = timed {
      graft.pipeline.Dedup.incrementalNearDup(inc, idx, 0.7).count()
    }
    require(n1 == n2, s"probe results differ across runs: $n1 vs $n2")
    idx.unpersist()

    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"incremental_neardup_probe","sf":"$sfDir",""" +
        s""""n_pairs":$n1,"convenience_sec":$convenience,""" +
        s""""build_sec":$build,"probe_sec":${math.min(probe1, probe2)},""" +
        s""""probe_runs":[$probe1,$probe2],""" +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
