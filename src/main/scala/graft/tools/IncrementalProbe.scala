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
  *   - `write_sec`: `writeNearDupIndex` to parquet (the once-per-rebuild
  *     cost of making the index survive a restart)
  *
  * The deployed per-batch cost is `probe_sec`; `build_sec` + `write_sec`
  * amortize over every batch until the index is rebuilt. Writes
  * INCPROBE.json.
  *
  * The daily-crawl story crosses JVMs, so the COLD leg runs as a SEPARATE
  * invocation (a genuinely fresh session — no block-manager cache, no
  * reused exchange): `cold` reloads the written index and measures the
  * first probe (parquet scan + persist fill) and the re-warmed second,
  * merging `cold_probe_sec`/`cold_rewarm_sec`/`cold_n_pairs` into the
  * existing artifact. `cold_n_pairs` must equal the warm run's `n_pairs`
  * or the merge aborts.
  *
  * Usage: runMain graft.tools.IncrementalProbe <sfDir> [outPath] [indexDir]
  *        runMain graft.tools.IncrementalProbe cold <sfDir> <indexDir> [outPath]
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

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // deployment knob (see graft.Bench): decade corpora need data-sized
    // partition counts or sort-merge tasks spill
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** 90/10 corpus/increment split on a HASHED doc_id (sequential ids make
    * a bare modulo a stride split; xxhash64 first so the split mixes) —
    * deterministic and id-disjoint by construction (the operator's
    * contract). Shared by the warm and cold legs, which MUST agree.
    */
  private def split(docs: org.apache.spark.sql.DataFrame) = {
    val bucket = pmod(xxhash64(col("doc_id")), lit(10))
    (docs.filter(bucket =!= 0), docs.filter(bucket === 0))
  }

  /** Scale-factor-specific default so concurrent runs at different sfDirs
    * cannot overwrite each other's index (the cold leg's n_pairs
    * cross-check would abort on the mismatch, or worse, coincide).
    */
  private def defaultIdxDir(sfDir: String): String =
    "/tmp/graft_neardup_index_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("cold")) return coldMain(args.drop(1))
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("INCPROBE.json")
    val idxDir = args.lift(2).getOrElse(defaultIdxDir(sfDir))
    val spark = session()
    val stat0 = cpuStat()

    val docs = graft.util.Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) >= 5)
    val (corpus, inc) = split(docs)

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
      // unwatermarked: hashed-id (interleaved) corpus/increment split
      val i = graft.pipeline.Dedup.buildNearDupIndex(corpus)
        .copy(maxDocId = graft.pipeline.IdContract.Unwatermarked)
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
    // build-to-disk: the once-per-rebuild cost of surviving a restart
    val (_, writeSec) = timed {
      graft.pipeline.Dedup.writeNearDupIndex(idx, idxDir)
    }
    idx.unpersist()

    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"incremental_neardup_probe","sf":"$sfDir",""" +
        s""""n_pairs":$n1,"convenience_sec":$convenience,""" +
        s""""build_sec":$build,"probe_sec":${math.min(probe1, probe2)},""" +
        s""""probe_runs":[$probe1,$probe2],"write_sec":$writeSec,""" +
        s""""index_dir":"$idxDir",""" +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }

  /** The cross-JVM leg: reload the written index in this (fresh) session
    * and measure the first probe cold. Merges its rows into the existing
    * artifact so one file carries the whole amortization story.
    */
  private def coldMain(args: Array[String]): Unit = {
    val Array(sfDir, idxDir) = args.take(2)
    val outPath = args.lift(2).getOrElse("INCPROBE.json")
    val spark = session()
    val stat0 = cpuStat()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = graft.util.Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) >= 5)
    val (_, inc) = split(docs)
    val (idx, reload) = timed {
      graft.pipeline.Dedup.readNearDupIndex(spark, idxDir)
    }
    val (nC, cold) = timed {
      graft.pipeline.Dedup.incrementalNearDup(inc, idx, 0.7).count()
    }
    val (nW, warm) = timed {
      graft.pipeline.Dedup.incrementalNearDup(inc, idx, 0.7).count()
    }
    require(nC == nW, s"cold/rewarmed probe results differ: $nC vs $nW")
    idx.unpersist()
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    // idempotent merge: strip any prior cold_* fields so a re-run (e.g.
    // retrying a steal-noisy window) replaces them instead of duplicating.
    // The numeric alternative must cover Scala Double scientific notation
    // (sub-millisecond timings print as e.g. 7.2E-4) or a re-run leaves
    // stale exponent fragments behind and writes malformed JSON.
    val prev = Files.readString(Paths.get(outPath)).trim
      .replaceAll(""","cold_[a-z_]+":(null|-?[0-9.]+([Ee][+-]?[0-9]+)?)""", "")
    require(prev.endsWith("}"), s"$outPath is not a JSON object")
    val warmPairs = """"n_pairs":(\d+)""".r.findFirstMatchIn(prev)
      .map(_.group(1).toLong)
    require(warmPairs.contains(nC),
      s"cold pairs $nC != warm run's n_pairs $warmPairs — split drifted")
    val merged = prev.dropRight(1) +
      s""","cold_reload_sec":$reload,"cold_probe_sec":$cold,""" +
      s""""cold_rewarm_sec":$warm,"cold_n_pairs":$nC,""" +
      s""""cold_steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(merged)
    Files.writeString(Paths.get(outPath), merged + "\n")
    spark.stop()
  }
}
