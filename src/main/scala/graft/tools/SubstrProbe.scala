package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Measures the index-amortized deployment shape of INCREMENTAL exact
  * substring removal, mirroring [[IncrementalProbe]] for the near-dup
  * family: the convenience entry point re-aggregates the corpus's
  * per-gram (count, keeper) state every call, while the deployed
  * daily-crawl loop builds an [[graft.pipeline.Dedup.ExactSubstrIndex]]
  * ONCE and pays only the increment's O(L) hash pass + one keyed index
  * join per batch. On a given corpus dir (documents table, 90/10
  * corpus/increment split by hashed doc_id — identical to
  * IncrementalProbe's split so the two stories rehearse the same shape):
  *
  *   - `convenience_sec`: one full `incrementalRemoveDupSpansExact(inc,
  *     corpus, minLen)` call
  *   - `build_sec`: `buildExactSubstrIndex(corpus)` + materialization
  *   - `probe_sec`: probe against the warm index (min of 2 — the second
  *     probe is the steady state)
  *   - `update_sec`: `updateExactSubstrIndex(index, inc)` + materialize —
  *     the once-per-shipped-batch cost of folding the increment forward
  *   - `write_sec`: `writeExactSubstrIndex` to parquet (once per rebuild)
  *
  * Every leg's output is pinned by `(n_pieces, geom)` — piece count plus
  * a bit_xor over xxhash64(doc_id, piece_idx, st, en) — which must agree
  * across legs or the run aborts.
  *
  * The COLD leg runs as a separate invocation (a genuinely fresh JVM):
  * reload the written index, measure the first probe (parquet scan +
  * persist fill) and the re-warmed second, and merge
  * `cold_reload_sec`/`cold_probe_sec`/`cold_rewarm_sec` into the
  * artifact, aborting if the cold geometry differs from the warm run's.
  *
  * Usage: runMain graft.tools.SubstrProbe <sfDir> [outPath] [indexDir]
  *        runMain graft.tools.SubstrProbe cold <sfDir> <indexDir> [outPath]
  */
object SubstrProbe {

  private val MinLen = 20

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

  /** Same hashed 90/10 split as [[IncrementalProbe.split]]. */
  private def split(docs: DataFrame) = {
    val bucket = pmod(xxhash64(col("doc_id")), lit(10))
    (docs.filter(bucket =!= 0), docs.filter(bucket === 0))
  }

  private def defaultIdxDir(sfDir: String): String =
    "/tmp/graft_substr_index_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  /** (piece count, coordinate-geometry xor) — the cross-leg consistency
    * pin. Text is excluded (coordinates determine it given the corpus).
    */
  private def fingerprint(pieces: DataFrame): (Long, Long) = {
    val r = pieces.agg(count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("doc_id"), col("piece_idx"),
        col("st"), col("en"))), lit(0L)).as("geom")).head
    (r.getLong(0), r.getLong(1))
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("cold")) return coldMain(args.drop(1))
    val sfDir = args(0)
    val outPath = args.lift(1).getOrElse("SUBSTRPROBE.json")
    val idxDir = args.lift(2).getOrElse(defaultIdxDir(sfDir))
    val spark = session()
    val stat0 = cpuStat()

    val docs = graft.util.Tables.t(spark, sfDir, "documents")
    val (corpus, inc) = split(docs)
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    docs.count() // warm-up: parquet footers + codegen on a cheap pass

    val (fpConv, convenience) = timed {
      fingerprint(graft.pipeline.Dedup.incrementalRemoveDupSpansExact(
        inc, corpus, MinLen))
    }
    drop()

    val (idx, build) = timed {
      // unwatermarked: hashed-id (interleaved) corpus/increment split
      val i = graft.pipeline.Dedup.buildExactSubstrIndex(corpus, MinLen)
        .copy(maxDocId = graft.pipeline.IdContract.Unwatermarked)
      i.grams.count() // materialize — deployment would write it out
      i
    }
    val (fp1, probe1) = timed {
      fingerprint(graft.pipeline.Dedup.incrementalRemoveDupSpansExact(inc, idx))
    }
    val (fp2, probe2) = timed {
      fingerprint(graft.pipeline.Dedup.incrementalRemoveDupSpansExact(inc, idx))
    }
    require(fp1 == fp2 && fp1 == fpConv,
      s"legs disagree on piece geometry: conv=$fpConv warm=$fp1/$fp2")
    val (_, writeSec) = timed {
      graft.pipeline.Dedup.writeExactSubstrIndex(idx, idxDir)
    }
    // day-2 fold: counts add, keepers min — once per shipped batch
    val (idx2, updateSec) = timed {
      val i = graft.pipeline.Dedup.updateExactSubstrIndex(idx, inc)
      i.grams.count()
      i
    }
    idx2.unpersist(); idx.unpersist()

    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"substr_removal_probe","sf":"$sfDir","min_len":$MinLen,""" +
        s""""n_pieces":${fp1._1},"geom":${fp1._2},""" +
        s""""convenience_sec":$convenience,"build_sec":$build,""" +
        s""""probe_sec":${math.min(probe1, probe2)},""" +
        s""""probe_runs":[$probe1,$probe2],""" +
        s""""write_sec":$writeSec,"update_sec":$updateSec,""" +
        s""""index_dir":"$idxDir",""" +
        s""""steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }

  /** The cross-JVM leg: reload the written index in this fresh session,
    * measure the first probe cold, merge cold_* rows into the artifact.
    */
  private def coldMain(args: Array[String]): Unit = {
    val Array(sfDir, idxDir) = args.take(2)
    val outPath = args.lift(2).getOrElse("SUBSTRPROBE.json")
    val spark = session()
    val stat0 = cpuStat()
    val docs = graft.util.Tables.t(spark, sfDir, "documents")
    val (_, inc) = split(docs)
    val (idx, reload) = timed {
      graft.pipeline.Dedup.readExactSubstrIndex(spark, idxDir)
    }
    val (fpC, cold) = timed {
      fingerprint(graft.pipeline.Dedup.incrementalRemoveDupSpansExact(inc, idx))
    }
    val (fpW, warm) = timed {
      fingerprint(graft.pipeline.Dedup.incrementalRemoveDupSpansExact(inc, idx))
    }
    require(fpC == fpW, s"cold/rewarmed geometry differs: $fpC vs $fpW")
    idx.unpersist()
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    // idempotent merge (numeric alternative covers scientific notation —
    // see IncrementalProbe's round-10 lesson)
    val prev = Files.readString(Paths.get(outPath)).trim
      .replaceAll(""","cold_[a-z_]+":(null|-?[0-9.]+([Ee][+-]?[0-9]+)?)""", "")
    require(prev.endsWith("}"), s"$outPath is not a JSON object")
    val warmGeom = """"geom":(-?\d+)""".r.findFirstMatchIn(prev)
      .map(_.group(1).toLong)
    require(warmGeom.contains(fpC._2),
      s"cold geometry ${fpC._2} != warm run's $warmGeom — split drifted")
    val merged = prev.dropRight(1) +
      s""","cold_reload_sec":$reload,"cold_probe_sec":$cold,""" +
      s""""cold_rewarm_sec":$warm,""" +
      s""""cold_steal_pct":${steal.map(_.toString).getOrElse("null")}}"""
    println(merged)
    Files.writeString(Paths.get(outPath), merged + "\n")
    spark.stop()
  }
}
