package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Measures the index-amortized deployment shape of INCREMENTAL
  * paragraph dedup, completing the family triptych ([[IncrementalProbe]]
  * = near-dup, [[SubstrProbe]] = substring removal): the convenience
  * entry re-aggregates the corpus's per-fingerprint (nocc, keeper) state
  * every call, while the deployed daily-crawl loop builds a
  * [[graft.pipeline.ParagraphDedup.ParagraphIndex]] ONCE and pays only
  * the increment's row-local split/fingerprint pass + one fp-keyed index
  * join per batch. Same hashed 90/10 corpus/increment split as the other
  * two probes, so all three stories rehearse the same shape:
  *
  *   - `convenience_sec`: one full `incrementalDedupUnits(inc, corpus)`
  *   - `build_sec`: `buildParagraphIndex(corpus)` + materialization
  *   - `probe_sec`: probe against the warm index (min of 2)
  *   - `update_sec`: `updateParagraphIndex(index, inc)` + materialize —
  *     the once-per-shipped-batch fold (counts ADD, keepers MIN)
  *   - `write_sec`: `writeParagraphIndex` to fp-bucketed parquet
  *
  * Every leg's kept-unit output is pinned by `(n_units, geom)` — row
  * count plus a bit_xor over xxhash64(doc_id, unit_idx, char_st,
  * char_en, cut_units) — which must agree across legs or the run aborts
  * (char-exact emission, not just counts). The COLD leg runs as a
  * separate invocation (fresh JVM): reload the written index, measure
  * the first probe (parquet scan + persist fill) and the re-warmed
  * second, merge `cold_*` rows, abort on geometry drift.
  *
  * Usage: runMain graft.tools.ParagraphProbe <sfDir> [outPath] [indexDir]
  *        runMain graft.tools.ParagraphProbe cold <sfDir> <indexDir> [outPath]
  */
object ParagraphProbe {

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
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Same hashed 90/10 split as IncrementalProbe/SubstrProbe. */
  private def split(docs: DataFrame) = {
    val bucket = pmod(xxhash64(col("doc_id")), lit(10))
    (docs.filter(bucket =!= 0), docs.filter(bucket === 0))
  }

  private def defaultIdxDir(sfDir: String): String =
    "/tmp/graft_para_index_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  private def fingerprint(kept: DataFrame): (Long, Long) = {
    val r = kept.agg(count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("doc_id"), col("unit_idx"),
        col("char_st"), col("char_en"), col("cut_units"))), lit(0L)).as("geom"))
      .head
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
    val outPath = args.lift(1).getOrElse("PARAPROBE.json")
    val idxDir = args.lift(2).getOrElse(defaultIdxDir(sfDir))
    val spark = session()
    val stat0 = cpuStat()
    val P = graft.pipeline.ParagraphDedup

    val docs = graft.util.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (corpus, inc) = split(docs)
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    docs.count() // warm-up: parquet footers + codegen on a cheap pass

    val (fpConv, convenience) = timed {
      fingerprint(P.incrementalDedupUnits(inc, corpus, P.ParagraphSep))
    }
    drop()

    val (idx, build) = timed {
      // unwatermarked: the probe's 90/10 split is by HASHED doc_id
      // (interleaved), which the monotone watermark rejects by design
      val i = P.buildParagraphIndex(corpus)
        .copy(maxDocId = graft.pipeline.IdContract.Unwatermarked)
      i.units.count() // materialize — deployment would write it out
      i
    }
    val (fp1, probe1) = timed(fingerprint(P.incrementalDedupUnits(inc, idx)))
    val (fp2, probe2) = timed(fingerprint(P.incrementalDedupUnits(inc, idx)))
    require(fp1 == fp2 && fp1 == fpConv,
      s"legs disagree on kept-unit geometry: conv=$fpConv warm=$fp1/$fp2")
    val (_, writeSec) = timed(P.writeParagraphIndex(idx, idxDir))
    val (idx2, updateSec) = timed {
      val i = P.updateParagraphIndex(idx, inc)
      i.units.count()
      i
    }
    idx2.unpersist(); idx.unpersist()

    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    val json =
      s"""{"metric":"paragraph_dedup_probe","sf":"$sfDir",""" +
        s""""n_units":${fp1._1},"geom":${fp1._2},""" +
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
    val outPath = args.lift(2).getOrElse("PARAPROBE.json")
    val spark = session()
    val stat0 = cpuStat()
    val P = graft.pipeline.ParagraphDedup
    val docs = graft.util.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (_, inc) = split(docs)
    val (idx, reload) = timed(P.readParagraphIndex(spark, idxDir))
    val (fpC, cold) = timed(fingerprint(P.incrementalDedupUnits(inc, idx)))
    val (fpW, warm) = timed(fingerprint(P.incrementalDedupUnits(inc, idx)))
    require(fpC == fpW, s"cold/rewarmed geometry differs: $fpC vs $fpW")
    idx.unpersist()
    val steal = (for ((t0, s0) <- stat0; (t1, s1) <- cpuStat() if t1 > t0)
      yield math.round(10000.0 * (s1 - s0) / (t1 - t0)) / 100.0)
    // real JSON round-trip (json4s ships with Spark): regex surgery on the
    // artifact text silently corrupted pretty-printed or re-ordered
    // artifacts — parse, drop stale cold_* fields, append, re-serialize
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val prevJ = JsonMethods.parse(Files.readString(Paths.get(outPath))) match {
      case o: JObject => o
      case other => sys.error(s"$outPath is not a JSON object: $other")
    }
    val warmGeom = prevJ.obj.collectFirst { case ("geom", JInt(g)) => g.toLong }
    require(warmGeom.contains(fpC._2),
      s"cold geometry ${fpC._2} != warm run's $warmGeom — split drifted")
    val merged = JObject(
      prevJ.obj.filterNot(_._1.startsWith("cold_")) ++ List(
        "cold_reload_sec" -> JDouble(reload),
        "cold_probe_sec" -> JDouble(cold),
        "cold_rewarm_sec" -> JDouble(warm),
        "cold_steal_pct" -> steal.map(JDouble(_)).getOrElse(JNull)))
    val out = JsonMethods.compact(JsonMethods.render(merged))
    println(out)
    Files.writeString(Paths.get(outPath), out + "\n")
    spark.stop()
  }
}
