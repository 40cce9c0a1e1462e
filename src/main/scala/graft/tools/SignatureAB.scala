package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the row-local whole-document signature chains
  * (native [[graft.functions.MinhashSig]]/[[graft.functions.SimhashFp]]
  * kernels) vs the exploded formulations they replaced, in ONE JVM so
  * steal waves hit both sides equally. Measures the full consumer shape,
  * not the bare expression: LSH band table build + bucket count for
  * MinHash, fingerprint + banded Hamming pair count for SimHash. Outputs
  * are asserted identical between sides on every rep.
  *
  * Usage: runMain graft.tools.SignatureAB [sfDir] [reps]
  */
object SignatureAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/x100")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-signature-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.{functions => F, DataFrame}
    import graft.pipeline.{Dedup, SimHash, Winnow}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    println(s"[sig-ab] corpus ${docs.count()} docs")

    // drain by FOLDING the value columns (bit_xor), never .count(): a bare
    // count lets Catalyst prune the hash/window work right out of the
    // exploded plans (measured: the winnow Window-min "ran" 144M rows in
    // 0.3 s — it was counting gram rows, not winnowing), while the native
    // kernels sit under a filter/explode and cannot be pruned — a rigged
    // comparison. bit_xor is order-independent, overflow-free (a plain sum
    // trips ANSI addExact at this row count) and still an exact cross-side
    // equality check.
    def drain(df: DataFrame, cols: String*): Long =
      df.agg(cols.map(c => F.expr(s"bit_xor($c)").cast("long"))
          .reduce(_ bitwiseXOR _).as("s"))
        .head().getLong(0)

    val shapes: Seq[(String, () => Long, () => Long)] = Seq(
      ("minhash-bands",
        () => drain(Dedup.docBands(docs, k = 5, nHashes = 18, rowsPerBand = 6),
          "bh", "band", "doc_id"),
        () => drain(Dedup.bands(Dedup.minhash(
          Dedup.shingles(docs, k = 5, dedup = false), 18), 6),
          "bh", "band", "doc_id")),
      ("simhash-fp",
        () => drain(SimHash.simhash(docs), "simhash", "doc_id"),
        () => drain(SimHash.simhashExploded(docs), "simhash", "doc_id")),
      ("winnow-selected",
        () => drain(Winnow.selected(docs), "fp", "pos", "doc_id"),
        () => drain(Winnow.selectedExploded(docs), "fp", "pos", "doc_id")),
      // keys differ across substrates by design, so drain doc_id only —
      // the per-doc distinct still forces every gram key (it IS the
      // distinct key), and the doc_id fold is substrate-independent
      ("decontam-ngrams",
        () => drain(graft.pipeline.Decontaminate.docNgrams(docs, 4), "doc_id"),
        () => drain(graft.pipeline.Decontaminate.docNgramsMd5(docs, 4), "doc_id")))

    def cpuStat(): (Long, Long) = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (f.sum, if (f.length > 7) f(7) else 0L)
      } finally src.close()
    }
    val (t0s, s0s) = cpuStat()
    val best = scala.collection.mutable.Map.empty[String, Double]
    // row counts cross-checked every rep: both chains must produce the
    // same band/fingerprint cardinality or the timing compares nothing
    val seen = scala.collection.mutable.Map.empty[String, Long]
    for (rep <- 1 to reps; (sh, nat, old) <- shapes) {
      for ((side, f) <- Seq("native" -> nat, "exploded" -> old)) {
        val t0 = System.nanoTime
        val n = f()
        val el = (System.nanoTime - t0) / 1e9
        require(seen.getOrElseUpdate(sh, n) == n, s"$sh: sides disagree")
        val key = s"$sh/$side"
        best(key) = math.min(best.getOrElse(key, Double.MaxValue), el)
        println(f"[sig-ab] $key%-24s rep$rep $el%8.3f s  (rows=$n)")
      }
    }
    val (t1s, s1s) = cpuStat()
    val steal = math.rint(10000.0 * (s1s - s0s) / math.max(1, t1s - t0s)) / 100
    println("[sig-ab] === min-of-reps ===")
    val fields = shapes.map { case (sh, _, _) =>
      val n = best(s"$sh/native"); val h = best(s"$sh/exploded")
      println(f"[sig-ab] $sh%-16s native $n%7.3f s  exploded $h%7.3f s  ratio ${n / h}%5.2f")
      s""""${sh.replace('-', '_')}_native_sec":$n,"${sh.replace('-', '_')}_exploded_sec":$h"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("SIGNATURE_AB.json"),
      (s"""{"metric":"signature_ab","sf":"$sfDir",${fields.mkString(",")},""" +
        s""""reps":$reps,"agg":"min","steal_pct":$steal}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
