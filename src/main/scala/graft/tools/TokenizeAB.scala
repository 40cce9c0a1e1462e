package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the native tokenizer vs its regex twin, in ONE JVM
  * (alternating, min-of-reps) so steal waves hit both sides equally —
  * the adjudication tool for the round-11 kernel switch. Shapes cover the
  * suite's three consumption patterns: row-local size fold, corpus token
  * explode into an aggregate, and the WordGrams bigram chain.
  *
  * Usage: runMain graft.tools.TokenizeAB [sfDir] [reps]
  */
object TokenizeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-tokenize-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    def natTok = graft.functions.TextTokens.textTokens(col("text"))
    def hofTok = graft.pipeline.TextPipeline.tokensHof(col("text"))
    val shapes: Seq[(String, Column => Long)] = Seq(
      ("size-sum", tok => docs.select(sum(size(tok)).as("s")).head().getLong(0)),
      ("explode-grp", tok => docs.select(explode(tok).as("t"))
        .groupBy("t").count().count()),
      ("bigram-explode", tok => docs.select(explode(
          graft.functions.WordGrams.wordGrams(tok, 2)).as("g"))
        .groupBy("g").count().count()))

    def cpuStat(): (Long, Long) = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (f.sum, if (f.length > 7) f(7) else 0L)
      } finally src.close()
    }
    val (t0s, s0s) = cpuStat()
    val best = scala.collection.mutable.Map.empty[String, Double]
    // side-by-side values cross-checked every rep: both tokenizers must
    // drive the SAME aggregate results or the timing compares nothing
    val seen = scala.collection.mutable.Map.empty[String, Long]
    for (rep <- 1 to reps; (sh, f) <- shapes; (side, tok) <- Seq(
        "native" -> natTok, "regex" -> hofTok)) {
      val t0 = System.nanoTime
      val r = f(tok)
      val el = (System.nanoTime - t0) / 1e9
      require(seen.getOrElseUpdate(sh, r) == r, s"$sh: sides disagree")
      val key = s"$sh/$side"
      best(key) = math.min(best.getOrElse(key, Double.MaxValue), el)
      println(f"[tok-ab] $key%-24s rep$rep $el%8.3f s  (rows/sum=$r)")
    }
    val (t1s, s1s) = cpuStat()
    val steal = math.rint(10000.0 * (s1s - s0s) / math.max(1, t1s - t0s)) / 100
    println("[tok-ab] === min-of-reps ===")
    val fields = shapes.map { case (sh, _) =>
      val n = best(s"$sh/native"); val h = best(s"$sh/regex")
      println(f"[tok-ab] $sh%-16s native $n%7.3f s  regex $h%7.3f s  ratio ${n / h}%5.2f")
      s""""${sh.replace('-', '_')}_native_sec":$n,"${sh.replace('-', '_')}_regex_sec":$h"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("TOKENIZE_AB.json"),
      (s"""{"metric":"tokenize_ab","sf":"$sfDir",${fields.mkString(",")},""" +
        s""""reps":$reps,"agg":"min","steal_pct":$steal}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
