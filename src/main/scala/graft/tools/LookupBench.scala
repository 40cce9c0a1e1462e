package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the streaming-twin lookup substrates (round-8 ADVICE fix): the
  * native `BroadcastLookup.inLongSet` (sorted-array binary search inside
  * codegen) vs the previous `typedlit(map)` + `element_at` form, whose
  * literal-map `GetMapValue` is a LINEAR key scan — O(grams·|set|) per
  * document. Same synthetic corpus, same contamination verdicts; the old
  * form is only run at set sizes where it finishes (that asymmetry IS the
  * finding). One JSON line per (form, set size) to stdout; SCALING.md
  * cites the run.
  *
  * Usage: runMain graft.tools.LookupBench
  */
object LookupBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-lookup-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 2 000 docs × ~120 tokens of deterministic word soup → ~236k
    // 3-gram probes per full pass
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 120).map(i =>
        concat(lit("w"), pmod(col("id") * 131 + i * 17, lit(5000)))): _*).as("text"))
      .cache()
    docs.count()

    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // eval-gram keys: synthetic longs in the md5Hash60 range; hit rate is
    // ~0 either way, which is the firehose shape (and the worst case for
    // the linear scan — every probe walks the whole literal map)
    def keys(k: Int): Map[Long, Int] =
      (0 until k).map(i => (i.toLong * 0x9E3779B97F4A7C15L >>> 4) -> 1).toMap

    val results = new StringBuilder
    def run(form: String, k: Int, flag: Map[Long, Int] => org.apache.spark.sql.Column): Unit = {
      val m = keys(k)
      // warm once (codegen + literal construction), then min of 2 timed
      val col0 = flag(m)
      def pass() = docs.filter(col0).count()
      pass()
      val t = math.min(time(pass()), time(pass()))
      val line = s"""{"form":"$form","set_size":$k,"sec":${f"$t%.3f"}}"""
      println(s"[lookup-bench] $line")
      results.append(line).append('\n')
    }

    val native = (m: Map[Long, Int]) =>
      graft.pipeline.Decontaminate.contaminatedFlag(col("text"),
        m.keys.toArray.sorted, 3, md5Substrate = true)
    val literal = (m: Map[Long, Int]) => {
      val lit0 = typedlit(m)
      exists(graft.pipeline.TextPipeline.wordGramArray(col("text"), 3),
        g => element_at(lit0, graft.util.Det.md5Hash60(g)).isNotNull)
    }

    for (k <- Seq(1000, 10000, 100000)) run("literal_map", k, literal)
    for (k <- Seq(1000, 10000, 100000, 1000000, 4000000)) run("native_binsearch", k, native)

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("LOOKUP_BENCH.json"), results.toString)
    spark.stop()
  }
}
