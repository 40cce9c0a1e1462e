package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-document rehearsal corpus: the synthetic `documents` table is
  * short-doc (hundreds of tokens), which under-exercises every per-token-
  * LENGTH cost term — in particular the O(L·n) gram-string concatenation
  * the rolling-hash substrate exists to avoid (SCALING.md round-11
  * substrate A/B: a wash on short docs). This tool folds a source corpus
  * into `nDocs` long documents — texts grouped by hashed doc_id,
  * concatenated in deterministic (doc_id) order — preserving the source's
  * duplicated-span structure (duplicate text blocks land inside longer
  * documents, as boilerplate does in real crawl pages) while multiplying
  * per-document token length by |src|/nDocs.
  *
  * Usage: runMain graft.tools.LongDocRehearsal <srcDir> <outDir> <nDocs>
  */
object LongDocRehearsal {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val nDocs = args(2).toInt
    require(nDocs >= 1, s"nDocs must be >= 1, got $nDocs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-longdoc-rehearsal")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.util.Tables.t(spark, srcDir, "documents")
      .select(col("doc_id").as("src_id"), col("text"),
        pmod(xxhash64(col("doc_id")), lit(nDocs.toLong)).as("gid"))
      .groupBy("gid")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("src_id"), col("text")))),
        s => s.getField("text")), " ").as("text"))
      .select(col("gid").as("doc_id"), col("text"))
    out.repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val stats = spark.read.parquet(s"$outDir/documents.parquet")
      .agg(count(lit(1)), avg(length(col("text"))),
        max(length(col("text"))).cast("long"))
      .head
    println(s"wrote ${stats.getLong(0)} docs, avg ${stats.getDouble(1).toLong}" +
      s" chars, max ${stats.getLong(2)} chars -> $outDir")
    spark.stop()
  }
}
