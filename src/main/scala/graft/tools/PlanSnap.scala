package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Optimization-round plan snapshots: writes `.explain("formatted")` for
  * the requested queries to `plans/<tag>/<query>_<suffix>.txt`, one file
  * per query, ids normalized the same way PLANS.md is (raw expression ids
  * are allocator state and churn with zero plan change).
  *
  * Usage: runMain graft.tools.PlanSnap <tag> <suffix> <q1,q2,...|TOP>
  *   tag    — plans/ subdirectory (e.g. r16)
  *   suffix — appended to each file name (before/after)
  *   TOP    — the heavy-query set this round tracks
  *
  * Session config mirrors Bench (shuffle partitions = cores) so the
  * committed shapes are the ones the bench actually runs.
  */
object PlanSnap {
  val topQueries: Seq[String] = Seq(
    "p_incremental_full_pipeline", "p_incremental_clean_pipeline",
    "p_full_pipeline", "p_full_pipeline_model_quality",
    "m_slope_path_kkt_multinomial", "p_incremental_substr_removal_segmented",
    "p_clean_pipeline", "p_dup_clusters", "p_incremental_paragraph_dedup",
    "p_paragraph_dedup_bytes", "p_dup_keep_best", "p_minhash_lsh_dedup",
    "p_substr_removal_fixedpoint", "p_paragraph_dedup", "p_dup_gram_profile",
    "p_line_dedup", "p_incremental_substr_removal", "p_decontaminate",
    "p_incremental_neardup", "p_dup_spans_multi", "p_bigram_lm_quality",
    "p_exact_substr_removal", "p_ngram_jaccard", "p_tfidf_topk",
    "p_pack_span_masks", "q9_distinct", "q1_pricing_summary",
    "p_incremental_full_pipeline_probe_only",
    "p_incremental_clean_pipeline_probe_only",
    "p_incremental_substr_removal_probe_only",
    "p_incremental_substr_removal_segmented_probe_only")

  def normalizeIds(plan: String): String = {
    val exprId = raw"#(\d+)(L|[a-z]*)?".r
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val pass1 = exprId.replaceAllIn(plan, m => {
      val k = seen.getOrElseUpdate(m.group(1), seen.size + 1)
      java.util.regex.Matcher.quoteReplacement(
        s"#e$k${Option(m.group(2)).getOrElse("")}")
    })
    val planId = raw"plan_id=(\d+)".r
    val seenP = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    planId.replaceAllIn(pass1, m => {
      val k = seenP.getOrElseUpdate(m.group(1), seenP.size + 1)
      s"plan_id=p$k"
    })
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <q1,q2,...|TOP>")
    val (tag, suffix) = (args(0), args(1))
    val names =
      if (args(2) == "TOP") topQueries
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.util.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    for (n <- names) {
      System.err.println(s"[plansnap] $n ...")
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          normalizeIds(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => s"FAILED to plan: ${e.getClass.getName}: ${e.getMessage}"
        }
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"),
        s"== $n ($suffix, sf=$sfDir, shufflePartitions=${spark.conf.get("spark.sql.shuffle.partitions")}) ==\n" + txt + "\n")
    }
    spark.stop()
  }
}
