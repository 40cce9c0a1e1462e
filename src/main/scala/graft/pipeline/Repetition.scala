package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals in the style of the Gopher corpus
  * filters (Rae et al. 2021, "Scaling Language Models", appendix A1.1):
  * flag documents whose most common word 2-gram carries too much of the
  * text, or whose word n-grams repeat too often.
  *
  * Everything is computed ROW-LOCALLY from the gram array (sort the array,
  * scan its runs) — per-doc histograms never hit a shuffle, which at 100 TB
  * is the difference between a map-only pass and exploding every n-gram
  * occurrence into a (doc_id, gram) exchange. The `aggregate` higher-order
  * function is interpreted (not codegen'd), but it replaces a shuffle of
  * ~|tokens| rows per doc with O(|tokens| log |tokens|) local work — the
  * right trade in a scan-bound pipeline. Thresholds are integer-crossed
  * (`a·k > b·m`), never float ratios, so verdicts are engine-exact.
  */
object Repetition {

  /** Scan the SORTED gram array's equal-runs in one `aggregate` pass:
    * returns struct(best, bestg, uniq) = longest run length, its gram
    * (ties → the lexicographically smallest, because ascending order meets
    * the strictly-greater test first), and the distinct-gram count.
    */
  def topRunStats(sortedGrams: Column): Column = {
    val init = struct(
      lit(null).cast("string").as("prev"),
      lit(0L).as("run"),
      lit(0L).as("best"),
      lit("").as("bestg"),
      lit(0L).as("uniq"))
    val merge = (acc: Column, x: Column) => {
      val newRun = when(acc("prev") <=> x, acc("run") + 1).otherwise(lit(1L))
      struct(
        x.as("prev"),
        newRun.as("run"),
        when(newRun > acc("best"), newRun).otherwise(acc("best")).as("best"),
        when(newRun > acc("best"), x).otherwise(acc("bestg")).as("bestg"),
        (acc("uniq") + when(acc("prev") <=> x, lit(0L)).otherwise(lit(1L))).as("uniq"))
    }
    aggregate(sortedGrams, init, merge,
      acc => struct(acc("best"), acc("bestg"), acc("uniq")))
  }

  /** Per-document repetition columns: top-2-gram character mass and
    * duplicate n-gram occurrence counts (n = `dupN`). Run statistics come
    * from the native `GramRunStats` expression (sort + run scan in one
    * codegen'd call); `topRunStats` below is the composable HOF twin it is
    * property-tested against.
    */
  def repetitionColumns(text: Column, dupN: Int = 3): Seq[(String, Column)] = {
    import graft.functions.GramRunStats.gramRunStats
    val toks = TextPipeline.tokens(text) // common subexpression, evaluated once
    val g2 = gramRunStats(toks, 2)
    val gnStats = gramRunStats(toks, dupN)
    Seq(
      "n_chars" -> length(text).cast("long"),
      "top2_chars" -> (g2("best") * length(g2("bestg")).cast("long")),
      "occ_dup" -> greatest(size(toks).cast("long") - (dupN - 1), lit(0L)),
      "uniq_dup" -> gnStats("uniq"))
  }

  /** Per-language audit under the two integer-crossed rules:
    * R1 `top2_chars·5 > n_chars`       (most common 2-gram > 20% of text)
    * R2 `(occ−uniq)·100 > occ·2`       (> 2% duplicate `dupN`-gram occurrences)
    * Docs shorter than the gram order have zero mass and pass as clean.
    */
  def qualityByLang(docs: DataFrame, dupN: Int = 3, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val cols = repetitionColumns(col(textCol), dupN)
    val base = docs.select(col(langCol).as("lang") +: cols.map { case (n, c) => c.as(n) }: _*)
    val flagTop2 = col("top2_chars") * 5 > col("n_chars")
    val flagDup = (col("occ_dup") - col("uniq_dup")) * 100 > col("occ_dup") * 2
    base
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(flagTop2, 1L).otherwise(0L)).as("n_flag_top2"),
        sum(when(flagDup, 1L).otherwise(0L)).as("n_flag_dup"),
        sum(when(!flagTop2 && !flagDup, 1L).otherwise(0L)).as("n_clean"))
      .orderBy("lang")
  }
}
