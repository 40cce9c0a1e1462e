package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{GramRunStats, VecCosine, VecDot, VecDotRewrite, VecQuantizeInt8, WordGrams}

/** Session extension registering the engine's native expressions on the SQL
  * surface, so `spark.sql("SELECT vec_dot(a, b) ...")` works anywhere the
  * session is built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the standard
  * plug-in point for Catalyst additions (no Spark fork, no global mutable
  * registry). The Scala DSL (`Similarity.dot`, `VecFunctions.vecDot`) does
  * not need this: it constructs the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }))
    // rewrite the interpreted aggregate(zip_with(...)) dot-product idiom
    // into the codegen'd native expression wherever it appears
    ext.injectOptimizerRule(_ => VecDotRewrite)
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_cosine takes exactly 2 arguments")
        VecCosine(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_grams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "word_grams takes exactly 2 arguments")
        WordGrams(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_quantize_int8"),
      new ExpressionInfo(classOf[VecQuantizeInt8].getName, "vec_quantize_int8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "vec_quantize_int8 takes exactly 1 argument")
        VecQuantizeInt8(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("gram_run_stats"),
      new ExpressionInfo(classOf[GramRunStats].getName, "gram_run_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "gram_run_stats takes exactly 2 arguments")
        GramRunStats(children.head, children(1))
      }))
  }
}
