package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BpeishCount, GramRunStats, MinhashSig, NormalizeText, SimhashFp, TextTokens, TokenCharSpans, VecCosine, VecDot, VecDotRewrite, VecQuantizeInt8, WordGrams}

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
    ext.injectFunction((
      new FunctionIdentifier("text_tokens"),
      new ExpressionInfo(classOf[TextTokens].getName, "text_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "text_tokens takes exactly 1 argument")
        TextTokens(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "normalize_text takes exactly 1 argument")
        NormalizeText(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_char_spans"),
      new ExpressionInfo(classOf[TokenCharSpans].getName, "token_char_spans"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "token_char_spans takes exactly 1 argument")
        TokenCharSpans(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFp].getName, "simhash_fp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "simhash_fp takes exactly 1 argument")
        SimhashFp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpeish_count"),
      new ExpressionInfo(classOf[BpeishCount].getName, "bpeish_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "bpeish_count takes exactly 1 argument")
        BpeishCount(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "minhash_sig takes exactly 3 arguments: (text, k, n)")
        def lit(i: Int, what: String): Int = {
          val e = children(i)
          require(e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType,
            s"minhash_sig $what must be a literal int")
          e.eval(null).asInstanceOf[Int]
        }
        MinhashSig(children.head, lit(1, "shingle width k"), lit(2, "signature width n"))
      }))
  }
}
