package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-injectable registration of the native expressions:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * makes graft_cosine_similarity / graft_minhash_signature /
  * graft_word_shingles available to pure-SQL users of every session,
  * without any Scala call site. (Programmatic users can instead call
  * [[GraftFunctions.ensureRegistered]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int =
    e.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0), intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0), intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hyperplane_bucket"),
      (exprs: Seq[Expression]) => HyperplaneBucket(exprs(0), intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk_by_score"),
      (exprs: Seq[Expression]) => TopKByScore(exprs(0), exprs(1), intArg(exprs(2)))))
  }
}
