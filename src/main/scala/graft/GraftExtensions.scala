package graft

import graft.functions.{DistinctTokens, FloatDotProduct, RollingHash, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL-callable functions, so `spark.sql("SELECT
  * graft_fdot(a, b) ...")` works on any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.GraftExtensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def one(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case other  => throw new IllegalArgumentException(s"expected 1 argument, got ${other.size}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPushdown)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fdot"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions.FloatDotProduct", "graft_fdot"),
       (args: Seq[Expression]) => FloatDotProduct(args(0), args(1)))
    )
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_word_shingles"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions.WordShingles", "graft_word_shingles"),
       one(WordShingles(_, 3)))
    )
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_distinct_tokens"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions.DistinctTokens", "graft_distinct_tokens"),
       one(DistinctTokens(_)))
    )
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions.RollingHash", "graft_rolling_hash"),
       one(RollingHash(_, 7L, 1000000007L)))
    )
    // aggregate: 64-bit simhash over a group of md5-hex strings
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions.SimhashAgg", "graft_simhash64"),
       one(graft.functions.SimhashAgg(_).toAggregateExpression()))
    )
  }
}
