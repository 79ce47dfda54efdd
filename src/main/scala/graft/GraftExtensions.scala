package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use
  * (`spark.sql("SELECT dot_product(a, b) …")`).
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) =>
          DotProduct(children(0), children(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("hll_distinct"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.HyperLogLogAgg].getName, "hll_distinct"),
        (children: Seq[Expression]) =>
          graft.functions.HyperLogLogAgg(children.head)
            .toAggregateExpression()))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bottom_k"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.BottomKAgg].getName, "bottom_k"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"bottom_k(col, k) takes 2 arguments, got ${children.length}")
          require(children(1).foldable,
            "bottom_k's k must be a literal")
          children(1).eval() match {
            case n: Number => graft.functions.BottomKAgg(children(0),
              n.intValue()).toAggregateExpression()
            case other => throw new IllegalArgumentException(
              s"bottom_k's k must be an integer literal, got $other")
          }
        }))
  }
}
