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
        (children: Seq[Expression]) =>
          graft.functions.BottomK.sqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.MisraGriesAgg].getName, "misra_gries"),
        (children: Seq[Expression]) =>
          graft.functions.MisraGriesFn.sqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("top_k_scored"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TopKScoredAgg].getName, "top_k_scored"),
        (children: Seq[Expression]) =>
          graft.functions.TopKScored.sqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_build"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.BloomBuildAgg].getName, "bloom_build"),
        (children: Seq[Expression]) =>
          graft.functions.Bloom.buildSqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.BloomMightContain].getName,
          "bloom_might_contain"),
        (children: Seq[Expression]) =>
          graft.functions.Bloom.probeSqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cms_build"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.CountMinAgg].getName, "cms_build"),
        (children: Seq[Expression]) =>
          graft.functions.CountMin.buildSqlBuilder(children)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cms_estimate"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.CmsEstimate].getName, "cms_estimate"),
        (children: Seq[Expression]) =>
          graft.functions.CountMin.estimateSqlBuilder(children)))
  }
}
