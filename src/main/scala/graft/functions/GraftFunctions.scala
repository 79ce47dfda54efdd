package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** The ONE list of the engine's SQL-callable functions — both
  * registration surfaces ([[graft.GraftExtensions]] at builder time,
  * [[graft.Views.registerSqlFunctions]] on an existing session) iterate
  * this list, so a new function can't land on one surface only
  * (`SqlSurfaceSpec`'s parity test locks the invariant from the outside
  * in case a registration ever bypasses the list).
  *
  * Each entry: (SQL name, implementing class name for ExpressionInfo,
  * expression builder). */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct].getName,
      exprs => DotProduct(exprs(0), exprs(1))),
    ("hll_distinct", classOf[HyperLogLogAgg].getName,
      exprs => HyperLogLogAgg(exprs.head).toAggregateExpression()),
    ("hll_sketch", classOf[HyperLogLogSketchAgg].getName,
      exprs => HyperLogLogSketchAgg(exprs.head).toAggregateExpression()),
    ("hll_union", classOf[HllUnion].getName,
      exprs => HllUnion(exprs(0), exprs(1))),
    ("hll_estimate", classOf[HllEstimate].getName,
      exprs => HllEstimate(exprs.head)),
    ("bottom_k", classOf[BottomKAgg].getName, BottomK.sqlBuilder),
    ("misra_gries", classOf[MisraGriesAgg].getName, MisraGriesFn.sqlBuilder),
    ("top_k_scored", classOf[TopKScoredAgg].getName, TopKScored.sqlBuilder),
    ("bloom_build", classOf[BloomBuildAgg].getName, Bloom.buildSqlBuilder),
    ("bloom_might_contain", classOf[BloomMightContain].getName,
      Bloom.probeSqlBuilder),
    ("bloom_merge", classOf[BloomMergeAgg].getName, Bloom.mergeSqlBuilder),
    ("cms_build", classOf[CountMinAgg].getName, CountMin.buildSqlBuilder),
    ("cms_estimate", classOf[CmsEstimate].getName,
      CountMin.estimateSqlBuilder),
    ("cms_merge", classOf[CmsMergeAgg].getName, CountMin.mergeSqlBuilder),
    ("md5_prefix", classOf[Md5Prefix].getName, Md5Prefix.sqlBuilder),
    ("bpe_tokens", classOf[BpeTokens].getName, BpeSql.tokensBuilder),
    ("bpe_token_count", classOf[BpeTokenCount].getName,
      BpeSql.countBuilder))

  /** SQL names only — what the parity test asserts against both
    * surfaces' function registries. */
  def names: Seq[String] = all.map(_._1)
}
