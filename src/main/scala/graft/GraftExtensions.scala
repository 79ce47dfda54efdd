package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use
  * (`spark.sql("SELECT dot_product(a, b) …")`) and the lake DML rule
  * (`UPDATE lake.\`/path\` SET … WHERE …` →
  * [[graft.sources.History.updateWhere]]; see
  * [[graft.sources.LakeDmlRule]]).
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * The function set comes from [[graft.functions.GraftFunctions.all]] —
  * the single list shared with [[Views.registerSqlFunctions]], so both
  * surfaces always expose the same functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.all.foreach {
      case (name, className, builder) =>
        e.injectFunction(
          (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
            new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
              className, name),
            builder))
    }
    e.injectPostHocResolutionRule(session =>
      new graft.sources.LakeDmlRule(session))
  }
}
