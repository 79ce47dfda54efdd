package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories; every entry in `queries` has a
  * DuckDB-runnable oracle in `oracleSql` unless the operator is genuinely not
  * SQL-expressible (in which case the driver records a rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.XmlQueries.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.queries.HistoryQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.XmlQueries.oracleSql ++
      graft.queries.EventsQueries.oracleSql ++
      graft.queries.ExtQueries.oracleSql ++
      graft.queries.HistoryQueries.oracleSql
}
