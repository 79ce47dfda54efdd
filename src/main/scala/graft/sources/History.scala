package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date/type-parameterized history access (S4–S8 semantics, SURVEY.md §2.1):
  * the reference pushes `startDate`/`types` filters into URL params
  * (`transis_consumer.py:157-225`); at rest the same pushdown is achieved by
  * partition layout + partition pruning and parquet predicate pushdown.
  *
  * 100 TB design: history is laid out `region=<r>/dt=<yyyy-MM-dd>/…`, so a
  * date- or region-bounded read touches only matching directories (static
  * partition pruning; dynamic pruning kicks in for join-driven predicates).
  * Within files, min/max row-group stats serve the residual predicates.
  */
object History {

  /** Land canonical records partitioned by region and collection date.
    *
    * The repartition on the partition columns is the small-files guard:
    * without it every task holding rows of a (region, dt) writes its own
    * file into that directory — tasks × live partitions files per batch,
    * the classic lake-rot shape at scale. Hashing rows to their output
    * directory first gives ~one file per directory; `maxRecordsPerFile`
    * re-splits a pathologically hot partition so a single writer task
    * can't produce one monster file either.
    *
    * @param mode "overwrite" for batch loads; "append" for the streaming
    *   archive path (each foreachBatch lands its micro-batch into the
    *   same layout — exactly-once when guarded by the Pipeline
    *   BatchLedger). */
  def writePartitioned(records: DataFrame, path: String,
                       mode: String = "overwrite"): Unit =
    records
      .withColumn("dt", date_format(
        timestamp_seconds(col("collectionendtimestamp_plus_3_mins")),
        "yyyy-MM-dd"))
      .repartition(col("region"), col("dt"))
      // sorted within files → tight parquet row-group min/max stats on
      // (siteId, ts), so site- or time-bounded residual predicates skip
      // row groups inside the pruned partitions too
      .sortWithinPartitions(col("siteId"),
        col("collectionendtimestamp_plus_3_mins"))
      .write.mode(mode)
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("region", "dt")
      .parquet(path)

  /** Latest-wins compaction of a lake slice — the "current state"
    * materialization (the same shape the VMS reader computes on read,
    * done once at rest). Keeps the newest record per key within every
    * partition the predicate touches and rewrites ONLY those partitions:
    * `partitionOverwriteMode=dynamic` scopes the overwrite to the
    * directories the job emits, so compacting one day of one region
    * never rewrites (or even lists) the rest of a 100 TB lake. The
    * window sort is per (partition, key) — bounded by a partition's
    * update count, never global.
    *
    * The predicate may reference ONLY the partition columns (region, dt):
    * a row-level predicate (say `siteId = 8`) would select a subset of a
    * partition's rows and then dynamic-overwrite the whole partition
    * with that subset — silently deleting every other row. Enforced, not
    * just documented.
    *
    * Durability note: this is a read-rewrite of the same path. The
    * compacted slice is eagerly materialized BEFORE the overwrite begins
    * (so the job never reads directories it is deleting), but the
    * directory swap itself is not transactional — a crash between delete
    * and rename can lose the partition. On a production lake put a
    * transactional table format in front of raw parquet for this
    * operation.
    *
    * @param keyCols identity columns within a partition (e.g. siteId)
    * @param tsCol   recency column; ties keep the lexicographically
    *                largest remaining row deterministically */
  def compactLatest(spark: SparkSession, path: String,
                    keyCols: Seq[String], tsCol: String,
                    predicate: org.apache.spark.sql.Column): Unit = {
    val slice = spark.read.parquet(path).filter(predicate)
    val refs = slice.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSeq
    }.flatten.toSet
    require(refs.subsetOf(Set("region", "dt")),
      s"compactLatest predicate may only reference partition columns " +
        s"(region, dt); got ${refs.mkString(", ")} — a row-level " +
        s"predicate would overwrite whole partitions with a row subset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((Seq("region", "dt") ++ keyCols).map(col): _*)
      .orderBy(col(tsCol).desc)
    val latest = slice.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .repartition(col("region"), col("dt"))
      .sortWithinPartitions(col("siteId"), col(tsCol))
      // materialize fully before the overwrite deletes its own input
      .localCheckpoint(true)
    latest.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("region", "dt")
      .parquet(path)
    org.apache.spark.sql.graftbridge.DatasetBridge.backingRdds(latest)
      .foreach(_.unpersist(blocking = false))
  }

  /** S4: `get_data_from` — date-bounded scan; the `dt >= …` predicate is a
    * partition filter (no data files outside the range are opened). */
  def readFrom(spark: SparkSession, path: String, fromDate: String): DataFrame =
    spark.read.parquet(path).filter(col("dt") >= fromDate)

  /** S5-flavored: region + date bounded scan (both partition columns). */
  def readRegionFrom(spark: SparkSession, path: String, region: String,
                     fromDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("region") === region && col("dt") >= fromDate)
}
