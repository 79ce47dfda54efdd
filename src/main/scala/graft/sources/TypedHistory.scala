package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.parse.TransisXml

/** S5–S8: the typed batch-scan surface (SURVEY.md §2.1; reference
  * `transis_consumer.py:157-225`).
  *
  * The reference pushes the type selector and date bound into URL params
  * (`getFromDate?startDate=…&types=…`, plus dedicated TIRF / VMS /
  * topology-change endpoints). At rest the same pushdown is layout:
  *
  *  - typed `getFromDate` records land in ONE `monitor` table partitioned
  *    by `(doc_type, dt)` — the `types=` param becomes a partition filter,
  *    the `startDate` param a `dt` partition filter; a typed read opens
  *    only its own directories (static partition pruning, no data files
  *    touched outside the range);
  *  - TIRF / VMS / topology-change records each land in their own table
  *    partitioned by `dt` (separate endpoints → separate tables).
  *
  * 100 TB design: every reader below resolves to partition pruning plus
  * parquet row-group stats — no full scans; the VMS current-state read is
  * a `max_by` per sign (one partial-aggregated shuffle on the sign id),
  * which is the scalable dedup-to-latest shape for CDC snapshots.
  */
object TypedHistory {

  /** The three S5 type selectors (reference `transis_consumer.py:175-201`). */
  val monitorTypes: Seq[String] = Seq("StrategicMonitor", "Motorway", "SiteAlarm")

  private def parseDocs(spark: SparkSession, docs: Seq[String],
                        schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    TransisXml.parse(docs.toDF("fragment"), schema)
  }

  /** Flatten typed getFromDate documents of one element type into records
    * `(doc_type, id, date, reg, value, dt)`; `dt` is the record's local
    * calendar date (first 10 chars of the ISO timestamp), the partition
    * key the date predicate prunes on. */
  def monitorRecords(spark: SparkSession, docs: Seq[String],
                     docType: String): DataFrame =
    parseDocs(spark, docs, Schemas.monitorResponse(docType))
      .select(explode(col(s"doc.${docType}s.$docType")).as("m"))
      .select(
        lit(docType).as("doc_type"),
        col("m._id").as("id"),
        col("m._date").as("date"),
        col("m._reg").as("reg"),
        col("m._value").as("value"),
        substring(col("m._date"), 1, 10).as("dt"))

  /** TIRF records; `dt` follows the record's event date — closedDate for
    * closed incidents, openedDate for open ones — so closed-since-date
    * reads prune to the matching partitions. */
  def tirfRecords(spark: SparkSession, docs: Seq[String]): DataFrame =
    parseDocs(spark, docs, Schemas.tirfResponse)
      .select(explode(col("doc.TIRFs.TIRF")).as("t"))
      .select(
        col("t._tirfId").as("tirfId"),
        col("t._status").as("status"),
        col("t._siteId").as("siteId"),
        col("t._openedDate").as("openedDate"),
        col("t._closedDate").as("closedDate"),
        substring(coalesce(col("t._closedDate"), col("t._openedDate")), 1, 10)
          .as("dt"))

  def vmsRecords(spark: SparkSession, docs: Seq[String]): DataFrame =
    parseDocs(spark, docs, Schemas.vmsResponse)
      .select(explode(col("doc.VMSs.VMS")).as("v"))
      .select(
        col("v._vmsId").as("vmsId"),
        col("v._location").as("location"),
        col("v._message").as("message"),
        col("v._updatedDate").as("updatedDate"),
        substring(col("v._updatedDate"), 1, 10).as("dt"))

  def topologyChangeRecords(spark: SparkSession, docs: Seq[String]): DataFrame =
    parseDocs(spark, docs, Schemas.topologyChangesResponse)
      .select(explode(col("doc.TopologyChanges.TopologyChange")).as("c"))
      .select(
        col("c._sId").as("sId"),
        col("c._op").as("op"),
        col("c._date").as("date"),
        substring(col("c._date"), 1, 10).as("dt"))

  // ---- landing ----

  def writeMonitors(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").partitionBy("doc_type", "dt")
      .parquet(s"$path/monitor")

  def writeTirf(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").partitionBy("dt").parquet(s"$path/tirf")

  def writeVms(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").partitionBy("dt").parquet(s"$path/vms")

  def writeTopologyChanges(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").partitionBy("dt")
      .parquet(s"$path/topology_changes")

  // ---- S5: typed getFromDate readers ----

  /** Generic S4/S5 read: `types=` → doc_type partition filter, `startDate`
    * → dt partition filter. Both prune directories, not rows. */
  def monitorFrom(spark: SparkSession, path: String, docType: String,
                  fromDate: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/monitor")
      .filter(col("doc_type") === docType && col("dt") >= fromDate)
      .select("doc_type", "id", "date", "reg", "value")

  /** The reference's `getWithinDates` endpoint (`transis_consumer.py:21`
    * — declared but never wired to a consumer method): both bounds are
    * dt partition filters. */
  def monitorWithin(spark: SparkSession, path: String, docType: String,
                    fromDate: String, toDate: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/monitor")
      .filter(col("doc_type") === docType &&
        col("dt") >= fromDate && col("dt") <= toDate)
      .select("doc_type", "id", "date", "reg", "value")

  def strategicMonitorFrom(spark: SparkSession, path: String,
                           fromDate: String): DataFrame =
    monitorFrom(spark, path, "StrategicMonitor", fromDate)

  def motorwayFrom(spark: SparkSession, path: String,
                   fromDate: String): DataFrame =
    monitorFrom(spark, path, "Motorway", fromDate)

  def siteAlarmFrom(spark: SparkSession, path: String,
                    fromDate: String): DataFrame =
    monitorFrom(spark, path, "SiteAlarm", fromDate)

  // ---- S6: TIRF readers ----

  /** All currently-open incidents (reference `get_all_open_tirf`) — a
    * status predicate served by parquet row-group stats (open incidents
    * are not date-bounded, so no partition filter applies). */
  def openTirf(spark: SparkSession, path: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/tirf")
      .filter(col("status") === "OPEN")
      .select("tirfId", "status", "siteId", "openedDate", "closedDate")

  /** Incidents closed since `fromDate` (reference `get_all_closed_tirf`):
    * dt follows closedDate for closed records, so this prunes to the
    * partitions at-or-after the bound. */
  def closedTirfFrom(spark: SparkSession, path: String,
                     fromDate: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/tirf")
      .filter(col("status") === "CLOSED" && col("dt") >= fromDate)
      .select("tirfId", "status", "siteId", "openedDate", "closedDate")

  // ---- S7: VMS current state ----

  /** Current VMS data (reference `get_all_vms`): landed snapshots are
    * deduped to the latest update per sign with `max_by` — one
    * partial-aggregated shuffle on vmsId. */
  def allVms(spark: SparkSession, path: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/vms")
      .groupBy(col("vmsId"))
      .agg(
        max_by(col("location"), col("updatedDate")).as("location"),
        max_by(col("message"), col("updatedDate")).as("message"),
        max(col("updatedDate")).as("updatedDate"))

  // ---- S8: topology-change CDC ----

  /** Topology deltas since `fromDate` (reference
    * `get_topology_changes_from`): append-only change rows, partition-
    * pruned on dt. Consumers replay ops in date order per site. */
  def topologyChangesFrom(spark: SparkSession, path: String,
                          fromDate: String): DataFrame =
    graft.sources.History.readParquetFooterSchema(spark, s"$path/topology_changes")
      .filter(col("dt") >= fromDate)
      .select("sId", "op", "date")
}
