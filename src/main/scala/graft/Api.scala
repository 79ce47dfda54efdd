package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas
import graft.ops.Topology
import graft.parse.TransisXml
import graft.sources.{GraftConfig, TypedHistory}
import graft.stream.Pipeline

/** Reference-API façade: every public consumer method of the reference
  * (`transis_consumer.py`) has a 1:1 counterpart here returning the
  * Spark-first equivalent, so a reference user switches by replacing
  * `TransisConsumer(connection_details)` with `GraftConsumer.fromConf`
  * (live mode, endpoints built from `spark.graft.transis.*` conf) or a
  * direct construction over file/lake paths (batch and test mode).
  *
  * | reference (`transis_consumer.py`)      | here                        |
  * |----------------------------------------|-----------------------------|
  * | `get_detector_counts()`          :115  | `detectorCountRecords()`    |
  * | `get_transis_detector_count_stream()` :52 | `detectorCountStream()`  |
  * | `get_current_topology()`         :153  | `currentTopology()`         |
  * | `get_topology_changes_from(d)`   :157  | `topologyChangesFrom(d)`    |
  * | `get_data_from(types, d)`        :166  | `dataFrom(docType, d)`      |
  * | `get_strategic_monitor_from(d)`  :175  | `strategicMonitorFrom(d)`   |
  * | `get_motorway_from(d)`           :184  | `motorwayFrom(d)`           |
  * | `get_site_alarm_from(d)`         :193  | `siteAlarmFrom(d)`          |
  * | `get_all_open_tirf()`            :203  | `allOpenTirf()`             |
  * | `get_all_closed_tirf(d)`         :209  | `closedTirfFrom(d)`         |
  * | `get_all_vms()`                  :218  | `allVms()`                  |
  * | `start_transis_http_session()`   :237  | credentials ride the source options (S9) |
  *
  * @param streamPath   push-stream endpoint: http(s) URL (live) or a
  *                     NUL-framed payload file (test/replay)
  * @param topologyPath current-topology endpoint or payload file
  * @param historyPath  typed-history lake root (TypedHistory layout)
  */
final case class GraftConsumer(spark: SparkSession,
                               streamPath: String,
                               topologyPath: String,
                               historyPath: String,
                               username: String = null,
                               password: String = null,
                               stallTimeoutMs: Int = 20 * 60 * 1000,
                               maxReconnects: Int = 3,
                               maxDocsPerBatch: Option[Long] = None) {

  private def transis(path: String) = {
    var r = spark.read.format("transis")
      .option("path", path)
      .option("stalltimeoutms", stallTimeoutMs.toString)
      .option("maxreconnects", maxReconnects.toString)
    if (username != null)
      r = r.option("username", username).option("password", password)
    r.load()
  }

  /** S1/S2 live stream of framed documents (one `value` row per doc).
    * `maxDocsPerBatch` bounds each micro-batch (admission control) —
    * `Some(1)` reproduces the reference generator's one-document-at-a-
    * time cadence (`transis_consumer.py:115-151`); pair with
    * `Trigger.AvailableNow()` to drain a backfill and stop. */
  def detectorCountStream(): DataFrame = {
    var r = spark.readStream.format("transis")
      .option("path", streamPath)
      .option("stalltimeoutms", stallTimeoutMs.toString)
      .option("maxreconnects", maxReconnects.toString)
    maxDocsPerBatch.foreach(n =>
      r = r.option("maxdocsperbatch", n.toString))
    if (username != null)
      r = r.option("username", username).option("password", password)
    r.load()
  }

  /** The reference's `get_detector_counts` generator: canonical output
    * records, streaming. Pair with `stream.Pipeline.run` for the full
    * Kinesis-sink path. */
  def detectorCountRecords(): DataFrame =
    Pipeline.payloadToRecords(detectorCountStream())

  /** One-shot batch image of the current push payload. */
  def detectorCountBatch(): DataFrame =
    Pipeline.payloadToRecords(transis(streamPath))

  /** S3 `get_current_topology`: flattened site layouts. Compose with
    * `ops.Topology.{arms,detectors,streets,sgs,phases}` for the child
    * tables (the reference's per-subcomponent CSV views). */
  def currentTopology(): DataFrame =
    Topology.sites(TransisXml.parse(
      transis(topologyPath).withColumnRenamed("value", "fragment"),
      Schemas.topologyResponse))

  /** S4 `get_data_from(types, from_date)` over the history lake. */
  def dataFrom(docType: String, fromDate: String): DataFrame =
    TypedHistory.monitorFrom(spark, historyPath, docType, fromDate)

  /** The reference's declared-but-unwired `getWithinDates` endpoint
    * (`transis_consumer.py:21`), completed here. */
  def dataWithin(docType: String, fromDate: String,
                 toDate: String): DataFrame =
    TypedHistory.monitorWithin(spark, historyPath, docType, fromDate, toDate)

  def strategicMonitorFrom(fromDate: String): DataFrame =
    TypedHistory.strategicMonitorFrom(spark, historyPath, fromDate)

  def motorwayFrom(fromDate: String): DataFrame =
    TypedHistory.motorwayFrom(spark, historyPath, fromDate)

  def siteAlarmFrom(fromDate: String): DataFrame =
    TypedHistory.siteAlarmFrom(spark, historyPath, fromDate)

  def allOpenTirf(): DataFrame = TypedHistory.openTirf(spark, historyPath)

  def closedTirfFrom(fromDate: String): DataFrame =
    TypedHistory.closedTirfFrom(spark, historyPath, fromDate)

  def allVms(): DataFrame = TypedHistory.allVms(spark, historyPath)

  def topologyChangesFrom(fromDate: String): DataFrame =
    TypedHistory.topologyChangesFrom(spark, historyPath, fromDate)
}

object GraftConsumer {
  /** Live-mode construction: endpoints + credentials from
    * `spark.graft.transis.*` conf (S9/S10), mirroring the reference's
    * endpoint table (`transis_consumer.py:19-40`). The history lake root
    * comes from `spark.graft.history.path`. */
  def fromConf(spark: SparkSession): GraftConsumer = {
    val c = GraftConfig.fromSparkConf(spark).transis
    val domain = s"http://${c.hostname}:${c.port}/transis"
    GraftConsumer(spark,
      streamPath = s"$domain/pushservice?types=DetectorCount",
      topologyPath = s"$domain/rest/getCurrentTopology",
      historyPath = spark.conf
        .getOption("spark.graft.history.path").getOrElse(""),
      username = if (c.username.nonEmpty) c.username else null,
      password = if (c.password.nonEmpty) c.password else null,
      stallTimeoutMs = c.streamTimeoutSecs * 1000,
      maxReconnects = c.maxReconnects)
  }
}
