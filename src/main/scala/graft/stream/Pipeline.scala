package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.Schemas
import graft.ops.DetectorCounts
import graft.parse.TransisXml
import graft.sink.{DiFramework, KinesisSink}

/** §3.1 flagship path as a Structured Streaming job:
  *
  * `readStream → frame → from_xml → gates → T1-T4 projection →
  *  foreachBatch { startJob; push-to-Kinesis-with-retry; logStatus; endJob }`
  *
  * vs the reference's single-thread loop (`transis_kinesis_connector.py:19-26`).
  * Checkpointed micro-batches give exactly-once source tracking +
  * at-least-once sink — strictly stronger than the reference's
  * resume-at-now behavior (SURVEY §2.9, allowed upgrade).
  */
object Pipeline {

  /** Transform layer shared by batch and streaming: raw payload strings
    * (column `value`) → canonical output records. Stateless narrow ops
    * only, so it plans identically under `read` and `readStream`. */
  def payloadToRecords(raw: DataFrame): DataFrame = {
    val framed = TransisXml.frame(raw)
    val parsed = TransisXml.parse(framed, Schemas.transisResponse)
    DetectorCounts.toRecords(TransisXml.detectorCountDocs(parsed))
  }

  /** File-mode streaming source: a directory of NUL-delimited document
    * files (one push payload per file), `wholetext` so framing sees the
    * whole payload. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.option("wholetext", "true").text(dir)
      .withColumnRenamed("value", "value")

  /** K6 per-batch metrics JSON (reference `transis_kinesis_connector.py:40-44`):
    * computed with one distributed agg, no driver-side row loops. */
  private def batchMetricsJson(batch: DataFrame): String = {
    val row = batch.agg(
      count(lit(1)).as("n"),
      min(col("collectionendtimestamp_plus_3_mins")).as("ts")).head()
    val n = row.getLong(0)
    val ts = if (row.isNullAt(1)) null else row.getLong(1)
    s"""{"records_in_xml_doc": $n, "collectionendtimestamp_plus_3_mins": $ts}"""
  }

  /** Wire the record stream into the job-bracketed Kinesis sink.
    *
    * @param shards number of output partitions ≈ Kinesis shard fan-out
    */
  def run(records: DataFrame, sink: KinesisSink, di: DiFramework,
          checkpointDir: String, shards: Int = 1): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        di.startJob() // D1
        try {
          val out = KinesisSink.toKinesisRecords(batch)
            .repartition(shards, col("partitionKey"))
          sink.push(out) // K1-K4 on executors
          di.logJobStatus(batchMetricsJson(batch)) // D2 + K6/A3/A4
          di.endJob() // D3
        } catch {
          case e: Exception => di.errorJob(e.getMessage); throw e // D4
        }
      }
      .start()
}
