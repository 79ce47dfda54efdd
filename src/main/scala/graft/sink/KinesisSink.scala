package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One record bound for Kinesis: `{PartitionKey, Data}` (T5; reference
  * `kinesis_producer.py:44-56`). */
case class KinesisRecord(partitionKey: String, data: Array[Byte])

/** Per-record put outcome, mirroring the `put_records` response entries the
  * reference inspects (`kinesis_producer.py:87-98`): either a sequence
  * number or an error code. */
case class PutOutcome(errorCode: Option[String])

case class PutRecordsResult(failedRecordCount: Int, outcomes: Seq[PutOutcome])

/** Minimal client surface of `put_records` (K2). Implementations must be
  * constructible on executors — the sink takes a factory, never a live
  * connection, so pushes run distributed inside foreachPartition and no
  * record ever crosses the driver. */
trait KinesisClient extends Serializable {
  def putRecords(records: Seq[KinesisRecord], streamName: String): PutRecordsResult
}

/** K1–K4: batching, put, partial-failure single retry, lenient error
  * absorption (reference `kinesis_producer.py:20-98`).
  *
  * Scale design: the sink is executor-side only. Each task pushes its own
  * partition in `batchSize` chunks; parallelism = number of partitions of
  * the output DataFrame (co-sized to shard count by the caller via
  * `repartition`). The reference's single-thread push loop
  * (`transis_kinesis_connector.py:19-26`) becomes N concurrent pushers.
  *
  * Faithful-behavior deviation (SURVEY §2.3 T5): the reference passes the
  * literal string "region" as every record's partition key (one-shard
  * hotspot); this sink partitions by the region *value*.
  */
class KinesisSink(
    clientFactory: () => KinesisClient,
    streamName: String,
    batchSize: Int = 10,
    retrySleepMs: Long = 2000,
    lenient: Boolean = true,
    sleeper: Long => Unit = Thread.sleep) extends Serializable {

  /** Retryable error code (F6; reference `kinesis_producer.py:92`). */
  val ThroughputExceeded = "ProvisionedThroughputExceededException"

  /** K1+K2+K3+K4 for one iterator of records (one Spark partition). Returns
    * (attempted, droppedAfterRetry). */
  def pushPartition(records: Iterator[KinesisRecord]): (Long, Long) = {
    val client = clientFactory()
    var attempted = 0L
    var dropped = 0L
    records.grouped(batchSize).foreach { chunk => // K1 fixed-size batching
      attempted += chunk.size
      try dropped += putWithRetry(client, chunk, retry = true)
      catch {
        case e: Exception if lenient => // K4: log + absorb, batch dropped
          dropped += chunk.size
          System.err.println(s"[kinesis-sink] batch dropped: ${e.getMessage}")
      }
    }
    (attempted, dropped)
  }

  /** K3: on partial failure, re-put exactly the throughput-throttled subset
    * (positional zip, F6) once after a penalty sleep; further failures are
    * dropped (reference `kinesis_producer.py:70-79`). Returns #dropped. */
  private def putWithRetry(client: KinesisClient, chunk: Seq[KinesisRecord],
                           retry: Boolean): Long = {
    val res = client.putRecords(chunk, streamName)
    if (res.failedRecordCount <= 0) 0L
    else {
      val failed = chunk.zip(res.outcomes).collect { // F6 positional zip
        case (rec, PutOutcome(Some(code))) if code == ThroughputExceeded => rec
      }
      val nonRetryable = res.failedRecordCount - failed.size
      if (retry && failed.nonEmpty) {
        sleeper(retrySleepMs) // 2 s penalty (reference kinesis_producer.py:76)
        nonRetryable + putWithRetry(client, failed, retry = false)
      } else nonRetryable + failed.size
    }
  }

  /** Distributed push of a (micro-)batch. Input must have columns
    * `partitionKey` (string) and `data` (binary). */
  def push(df: DataFrame): Unit = {
    val sink = this
    df.select(col("partitionKey"), col("data"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        sink.pushPartition(rows.map(r =>
          KinesisRecord(r.getString(0), r.getAs[Array[Byte]](1))))
        ()
      }
  }
}

object KinesisSink {
  /** T5 + P5: decorate an output-record DataFrame as Kinesis records —
    * partition key = region value, data = UTF-8 JSON of the record
    * (reference `kinesis_producer.py:53-56`). */
  def toKinesisRecords(records: DataFrame): DataFrame =
    records.select(
      col("region").as("partitionKey"),
      encode(to_json(struct(records.columns.toIndexedSeq.map(col): _*)), "UTF-8")
        .as("data"))
}
