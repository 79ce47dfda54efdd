package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.fixtures.ReferenceFixtures._
import graft.sink._
import graft.stream.Pipeline

/** Executor-side state sink — static so local-mode task serialization still
  * lands mutations in this JVM. */
object PipelineSpecState {
  val pushed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val procCalls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { pushed.clear(); procCalls.clear() }
}

class RecordingClient extends KinesisClient {
  override def putRecords(records: Seq[KinesisRecord],
                          streamName: String): PutRecordsResult = {
    records.foreach(r => PipelineSpecState.pushed.add(
      r.partitionKey + "|" + new String(r.data, "UTF-8")))
    PutRecordsResult(0, records.map(_ => PutOutcome(None)))
  }
}

class RecordingCaller extends ProcCaller {
  override def call(proc: String, args: Seq[Any]): String = {
    PipelineSpecState.procCalls.add(proc + "(" + args.mkString(",") + ")")
    """[{"key": "job_id", "value": "42"}, {"key": "status", "value": "success"}]"""
  }
}

/** End-to-end §3.1 flagship path under Structured Streaming with the
  * reference's begin/process/commit job bracket
  * (`transis_kinesis_connector.py:19-26`). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("stream payload → records → Kinesis push with D1→D2→D3 bracket") {
    import spark.implicits._
    PipelineSpecState.reset()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val records = Pipeline.payloadToRecords(input.toDF())
    val sink = new KinesisSink(() => new RecordingClient, "stream",
      sleeper = _ => ())
    val di = new DiFramework(new RecordingCaller, "disch", "graft_job")
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val q = Pipeline.run(records, sink, di, checkpoint)
    try {
      input.addData(streamPayload)
      q.processAllAvailable()
    } finally q.stop()

    // 3 records (1 single-site + 2 multi-site); error + empty docs dropped
    val pushed = PipelineSpecState.pushed.toArray.map(_.toString).sorted
    assert(pushed.length === 3)
    // partition key is the region VALUE (documented T5 deviation)
    assert(pushed.map(_.split('|').head).toSet === Set("ROZ", "SYD"))
    // JSON-encoded canonical record on the wire (P5)
    assert(pushed.exists(s => s.contains(""""siteId":"8"""") &&
      s.contains(""""collectionIntervalSecs":300""")))

    // D1 → D2(metrics) → D3 order, parameterized calls (D6 fix)
    val calls = PipelineSpecState.procCalls.toArray.map(_.toString).toList
    assert(calls.head.startsWith("disch.strt_job(graft_job)"))
    assert(calls(1).startsWith("disch.log_job_stus(graft_job,42,"))
    assert(calls(1).contains(""""records_in_xml_doc": 3"""))
    assert(calls(1).contains(epoch1543.toString)) // A4 first/min timestamp
    assert(calls(2).startsWith("disch.end_job(graft_job,42)"))
  }

  test("BatchLedger makes a replayed foreachBatch exactly-once at the sink") {
    import spark.implicits._
    PipelineSpecState.reset()
    val records = Pipeline.payloadToRecords(Seq(singleSiteDoc).toDF("value"))
    val sink = new KinesisSink(() => new RecordingClient, "stream",
      sleeper = _ => ())
    val di = new DiFramework(new RecordingCaller, "disch", "graft_job")
    val ledger = new Pipeline.InMemoryBatchLedger
    // first delivery of batch 0: pushes + brackets + marks the ledger
    Pipeline.pushBatch(records, 0L, sink, di, 1, Some(ledger))
    assert(PipelineSpecState.pushed.size === 1)
    assert(ledger.lastCommitted === 0L)
    // crash-replay of batch 0 (Structured Streaming re-runs the last
    // unacknowledged batch on restart): no duplicate push, no duplicate
    // DI job bracket
    val callsAfterFirst = PipelineSpecState.procCalls.size
    Pipeline.pushBatch(records, 0L, sink, di, 1, Some(ledger))
    assert(PipelineSpecState.pushed.size === 1)
    assert(PipelineSpecState.procCalls.size === callsAfterFirst)
    // the NEXT batch flows normally
    Pipeline.pushBatch(records, 1L, sink, di, 1, Some(ledger))
    assert(PipelineSpecState.pushed.size === 2)
    assert(ledger.lastCommitted === 1L)
  }

  test("D5: K/V extraction from proc response (di_framework.py:44-55)") {
    val di = new DiFramework(new RecordingCaller, "s", "j")
    assert(di.extractValue(
      """[{"key": "job_id", "value": "7"}]""", "job_id") === Some("7"))
    assert(di.extractValue("""[{"key": "other", "value": "7"}]""", "job_id")
      === None)
  }
}
