package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.ReferenceFixtures._
import graft.fakesdk.FakeSdkState
import graft.sink.{ProcCaller, SdkKinesisClient}

/** Live-mode rehearsal: [[LiveMain.wire]] assembles the DEPLOYABLE
  * pipeline — config surface → Transis source → parse/filter →
  * job-bracketed Kinesis push through the REAL reflective SDK adapter —
  * and this spec drives one document through that exact wiring against
  * the in-repo stubs (file transport, fake SDK with the AWS method
  * shapes, recording DB caller). The only differences from a
  * production launch are the class-name knobs and the conf values. */
class LiveMainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private class RecordingCaller extends ProcCaller {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Any])]
    @volatile var closed = false
    override def call(proc: String, args: Seq[Any]): String = synchronized {
      calls += ((proc, args))
      if (proc.endsWith("strt_job"))
        """[{"key":"job_id","value":"J-77"}]"""
      else """[{"key":"status","value":"success"}]"""
    }
    override def close(): Unit = closed = true
  }

  test("one document end-to-end through the deployable wiring") {
    val payload = java.nio.file.Files
      .createTempFile("graft-live", ".payload").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(payload),
      (singleSiteDoc + NUL).getBytes("UTF-8"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-live-ckpt").toString

    val confKeys = Map(
      "spark.graft.transis.path" -> payload,
      "spark.graft.checkpointDir" -> ckpt,
      "spark.graft.kinesis.streamName" -> "rehearsal-stream",
      "spark.graft.kinesis.batchSize" -> "10",
      "spark.graft.di.schemaName" -> "disch",
      "spark.graft.di.jobName" -> "graft_rehearsal")
    confKeys.foreach { case (k, v) => spark.conf.set(k, v) }
    FakeSdkState.reset()
    val caller = new RecordingCaller

    val wired = LiveMain.wire(spark,
      // the REAL reflective adapter, pointed at the in-repo SDK shapes
      clientFactory = Some(() => new SdkKinesisClient(
        kinesisClientClass = "graft.fakesdk.KinesisClient",
        modelPackage = "graft.fakesdk",
        sdkBytesClass = "graft.fakesdk.SdkBytes")),
      procCaller = Some(caller))
    try {
      wired.query.processAllAvailable()

      // the document traversed parse -> detector-count record -> K5
      // serialization -> reflective put on the configured stream
      assert(FakeSdkState.requests.size === 1)
      val req = FakeSdkState.requests.peek()
      assert(req.streamName === "rehearsal-stream")
      assert(req.entries.size === 1)
      val body = new String(req.entries.get(0).data.bytes, "UTF-8")
      assert(body.contains("\"siteId\""),
        s"pushed record must be the serialized detector counts: $body")

      // the batch ran inside one D1->D2->D3 bracket with the stashed id
      val procs = caller.synchronized(caller.calls.map(_._1).toList)
      assert(procs === List("disch.strt_job", "disch.log_job_stus",
        "disch.end_job"))
      val logArgs = caller.synchronized(caller.calls(1)._2)
      assert(logArgs.take(2) === Seq("graft_rehearsal", "J-77"))
      assert(logArgs(2).toString.contains("\"records_in_xml_doc\": 1"))
    } finally {
      wired.query.stop()
      confKeys.keys.foreach(spark.conf.unset)
    }
  }

  test("a missing checkpoint location fails fast, never defaults to temp") {
    // a per-launch temp checkpoint would silently discard stream
    // progress on restart and reset the publish namespace — replaying
    // delivered pushes; the deployable entry point must refuse
    val payload = java.nio.file.Files
      .createTempFile("graft-live-nockpt", ".payload").toString
    spark.conf.set("spark.graft.transis.path", payload)
    try {
      val e = intercept[IllegalArgumentException] {
        LiveMain.wire(spark,
          clientFactory = Some(() => new SdkKinesisClient(
            kinesisClientClass = "graft.fakesdk.KinesisClient",
            modelPackage = "graft.fakesdk",
            sdkBytesClass = "graft.fakesdk.SdkBytes")),
          procCaller = Some(new RecordingCaller))
      }
      assert(e.getMessage.contains("checkpointDir"))
    } finally spark.conf.unset("spark.graft.transis.path")
  }
}
