package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.ReferenceFixtures._
import graft.sources.TypedHistory

/** Reference-API façade: each consumer method returns the same data the
  * underlying module produces, wired from one constructor — the
  * switching surface for a reference user. */
class GraftConsumerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val consumer: GraftConsumer = {
    val streamFile = Files.createTempFile("graft-api-stream", ".payload")
    Files.write(streamFile, streamPayload.getBytes("UTF-8"))
    val topoFile = Files.createTempFile("graft-api-topo", ".payload")
    Files.write(topoFile, (topologyDoc + NUL).getBytes("UTF-8"))
    val lake = Files.createTempDirectory("graft-api-lake").toString
    TypedHistory.writeMonitors(TypedHistory.monitorRecords(
      spark, Seq(strategicMonitorDoc), "StrategicMonitor"), lake)
    TypedHistory.writeTirf(TypedHistory.tirfRecords(spark, Seq(tirfDoc)), lake)
    TypedHistory.writeVms(TypedHistory.vmsRecords(spark, Seq(vmsDoc)), lake)
    TypedHistory.writeTopologyChanges(
      TypedHistory.topologyChangeRecords(spark, Seq(topologyChangesDoc)), lake)
    GraftConsumer(spark, streamFile.toString, topoFile.toString, lake)
  }

  test("detector-count batch image yields the canonical records") {
    val rec = consumer.detectorCountBatch()
    assert(rec.count() === 3) // 2 sites @15:43+15:48 doc1 … fixture periods
    assert(rec.columns.contains("collectionendtimestamp_plus_3_mins"))
  }

  test("current topology flattens to sites") {
    assert(consumer.currentTopology().count() === 4) // fixture sites
  }

  test("typed history methods mirror the reference consumer surface") {
    assert(consumer.strategicMonitorFrom("2019-10-20")
      .collect().map(_.getString(1)).toSeq === Seq("SM-2"))
    assert(consumer.dataFrom("StrategicMonitor", "2019-01-01").count() === 2)
    assert(consumer.allOpenTirf().count() === 2)
    assert(consumer.closedTirfFrom("2019-10-20").count() === 1)
    assert(consumer.allVms().count() === 2)
    assert(consumer.topologyChangesFrom("2019-10-20").count() === 2)
  }

  test("fromConf builds reference-shaped endpoints from spark.graft conf") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.transis.hostname", "transis.example")
    s2.conf.set("spark.graft.transis.port", "9090")
    s2.conf.set("spark.graft.transis.username", "u")
    s2.conf.set("spark.graft.transis.password", "p")
    s2.conf.set("spark.graft.history.path", "/lake/history")
    val c = GraftConsumer.fromConf(s2)
    assert(c.streamPath ===
      "http://transis.example:9090/transis/pushservice?types=DetectorCount")
    assert(c.topologyPath ===
      "http://transis.example:9090/transis/rest/getCurrentTopology")
    assert(c.historyPath === "/lake/history")
    assert(c.username === "u" && c.maxReconnects === 3)
  }
}
