package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.fixtures.ReferenceFixtures._
import graft.stream.{GapMonitor, Pipeline}

/** Cross-batch custom state via flatMapGroupsWithState: cadence-gap
  * detection per site across micro-batches. */
class GapMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def doc(sid: String, iso: String): String =
    s"""<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
       |  <DetectorCountMessages>
       |    <ns2:DetectorCountMessage Sid="$sid" date="$iso" reg="ROZ">
       |      <Detectors><Detector Did="1" count="2"/></Detectors>
       |    </ns2:DetectorCountMessage>
       |  </DetectorCountMessages>
       |</ns2:TransisResponse>""".stripMargin

  test("gap alerts fire across micro-batches, state survives between them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val alerts = GapMonitor.alerts(
      Pipeline.payloadToRecords(input.toDF()), maxGapSecs = 900)
    val q = alerts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("gap_alerts").start()
    try {
      // batch 1: sites 2087 and 9 at 15:43
      input.addData(doc("2087", "2019-10-03T15:43:00+10:00") + NUL +
        doc("9", "2019-10-03T15:43:00+10:00") + NUL)
      q.processAllAvailable()
      assert(spark.table("gap_alerts").count() === 0)
      // batch 2: site 2087 on-cadence (+5 min) → no alert;
      //          site 9 after a 20-min gap → alert
      input.addData(doc("2087", "2019-10-03T15:48:00+10:00") + NUL +
        doc("9", "2019-10-03T16:03:00+10:00") + NUL)
      q.processAllAvailable()
      val rows = spark.table("gap_alerts").collect()
        .map(r => (r.getAs[String]("siteId"), r.getAs[Long]("gapSecs")))
      assert(rows.toSeq === Seq(("9", 1200L)))
    } finally q.stop()
  }

  test("gaps inside a single batch are detected too") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val alerts = GapMonitor.alerts(
      Pipeline.payloadToRecords(input.toDF()), maxGapSecs = 900)
    val q = alerts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("gap_alerts2").start()
    try {
      input.addData(doc("5", "2019-10-03T15:43:00+10:00") + NUL +
        doc("5", "2019-10-03T16:13:00+10:00") + NUL)
      q.processAllAvailable()
      val rows = spark.table("gap_alerts2").collect()
        .map(r => (r.getAs[String]("siteId"), r.getAs[Long]("gapSecs")))
      assert(rows.toSeq === Seq(("5", 1800L)))
    } finally q.stop()
  }
}
