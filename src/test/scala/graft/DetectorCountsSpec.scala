package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.fixtures.ReferenceFixtures._
import graft.model.Schemas
import graft.ops.DetectorCounts
import graft.parse.TransisXml

/** Golden-record projection tests — ports `TransisResponseModelsTests`
  * (`tests.py:57-118`), with the epoch-corrected golden value
  * (FIXTURES.md §A.1 / SURVEY §5 test-drift note). */
class DetectorCountsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def records(docs: String*) = {
    val parsed = TransisXml.parse(docs.toDF("fragment"), Schemas.transisResponse)
    DetectorCounts.toRecords(TransisXml.detectorCountDocs(parsed))
  }

  test("T1-T4 golden record (tests.py:83-118, epoch-corrected)") {
    val rows = records(singleSiteDoc).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Int]("collectionIntervalSecs") === 300)
    assert(r.getAs[String]("region") === "ROZ")
    assert(r.getAs[String]("siteId") === "2087")
    assert(r.getAs[Long]("collectionendtimestamp_plus_3_mins") === epoch1543)
    val counts = r.getAs[Map[String, String]]("detectorCounts")
    // T4 guard: Did=99 (no count attr) excluded; values stay strings
    assert(counts === Map("21" -> "5", "20" -> "6", "18" -> "12", "6" -> "1"))
  }

  test("A1: num_sites — multi-site doc projects one record per site") {
    val rows = records(multiSiteDoc).orderBy("siteId").collect()
    assert(rows.map(_.getAs[String]("siteId")).toSeq === Seq("2087", "8"))
    assert(rows.forall(
      _.getAs[Long]("collectionendtimestamp_plus_3_mins") == epoch1548))
  }

  test("T2: ISO-8601 offset timestamps round-trip through epoch") {
    // property-style grid over offsets and times (utils.py:21-31 semantics)
    val cases = Seq(
      ("2019-10-03T15:43:00+10:00", 1570081380L),
      ("2019-10-03T15:43:00+00:00", 1570117380L),
      ("2019-10-03T15:43:00-05:00", 1570135380L),
      ("2024-01-01T00:00:00+11:00", 1704027600L))
    val got = cases.map(_._1).toDF("s")
      .select(unix_timestamp(to_timestamp(col("s"),
        DetectorCounts.isoOffsetFormat)).as("e"))
      .as[Long].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("F3: nonEmptyRecords drops messages with zero valid detectors") {
    val noValid =
      """<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
        |  <DetectorCountMessages>
        |    <ns2:DetectorCountMessage Sid="1" date="2019-10-03T15:43:00+10:00" reg="X">
        |      <Detectors><Detector Did="9"/></Detectors>
        |    </ns2:DetectorCountMessage>
        |  </DetectorCountMessages>
        |</ns2:TransisResponse>""".stripMargin
    val recs = records(noValid)
    assert(recs.count() === 1) // projected…
    assert(DetectorCounts.nonEmptyRecords(recs).count() === 0) // …but empty
  }

  test("T3: received timestamp carries a Sydney +10:00/+11:00 offset") {
    val df = DetectorCounts.withReceivedTimestamp(records(singleSiteDoc))
    val ts = df.select("response_received_timestamp").as[String].head()
    assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\+1[01]:00"""), ts)
  }
}
