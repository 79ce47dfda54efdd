package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.ReferenceFixtures._
import graft.model.Schemas
import graft.parse.TransisXml

/** Framing + parse + gates (P1-P4, F1-F2) — ports the reference's
  * `TransisConsumerTests` / error-polarity checks (`tests.py:17-54,57-76`). */
class TransisXmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("P1/F1: NUL framing splits payload into non-empty fragments") {
    val framed = TransisXml.frame(Seq(streamPayload).toDF("value"))
    assert(framed.count() === 4) // empty fragment from doubled NUL dropped
  }

  test("P1: multi-document byte string yields N responses (tests.py:39-44)") {
    val two = singleSiteDoc + NUL + singleSiteDoc + NUL
    assert(TransisXml.frame(Seq(two).toDF("value")).count() === 2)
  }

  test("P4: error detection both polarities (tests.py:62-76)") {
    val parsed = TransisXml.parse(
      Seq(singleSiteDoc, errorDoc).toDF("fragment"), Schemas.transisResponse)
    val flags = parsed.select(TransisXml.isErrorDoc(col("doc")))
      .as[Boolean].collect().toSeq
    assert(flags === Seq(false, true))
  }

  test("P4: error docs route to side output with message") {
    val parsed = TransisXml.parse(
      Seq(errorDoc).toDF("fragment"), Schemas.transisResponse)
    val msgs = TransisXml.errorDocs(parsed).as[String].collect().toSeq
    assert(msgs === Seq("Transis unavailable"))
  }

  test("F2 + truthiness: empty DetectorCountMessages treated as absent") {
    val parsed = TransisXml.parse(
      Seq(singleSiteDoc, emptyMessagesDoc, errorDoc).toDF("fragment"),
      Schemas.transisResponse)
    assert(TransisXml.detectorCountDocs(parsed).count() === 1)
  }

  test("framing invariant: arbitrary doc concatenations frame correctly") {
    // ScalaCheck-style property over a deterministic grid: any multiset of
    // docs + stray empty fragments frames to exactly the doc count
    // (invariant of transis_consumer.py:88-89,127-139).
    val docs = Seq(singleSiteDoc, multiSiteDoc, errorDoc, emptyMessagesDoc)
    for (n <- 1 to 4; extraNuls <- 0 to 2) {
      val payload = docs.take(n).mkString(NUL) + NUL + (NUL * extraNuls)
      val count = TransisXml.frame(Seq(payload).toDF("value")).count()
      assert(count === n, s"n=$n extraNuls=$extraNuls")
    }
  }

  test("P6: raw echo is the identity on framed documents") {
    import spark.implicits._
    val framed = TransisXml.frame(Seq(streamPayload).toDF("value"))
    val raw = TransisXml.rawEcho(framed).as[String].collect()
    assert(raw.toSet === framed.as[String].collect().toSet)
    assert(raw.exists(_.contains("DetectorCountMessage")))
  }

  test("P6: pretty-print is deterministic, indented, and content-preserving") {
    import spark.implicits._
    val framed = TransisXml.frame(Seq(singleSiteDoc + NUL).toDF("value"))
    val p1 = TransisXml.prettyPrint(framed).as[String].collect().head
    val p2 = TransisXml.prettyPrint(framed).as[String].collect().head
    assert(p1 === p2) // deterministic
    assert(p1.linesIterator.exists(_.startsWith("   <")), p1.take(300))
    // content survives the round trip: same elements and attributes
    for (tok <- Seq("DetectorCountMessage", "Sid=\"2087\"", "Did=\"21\"",
      "count=\"5\"", "reg=\"ROZ\""))
      assert(p1.contains(tok), s"missing $tok in:\n${p1.take(400)}")
  }

  test("malformed XML fragments drop cleanly — the job never fails") {
    // A corrupt frame (connection garbage, truncated tag soup) parses to
    // a null doc under from_xml's permissive mode; every downstream gate
    // (error route, truthiness gate, topology flatten) must DROP it —
    // not crash the batch, not surface a phantom record. Valid docs in
    // the same payload still come through intact.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val garbage = Seq("<not-closed", "%PDF-1.4 binary junk ",
      "<TransisResponse><Broken></TransisResponse").mkString(NUL)
    val payload = singleSiteDoc + NUL + garbage + NUL + errorDoc + NUL
    val framed = TransisXml.frame(Seq(payload).toDF("value"))
    assert(framed.count() === 5) // 3 garbage + 2 real frames
    val parsed = TransisXml.parse(framed, graft.model.Schemas.transisResponse)
    // truthiness gate: only the real detector-count doc survives
    val records = graft.ops.DetectorCounts.toRecords(
      TransisXml.detectorCountDocs(parsed))
    assert(records.select(col("siteId")).as[String].collect().toSeq
      === Seq("2087"))
    // error route: exactly the real error doc, no garbage phantom
    val errs = TransisXml.errorDocs(parsed).as[String].collect()
    assert(errs.toSeq === Seq("Transis unavailable"))
  }
}
