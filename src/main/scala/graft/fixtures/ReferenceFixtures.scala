package graft.fixtures

/** XML fixtures modeled on the reference's test inputs (FIXTURES.md §A;
  * reference `tests.py:19-20,59-60,70`). Shared by the ScalaTest suites and
  * the embedded-fixture queries in graft.queries.XmlQueries, so the t2 gate
  * exercises the real parse → project → explode pipeline.
  */
object ReferenceFixtures {

  val NUL = "\u0000"

  /** A.1: single-site detector-count document (subset of the 24-detector
    * fixture, plus one attribute-less detector to exercise the T4 guard). */
  val singleSiteDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <DetectorCountMessages>
      |    <ns2:DetectorCountMessage Sid="2087" date="2019-10-03T15:43:00+10:00" reg="ROZ">
      |      <Detectors>
      |        <Detector Did="21" count="5"/>
      |        <Detector Did="20" count="6"/>
      |        <Detector Did="18" count="12"/>
      |        <Detector Did="6" count="1"/>
      |        <Detector Did="99"/>
      |      </Detectors>
      |    </ns2:DetectorCountMessage>
      |  </DetectorCountMessages>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.3: one document, two sites (Sid 2087 and 8), later period. */
  val multiSiteDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <DetectorCountMessages>
      |    <ns2:DetectorCountMessage Sid="2087" date="2019-10-03T15:48:00+10:00" reg="ROZ">
      |      <Detectors>
      |        <Detector Did="1" count="0"/>
      |        <Detector Did="2" count="3"/>
      |      </Detectors>
      |    </ns2:DetectorCountMessage>
      |    <ns2:DetectorCountMessage Sid="8" date="2019-10-03T15:48:00+10:00" reg="SYD">
      |      <Detectors>
      |        <Detector Did="5" count="7"/>
      |      </Detectors>
      |    </ns2:DetectorCountMessage>
      |  </DetectorCountMessages>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.4: error document — must be routed out, never projected
    * (reference `transis_response_models.py:312-317`). */
  val errorDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="true" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <Errors><Error msg="Transis unavailable"/></Errors>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** Document whose DetectorCountMessages element is present but empty —
    * ElementTree-falsy in the reference, so treated as absent
    * (SURVEY §2.5 truthiness note). */
  val emptyMessagesDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <DetectorCountMessages></DetectorCountMessages>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.2-style concatenated push-stream payload: 4 documents, each
    * NUL-terminated, with one stray empty fragment (doubled NUL). */
  val streamPayload: String =
    singleSiteDoc + NUL + multiSiteDoc + NUL + NUL + errorDoc + NUL +
      emptyMessagesDoc + NUL

  /** Epoch seconds of the two fixture periods (reference golden record,
    * FIXTURES.md §A.1: 2019-10-03T15:43:00+10:00 → 1570081380). */
  val epoch1543: Long = 1570081380L
  val epoch1548: Long = 1570081680L

  /** A.10: detector-count document dated BEFORE the October fixtures —
    * exists so a `dt >=` source pushdown visibly excludes a same-type
    * document (x07). */
  val oldDetectorDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <DetectorCountMessages>
      |    <ns2:DetectorCountMessage Sid="9999" date="2019-09-30T10:00:00+10:00" reg="OLD">
      |      <Detectors>
      |        <Detector Did="1" count="9"/>
      |      </Detectors>
      |    </ns2:DetectorCountMessage>
      |  </DetectorCountMessages>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.6: typed getFromDate documents (S5 — reference
    * `transis_consumer.py:175-201`). The reference carries these as generic
    * attribute bags (`transis_response_models.py:108-126`), so the attribute
    * set (id/date/reg/value) is this engine's canonical model. Each type
    * has one record before and one after the 2019-10-20 cutoff so the date
    * predicate is observable. */
  val strategicMonitorDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <StrategicMonitors>
      |    <StrategicMonitor id="SM-1" date="2019-10-19T08:00:00.000+11:00" reg="ROZ" value="37"/>
      |    <StrategicMonitor id="SM-2" date="2019-10-21T09:30:00.000+11:00" reg="SYD" value="52"/>
      |  </StrategicMonitors>
      |</ns2:TransisResponse>
      |""".stripMargin

  val motorwayDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <Motorways>
      |    <Motorway id="MW-1" date="2019-10-19T22:05:00.000+11:00" reg="SYD" value="88"/>
      |    <Motorway id="MW-2" date="2019-10-20T16:45:00.000+11:00" reg="SYD" value="95"/>
      |  </Motorways>
      |</ns2:TransisResponse>
      |""".stripMargin

  val siteAlarmDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <SiteAlarms>
      |    <SiteAlarm id="SA-1" date="2019-10-18T23:59:00.000+11:00" reg="ROZ" value="LOW"/>
      |    <SiteAlarm id="SA-2" date="2019-10-22T03:10:00.000+11:00" reg="ROZ" value="HIGH"/>
      |  </SiteAlarms>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.7: TIRF incidents (S6 — reference `transis_consumer.py:203-216`).
    * Two open (no closedDate attribute), two closed — one closed before and
    * one after the 2019-10-20 cutoff. */
  val tirfDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <TIRFs>
      |    <TIRF tirfId="T-1" status="OPEN" siteId="2087" openedDate="2019-10-18T07:00:00.000+11:00"/>
      |    <TIRF tirfId="T-2" status="OPEN" siteId="8" openedDate="2019-10-21T10:00:00.000+11:00"/>
      |    <TIRF tirfId="T-3" status="CLOSED" siteId="100" openedDate="2019-10-15T07:00:00.000+11:00" closedDate="2019-10-19T18:00:00.000+11:00"/>
      |    <TIRF tirfId="T-4" status="CLOSED" siteId="200" openedDate="2019-10-16T07:00:00.000+11:00" closedDate="2019-10-21T11:00:00.000+11:00"/>
      |  </TIRFs>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.8: VMS snapshots (S7 — reference `transis_consumer.py:218-225`).
    * Sign V-1 appears twice (two landed snapshots) so current-state reads
    * must take the latest update per sign. */
  val vmsDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <VMSs>
      |    <VMS vmsId="V-1" location="M4 East" message="CLEAR AHEAD" updatedDate="2019-10-19T06:00:00.000+11:00"/>
      |    <VMS vmsId="V-1" location="M4 East" message="CRASH NEAR EXIT 5" updatedDate="2019-10-21T07:15:00.000+11:00"/>
      |    <VMS vmsId="V-2" location="M1 North" message="40 KM ZONE" updatedDate="2019-10-20T05:00:00.000+11:00"/>
      |  </VMSs>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.9: topology-change deltas (S8 — reference
    * `transis_consumer.py:157-164`), modeled as an append-only change
    * table: one row per (site, op, date). */
  val topologyChangesDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <TopologyChanges>
      |    <TopologyChange sId="100" op="MODIFY" date="2019-10-19T12:00:00.000+11:00"/>
      |    <TopologyChange sId="200" op="ADD" date="2019-10-20T09:00:00.000+11:00"/>
      |    <TopologyChange sId="8" op="REMOVE" date="2019-10-21T14:00:00.000+11:00"/>
      |  </TopologyChanges>
      |</ns2:TransisResponse>
      |""".stripMargin

  /** A.5: topology document covering empty-collection drop semantics and the
    * phases double-unnest. Site 200 has an empty Arms collection and no
    * Phases element. */
  val topologyDoc: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
      |  <SiteLayouts>
      |    <SiteLayout sId="100" region="R1">
      |      <Arms>
      |        <Arm aId="1" name="North"/>
      |        <Arm aId="2" name="South"/>
      |      </Arms>
      |      <Detectors>
      |        <Detector Did="11" count="0"/>
      |      </Detectors>
      |      <Streets>
      |        <Street stId="7" name="Main St"/>
      |      </Streets>
      |      <SGs>
      |        <SG sgId="1" type="vehicle"/>
      |        <SG sgId="2" type="pedestrian"/>
      |      </SGs>
      |      <Phases>
      |        <Phase name="A"><SGNos><SGNo>1</SGNo><SGNo>2</SGNo></SGNos></Phase>
      |        <Phase name="B"><SGNos><SGNo>3</SGNo></SGNos></Phase>
      |      </Phases>
      |    </SiteLayout>
      |    <SiteLayout sId="200" region="R2">
      |      <Arms></Arms>
      |    </SiteLayout>
      |    <SiteLayout sId="2087" region="TR-A"></SiteLayout>
      |    <SiteLayout sId="8" region="TR-B"></SiteLayout>
      |  </SiteLayouts>
      |</ns2:TransisResponse>
      |""".stripMargin
}
