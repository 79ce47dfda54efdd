package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.ReferenceFixtures._
import graft.sources.TypedHistory

/** S5–S8 typed history readers: reader semantics over the partitioned
  * lake layout, and plan-level proof that the type/date selectors resolve
  * to partition pruning (the at-rest equivalent of the reference's URL
  * params, transis_consumer.py:157-225). */
class TypedHistorySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-typed").toString
    val monitors = TypedHistory
      .monitorRecords(spark, Seq(strategicMonitorDoc), "StrategicMonitor")
      .unionAll(TypedHistory.monitorRecords(spark, Seq(motorwayDoc), "Motorway"))
      .unionAll(TypedHistory.monitorRecords(spark, Seq(siteAlarmDoc), "SiteAlarm"))
    TypedHistory.writeMonitors(monitors, d)
    TypedHistory.writeTirf(TypedHistory.tirfRecords(spark, Seq(tirfDoc)), d)
    TypedHistory.writeVms(TypedHistory.vmsRecords(spark, Seq(vmsDoc)), d)
    TypedHistory.writeTopologyChanges(
      TypedHistory.topologyChangeRecords(spark, Seq(topologyChangesDoc)), d)
    d
  }

  test("S5: typed readers apply type + date selectors as partition filters") {
    val sm = TypedHistory.strategicMonitorFrom(spark, dir, "2019-10-20")
    assert(sm.collect().map(_.getString(1)).toSeq === Seq("SM-2"))
    val plan = sm.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // both selectors are directory-level, not late row filters
    assert(!plan.contains("PushedFilters: [IsNotNull(doc_type)"), plan.take(800))
    // the two sibling types stay untouched by the same layout
    assert(TypedHistory.motorwayFrom(spark, dir, "2019-10-19")
      .collect().map(_.getString(1)).sorted.toSeq === Seq("MW-1", "MW-2"))
    assert(TypedHistory.siteAlarmFrom(spark, dir, "2019-10-22")
      .collect().map(_.getString(4)).toSeq === Seq("HIGH"))
  }

  test("S6: open snapshot vs closed-since-date semantics") {
    assert(TypedHistory.openTirf(spark, dir)
      .collect().map(_.getString(0)).sorted.toSeq === Seq("T-1", "T-2"))
    // closed-before-cutoff T-3 excluded; open records never appear
    assert(TypedHistory.closedTirfFrom(spark, dir, "2019-10-20")
      .collect().map(_.getString(0)).toSeq === Seq("T-4"))
    // closedDate is genuinely absent (null) on open incidents
    assert(TypedHistory.openTirf(spark, dir)
      .filter(col("closedDate").isNull).count() === 2)
  }

  test("S7: current VMS state is the latest update per sign") {
    val rows = TypedHistory.allVms(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(rows === Map(
      "V-1" -> "CRASH NEAR EXIT 5",
      "V-2" -> "40 KM ZONE"))
  }

  test("S8: change table returns deltas at-or-after the bound, pruned") {
    val ch = TypedHistory.topologyChangesFrom(spark, dir, "2019-10-20")
    assert(ch.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      === Seq(("200", "ADD"), ("8", "REMOVE")))
    assert(ch.queryExecution.executedPlan.toString
      .contains("PartitionFilters"))
  }
}
