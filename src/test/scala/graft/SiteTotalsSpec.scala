package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.fixtures.ReferenceFixtures._
import graft.stream.{Pipeline, SiteTotals}

/** transformWithState (Spark 4 arbitrary-state API, RocksDB-backed):
  * per-site running totals accumulate across micro-batches. */
class SiteTotalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("running site totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String]
      val updates = SiteTotals.run(Pipeline.payloadToRecords(input.toDF()))
      val q = updates.toDF().writeStream.outputMode("update")
        .format("memory").queryName("site_totals").start()
      try {
        // batch 1: site 2087 counts 5+6+12+1 = 24
        input.addData(singleSiteDoc + NUL)
        q.processAllAvailable()
        val b1 = spark.table("site_totals").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
        assert(b1 === Set(("2087", 24L, 1)))
        // batch 2: site 2087 adds 0+3 (running 27), site 8 starts at 7
        input.addData(multiSiteDoc + NUL)
        q.processAllAvailable()
        val latest = spark.table("site_totals")
          .groupBy($"siteId")
          .agg(org.apache.spark.sql.functions.max($"totalCount").as("t"),
            org.apache.spark.sql.functions.max($"batchesSeen").as("b"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
        assert(latest === Set(("2087", 27L, 2), ("8", 7L, 1)))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf
        .set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf
        .unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
