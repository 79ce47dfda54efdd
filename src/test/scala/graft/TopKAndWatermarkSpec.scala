package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TopKAggregator}
import graft.fixtures.ReferenceFixtures.NUL
import graft.stream.{Pipeline, WindowedAnalytics}

class TopKAndWatermarkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("typed TopK aggregator ≡ window row_number top-k on real embeddings") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    // window-based reference result (same path as the s01 gate query)
    val viaWindow = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "b_id", "cos_r")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // aggregator-based result: bounded buffer per group
    val scored = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", Int.MaxValue)
      .select(col("query_id"), col("b_id"), col("cos_r"))
    val topk = new TopKAggregator.TopK(3)
    val viaAgg = scored
      .map(r => (r.getLong(0), TopKAggregator.Scored(r.getLong(1), r.getDouble(2))))
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topk.toColumn)
      .collect()
      .flatMap { case (q, best) => best.map(s => (q, s.id)) }.toSet
    assert(viaAgg === viaWindow)
  }

  private def doc(sid: String, iso: String): String =
    s"""<ns2:TransisResponse error="false" xmlns:ns2="http://model.transis.rta.nsw.gov.au/">
       |  <DetectorCountMessages>
       |    <ns2:DetectorCountMessage Sid="$sid" date="$iso" reg="ROZ">
       |      <Detectors><Detector Did="1" count="9"/></Detectors>
       |    </ns2:DetectorCountMessage>
       |  </DetectorCountMessages>
       |</ns2:TransisResponse>""".stripMargin

  test("§2.9: append-mode watermark finalizes windows and drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = WindowedAnalytics.regionVolumes(
      Pipeline.payloadToRecords(input.toDF()))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_volumes").start()
    try {
      // event time = date - 180s → 15:43 doc lands in the 15:40 window
      input.addData(doc("1", "2019-10-03T15:43:00+10:00") + NUL)
      q.processAllAvailable()
      // watermark still at epoch-min: nothing finalized yet
      assert(spark.table("wm_volumes").count() === 0)
      // jump event time ~1h → watermark passes 15:45, window finalizes
      input.addData(doc("1", "2019-10-03T16:43:00+10:00") + NUL)
      q.processAllAvailable()
      assert(spark.table("wm_volumes").count() === 1)
      // a record 1h behind the watermark is late → dropped, no new output
      input.addData(doc("2", "2019-10-03T15:44:00+10:00") + NUL)
      q.processAllAvailable()
      val rows = spark.table("wm_volumes")
        .select("region", "total_count").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq === Seq(("ROZ", 9L))) // late site-2 doc never appears
    } finally q.stop()
  }

  test("§2.9: e09's session_window expression runs under streaming with a watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, epoch-micros)
    val sessions = input.toDS().toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("t"))
      .withWatermark("t", "1 minute")
      .groupBy(col("user_id"), session_window(col("t"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      val h = 3600L * 1000 * 1000 // 1h in micros
      input.addData((1L, 10 * h), (1L, 10 * h + h / 2)) // one session, 2 events
      q.processAllAvailable()
      assert(spark.table("stream_sessions").count() === 0) // not finalized
      input.addData((1L, 30 * h)) // >6h gap → new session; watermark jumps
      q.processAllAvailable()
      val rows = spark.table("stream_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // the first session (2 merged events) finalized once the watermark
      // passed its end; the 30h session is still open
      assert(rows.toSeq === Seq((1L, 10 * h, 2L)), rows.mkString(";"))
    } finally q.stop()
  }
}
