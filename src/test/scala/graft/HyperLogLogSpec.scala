package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog.hll_distinct

/** HLL sketch: accuracy envelope vs exact distinct counts, partial-agg
  * merge path, and grouped usage. */
class HyperLogLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def relErr(est: Long, exact: Long): Double =
    math.abs(est.toDouble - exact) / exact

  test("estimate within 5% of exact on documents and lineitem keys") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .repartition(8) // force the serialize/merge partial-agg path
    val exactDocs = docs.select(countDistinct(col("text"))).head().getLong(0)
    val estDocs = docs.select(hll_distinct(col("text"))).head().getLong(0)
    assert(relErr(estDocs, exactDocs) < 0.05, s"$estDocs vs $exactDocs")

    val li = Tables.lineitem(spark, "/root/testdata/sf0.01").repartition(8)
    val exactParts = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val estParts = li.select(hll_distinct(col("l_partkey"))).head().getLong(0)
    assert(relErr(estParts, exactParts) < 0.05, s"$estParts vs $exactParts")
  }

  test("grouped sketches: one estimate per group, sane envelope") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").repartition(8)
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(hll_distinct(col("l_orderkey")).as("est"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(grouped.nonEmpty)
    grouped.foreach { r =>
      assert(relErr(r.getAs[Long]("est"), r.getAs[Long]("exact")) < 0.08,
        r.toString)
    }
  }

  test("sliding-window HLL in a streaming aggregation equals the batch image") {
    // e15's streaming variant: window(ts, 10 min, 5 min) + the HLL
    // sketch as streaming aggregation state — partial sketches must
    // merge across micro-batches to the same estimates one batch pass
    // produces (the deterministic fixed-seed sketch makes this exact
    // equality, not an envelope)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 60).map(i => ((i * 61).toLong, s"u${i % 9}"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", expr("timestamp_seconds(sec)"))
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(hll_distinct(col("user")).as("n_users"))
      .select(unix_timestamp(col("window.start")).as("w_start"),
        col("n_users"))
    val input = MemoryStream[(Long, String)]
    val q = agg(input.toDF().toDF("sec", "user"))
      .writeStream.format("memory").queryName("hll_win")
      .outputMode("complete").start()
    try {
      // two micro-batches so window state holds PARTIAL sketches that
      // must merge, not single-batch builds
      input.addData(rows.take(30): _*); q.processAllAvailable()
      input.addData(rows.drop(30): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_win").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batched = agg(rows.toDF("sec", "user")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batched)
    assert(streamed.nonEmpty && streamed.keySet.size > 2)
  }

  test("determinism: same input → same estimate (fixed hash seed)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.select(hll_distinct(col("text"))).head().getLong(0)
    val b = docs.repartition(16).select(hll_distinct(col("text")))
      .head().getLong(0)
    assert(a === b) // register-wise max is order/partitioning-insensitive
  }
}
