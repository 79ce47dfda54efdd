package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.CountMin
import graft.stream.{Pipeline, StreamingCountMin}

/** Streaming Count-Min maintenance: the persisted sketch after N
  * micro-batches must be BYTE-IDENTICAL to one batch build over the
  * same rows (the linear-sketch property that makes the stream shape
  * trivial), replays must be no-ops, and the published bytes must serve
  * point estimates. */
class StreamingCountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def batchSketch(rows: Seq[String], depth: Int, width: Int) = {
    import spark.implicits._
    rows.toDF("w")
      .agg(CountMin.cms_build(xxhash64(col("w")), depth, width).as("cms"))
      .head.getAs[Array[Byte]]("cms")
  }

  private def estimate(sketch: Array[Byte], v: String): Long = {
    import spark.implicits._
    Seq(v).toDF("w")
      .select(CountMin.cms_estimate(lit(sketch), xxhash64(col("w")))
        .as("est"))
      .head.getLong(0)
  }

  test("stream-built sketch is byte-identical to a batch build over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-cms-state").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cms-ck").toString
    val input = MemoryStream[String]
    val q = StreamingCountMin.sketchStream(
      input.toDF().toDF("w"), xxhash64(col("w")), statePath, ckpt,
      depth = 4, width = 256)
    val b0 = Seq("a", "b", "a")
    val b1 = Seq("c", "a", "b")
    val b2 = Seq("d")
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingCountMin.loadSketch(spark, statePath).get
    val batched = batchSketch(b0 ++ b1 ++ b2, 4, 256)
    assert(java.util.Arrays.equals(streamed, batched),
      "linear merge must reproduce the single-build bytes exactly")
    // and the published bytes serve: with this tiny domain the
    // estimates are exact
    assert(estimate(streamed, "a") === 3L)
    assert(estimate(streamed, "b") === 2L)
    assert(estimate(streamed, "d") === 1L)
  }

  test("crash-replayed batch is a no-op; new incarnations keep counting") {
    import spark.implicits._
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-cms-replay").toString
    val docs = Seq("x", "x", "y").toDF("w")
    StreamingCountMin.sketchBatch(docs, 0L, xxhash64(col("w")),
      statePath, tag = "t1", depth = 4, width = 256)
    val once = StreamingCountMin.loadSketch(spark, statePath).get
    assert(estimate(once, "x") === 2L)
    // replay (same tag, same id): state file already records it → no-op
    StreamingCountMin.sketchBatch(docs, 0L, xxhash64(col("w")),
      statePath, tag = "t1", depth = 4, width = 256)
    assert(java.util.Arrays.equals(
      StreamingCountMin.loadSketch(spark, statePath).get, once))
    // late replay of a SUPERSEDED id: also a no-op
    StreamingCountMin.sketchBatch(docs, 1L, xxhash64(col("w")),
      statePath, tag = "t1", depth = 4, width = 256)
    StreamingCountMin.sketchBatch(docs, 0L, xxhash64(col("w")),
      statePath, tag = "t1", depth = 4, width = 256)
    assert(estimate(
      StreamingCountMin.loadSketch(spark, statePath).get, "x") === 4L)
    // a new incarnation (fresh checkpoint → new tag, ids restart) is
    // NEW data and must fold in
    StreamingCountMin.sketchBatch(docs, 0L, xxhash64(col("w")),
      statePath, tag = "t2", depth = 4, width = 256)
    assert(estimate(
      StreamingCountMin.loadSketch(spark, statePath).get, "x") === 6L)
  }

  test("mergeBytes rejects shape mismatches loudly") {
    val a = batchSketch(Seq("a"), 4, 256)
    val b = batchSketch(Seq("a"), 4, 128)
    intercept[IllegalArgumentException] {
      CountMin.mergeBytes(a, b)
    }
    // tag derivation sanity: distinct checkpoints → distinct tags
    assert(Pipeline.streamTagOf("/ck/one") !== Pipeline.streamTagOf("/ck/two"))
  }
}
