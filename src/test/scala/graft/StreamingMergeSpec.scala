package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.{FileManifest, History}
import graft.stream.{Pipeline, StreamingMerge}

/** Streaming keyed upsert: per-batch CDC apply onto the manifest lake —
  * seq-folded latest-per-key, ledger-skipped replays, and idempotent
  * re-application when the crash lands between flip and mark. */
class StreamingMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshLake(): String = {
    import spark.implicits._
    val lake = java.nio.file.Files
      .createTempDirectory("graft-stream-merge").toString + "/lake"
    Seq((1L, "a", "v1", 0L), (2L, "a", "v2", 0L), (3L, "b", "v3", 0L))
      .toDF("id", "part", "v", "seq")
      .coalesce(1).write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    lake
  }

  private def img(lake: String): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    History.readPinned(spark, lake)
      .select("id", "part", "v", "seq")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
  }

  private def version(lake: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    FileManifest.latest(fs, lake).get.version
  }

  test("seq-folded batch applies once; ledger skips replay; re-apply idempotent") {
    import spark.implicits._
    val lake = freshLake()
    val ledger = new Pipeline.InMemoryBatchLedger
    // CDC batch with TWO versions of key 1 — seq 9 must win — plus an
    // insert; key-duplicate would be rejected without the seq fold
    val batch = Seq(
      (1L, "a", "v1-seq5", 5L), (1L, "a", "v1-seq9", 9L),
      (7L, "c", "v7", 1L)).toDF("id", "part", "v", "seq")
    assert(StreamingMerge.mergeBatch(batch, 0L, lake, Seq("id"),
      Some("seq"), Some(ledger)))
    val applied = Seq(
      (1L, "a", "v1-seq9", 9L), (2L, "a", "v2", 0L),
      (3L, "b", "v3", 0L), (7L, "c", "v7", 1L))
    assert(img(lake) === applied)
    val v1 = version(lake)

    // restart replay with the ledger mark present: skipped, no new version
    assert(!StreamingMerge.mergeBatch(batch, 0L, lake, Seq("id"),
      Some("seq"), Some(ledger)))
    assert(img(lake) === applied)
    assert(version(lake) === v1)

    // crash BETWEEN manifest flip and ledger mark: the replay re-applies
    // — same rows (idempotent upsert), one extra manifest version
    assert(StreamingMerge.mergeBatch(batch, 0L, lake, Seq("id"),
      Some("seq"), None))
    assert(img(lake) === applied)
    assert(version(lake) === v1 + 1)
  }

  test("merge stream applies batches in order end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lake = freshLake()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-merge-ck").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val q = StreamingMerge.mergeStream(
      input.toDF().toDF("id", "part", "v", "seq"),
      lake, Seq("id"), ckpt, seqCol = Some("seq"),
      ledger = Some(new Pipeline.InMemoryBatchLedger))
    try {
      input.addData((2L, "a", "v2x", 1L), (9L, "d", "v9", 1L))
      q.processAllAvailable()
      assert(img(lake) === Seq(
        (1L, "a", "v1", 0L), (2L, "a", "v2x", 1L),
        (3L, "b", "v3", 0L), (9L, "d", "v9", 1L)))
      // a later batch supersedes the earlier one's row
      input.addData((9L, "d", "v9-final", 2L))
      q.processAllAvailable()
      assert(img(lake) === Seq(
        (1L, "a", "v1", 0L), (2L, "a", "v2x", 1L),
        (3L, "b", "v3", 0L), (9L, "d", "v9-final", 2L)))
    } finally q.stop()
  }

  test("latestPerKey: exact seq ties break deterministically, no seq passes through") {
    import spark.implicits._
    val tied = Seq((1L, "x", "b", 3L), (1L, "x", "a", 3L))
      .toDF("id", "part", "v", "seq")
    val won = StreamingMerge.latestPerKey(tied, Seq("id"), Some("seq"))
      .as[(Long, String, String, Long)].collect()
    assert(won.toSeq === Seq((1L, "x", "b", 3L))) // max struct: "b" > "a"
    val asIs = StreamingMerge.latestPerKey(tied, Seq("id"), None)
    assert(asIs.collect().length === 2)
  }
}
