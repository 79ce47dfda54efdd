package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** The `graft-lake` streaming source
  * ([[graft.sources.GraftLakeStreamProvider]]): `readStream
  * .format("graft-lake").load(path)` tails a manifest lake's change
  * feed with manifest versions as offsets — checkpointed exactly-once
  * resume, DV takedowns as delete images, startingVersion baselining,
  * loud failure when the baseline was vacuumed. */
class LakeStreamSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/x"

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Unpartitioned manifest lake with ids 1..4. */
  private def docsLake(): String = {
    import spark.implicits._
    val dir = fresh("graft-lss-lake")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("doc_id", "n_chars")
      .repartition(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def runOnce(lake: String, ckpt: String,
      seen: java.util.concurrent.ConcurrentLinkedQueue[(Long, String)],
      startingVersion: Option[String] = None): Unit = {
    val reader = spark.readStream.format("graft-lake")
    startingVersion.foreach(v => reader.option("startingVersion", v): Unit)
    reader.load(lake).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("doc_id", "_change").collect()
          .foreach(r => seen.add((r.getLong(0), r.getString(1))): Unit)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000L): Unit
  }

  test("the stream resolves the lake schema and tails commits with " +
      "exactly-once checkpointed resume") {
    import scala.jdk.CollectionConverters._
    val lake = docsLake()
    val ckpt = fresh("graft-lss-ckpt")
    val df = spark.readStream.format("graft-lake").load(lake)
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("doc_id", "n_chars", "_change"))
    // default baseline = latest at FIRST start: the pre-existing rows
    // are not replayed, and the (empty) batch 0 checkpoints the
    // baseline offset — so commits landing between runs are never lost
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    runOnce(lake, ckpt, seen)
    assert(seen.asScala.isEmpty, "nothing to replay at baseline")
    History.deleteWhere(spark, lake, col("doc_id") === 1L): Unit
    runOnce(lake, ckpt, seen)
    assert(seen.asScala.toSeq.sorted === Seq((1L, "delete")))
    // a MERGE-ON-READ takedown (DV commit) between runs: the RESUMED
    // stream (same checkpoint) must deliver only the new window
    History.deleteKeysDV(spark, lake, "doc_id", Seq(3L)): Unit
    runOnce(lake, ckpt, seen)
    assert(seen.asScala.toSeq.sorted ===
      Seq((1L, "delete"), (3L, "delete")),
      "the resumed stream must deliver the new commits exactly once")
    // an idle resume (no new commits) delivers nothing
    runOnce(lake, ckpt, seen)
    assert(seen.asScala.size === 2)
  }

  test("startingVersion baselines an initial-snapshot follow; appends " +
      "arrive as inserts") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val lake = docsLake()
    History.append(spark, lake,
      Seq((5L, 50L)).toDF("doc_id", "n_chars"), key = "a5"): Unit
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    // startingVersion is INCLUSIVE: `1` replays v1's full snapshot as
    // inserts (diff from the synthetic empty manifest before v1 — the
    // bootstrap rows live nowhere but v1's own commit) and then the
    // v2 append, all in the first window
    runOnce(lake, fresh("graft-lss-ckpt2"), seen,
      startingVersion = Some("1"))
    assert(seen.asScala.toSeq.sorted ===
      Seq((1L, "insert"), (2L, "insert"), (3L, "insert"),
        (4L, "insert"), (5L, "insert")))
    // startingVersion = 2 delivers FROM v2's changes on (diff v1..v2):
    // the bootstrap snapshot is excluded, the append included
    val seen2 =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    runOnce(lake, fresh("graft-lss-ckpt2b"), seen2,
      startingVersion = Some("2"))
    assert(seen2.asScala.toSeq.sorted === Seq((5L, "insert")))
    // startingVersion < 1 refuses: manifests start at v1
    val e = intercept[Exception] {
      runOnce(lake, fresh("graft-lss-ckpt2c"), seen2,
        startingVersion = Some("0"))
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(chain(e).contains("must be >= 1"), chain(e))
  }

  test("startingTimestamp baselines at the newest version committed " +
      "at or before the instant") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val lake = docsLake() // v1 committed now
    History.append(spark, lake,
      Seq((5L, 50L)).toDF("doc_id", "n_chars"), key = "a5"): Unit // v2
    // a timestamp far in the future resolves to the LATEST version —
    // nothing replays; one far in the past refuses loudly
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    runOnce2(lake, fresh("graft-lss-ts-ckpt"), seen,
      startingTimestamp = Some(String.valueOf(
        System.currentTimeMillis() + 3600000L)))
    assert(seen.asScala.isEmpty)
    val e = intercept[Exception] {
      runOnce2(lake, fresh("graft-lss-ts-ckpt2"), seen,
        startingTimestamp = Some("1000"))
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(chain(e).contains("no version"), chain(e))
    // both options together refuse
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-lake")
        .option("startingVersion", "1")
        .option("startingTimestamp", "1000")
        .load(lake)
    }
    assert(chain(e2).contains("not both"), chain(e2))
  }

  private def runOnce2(lake: String, ckpt: String,
      seen: java.util.concurrent.ConcurrentLinkedQueue[(Long, String)],
      startingTimestamp: Option[String]): Unit = {
    val reader = spark.readStream.format("graft-lake")
    startingTimestamp.foreach(t =>
      reader.option("startingTimestamp", t): Unit)
    reader.load(lake).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("doc_id", "_change").collect()
          .foreach(r => seen.add((r.getLong(0), r.getString(1))): Unit)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000L): Unit
  }

  test("a vacuumed baseline fails loudly instead of re-baselining") {
    import spark.implicits._
    val lake = docsLake()
    val ckpt = fresh("graft-lss-ckpt3")
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    runOnce(lake, ckpt, seen) // checkpoint at v1
    History.append(spark, lake,
      Seq((6L, 60L)).toDF("doc_id", "n_chars"), key = "a6"): Unit
    History.append(spark, lake,
      Seq((7L, 70L)).toDF("doc_id", "n_chars"), key = "a7"): Unit
    // expire v1 from retention (grace 0): the checkpointed window's
    // `from` is gone — the resume must fail loudly, never silently
    // replay the whole lake as inserts
    History.vacuum(spark, lake, graceMs = 0L): Unit
    assert(!FileManifest.versions(fs(lake), lake).contains(1L))
    val e = intercept[Exception] {
      runOnce(lake, ckpt, seen)
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(chain(e).contains("not retained"), chain(e))
  }

  test("writeStream.format(graft-lake): readStream -> transform -> " +
      "writeStream closes the loop with exactly-once resume") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.lake",
      classOf[graft.sources.LakeCatalog].getName)
    val src = docsLake()
    val dst = fresh("graft-lss-sinklake")
    spark.sql(s"""CREATE TABLE lake.`$dst`
                  (doc_id BIGINT, n_chars BIGINT) USING parquet""")
    val ckpt = fresh("graft-lss-sinkckpt")
    def runLoop(): Unit =
      spark.readStream.format("graft-lake")
        .option("startingVersion", "1").load(src)
        .filter(col("_change") === "insert")
        .withColumn("n_chars", col("n_chars") + 1L)
        .select("doc_id", "n_chars")
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst).awaitTermination(60000L): Unit
    runLoop()
    def dstRows(): Seq[(Long, Long)] =
      spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dst`")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(dstRows() === Seq((1L, 11L), (2L, 21L), (3L, 31L), (4L, 41L)))
    // an idle resume adds nothing; a new source commit adds exactly it
    runLoop()
    assert(dstRows().size === 4, "idle resume must not duplicate")
    History.append(spark, src,
      Seq((5L, 50L)).toDF("doc_id", "n_chars"), key = "sink-a5"): Unit
    runLoop()
    assert(dstRows() === Seq((1L, 11L), (2L, 21L), (3L, 31L), (4L, 41L),
      (5L, 51L)))
  }

  test("the sink's crash-window replays converge to one copy at every " +
      "crash point") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.lake",
      classOf[graft.sources.LakeCatalog].getName)
    val dst = fresh("graft-lss-crashlake")
    spark.sql(s"""CREATE TABLE lake.`$dst`
                  (doc_id BIGINT, n_chars BIGINT) USING parquet""")
    val ckpt = fresh("graft-lss-crashckpt")
    val provider = new graft.sources.GraftLakeStreamProvider
    val sink = provider.createSink(spark.sqlContext,
      Map("path" -> dst, "checkpointLocation" -> ckpt), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
    def count(): Long =
      spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dst`")
        .collect()(0).getLong(0)
    // crash BETWEEN sink output and checkpoint commit: Spark re-runs
    // the batch with the same id — the ledger mark makes it a no-op
    sink.addBatch(0L, batch)
    assert(count() === 2L)
    sink.addBatch(0L, batch)
    assert(count() === 2L, "ledger-guarded replay must not duplicate")
    // crash BETWEEN manifest add and ledger mark: simulate by running
    // the keyed append directly (the state addBatch leaves at that
    // crash point), then replaying the batch through the sink — the
    // manifest already references the tagged files, so the replay
    // must skip to the ledger mark, never re-publish
    val tag = graft.stream.Pipeline.streamTagOf(ckpt)
    History.append(spark, dst,
      Seq((3L, 30L)).toDF("doc_id", "n_chars"), key = s"$tag-1"): Unit
    assert(count() === 3L)
    sink.addBatch(1L,
      Seq((3L, 30L)).toDF("doc_id", "n_chars"))
    assert(count() === 3L,
      "a batch already in the manifest must not re-publish")
    // and the ledger mark landed: the NEXT replay short-circuits
    sink.addBatch(1L, Seq((99L, 0L)).toDF("doc_id", "n_chars"))
    assert(count() === 3L)
  }

  test("sink refusals: output mode, partitionBy, missing checkpoint, " +
      "non-manifest target") {
    import spark.implicits._
    val provider = new graft.sources.GraftLakeStreamProvider
    val ok = Map("path" -> fresh("graft-lss-ref"),
      "checkpointLocation" -> fresh("graft-lss-refck"))
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, ok, Nil,
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }: Unit
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, ok, Seq("lang"),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }: Unit
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, Map("path" -> "/tmp/x"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }: Unit
    // a non-manifest directory refuses at the first batch, loudly
    val bare = fresh("graft-lss-bare")
    val sink = provider.createSink(spark.sqlContext,
      Map("path" -> bare, "checkpointLocation" -> ok("checkpointLocation")),
      Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    val e = intercept[IllegalStateException] {
      sink.addBatch(0L, Seq((1L, 1L)).toDF("doc_id", "n_chars"))
    }
    assert(e.getMessage.contains("manifest"), e.getMessage)
  }

  test("SQL-only consumers reach the format by name (DataSourceRegister)") {
    val lake = docsLake()
    // the shortName resolves through META-INF/services — the exact
    // path a pyspark session uses
    val df = spark.readStream.format("graft-lake").load(lake)
    assert(df.schema.fieldNames.last === "_change")
    // a user-supplied schema refuses: the lake declares the shape
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-lake")
        .schema(df.schema).load(lake)
    }
  }
}
