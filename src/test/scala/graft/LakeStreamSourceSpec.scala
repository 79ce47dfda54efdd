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
