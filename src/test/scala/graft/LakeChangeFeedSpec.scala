package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}
import graft.stream.LakeChangeFeed

/** Change-feed delivery ticks: exactly-once net-diff publication whose
  * progress state IS the output (no ledger), crash-safe at both sides
  * of the rename, streamable by a vanilla file source. */
class LakeChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/x"

  private def docsLake(): String = {
    import spark.implicits._
    val lake = fresh("graft-cdf-lake")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("doc_id", "n_chars")
      .coalesce(2).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    lake
  }

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def feedRows(outDir: String): Seq[(Long, String)] = {
    val dirs = fs(outDir).listStatus(new org.apache.hadoop.fs.Path(outDir))
      .filter(_.getPath.getName.startsWith("changes-"))
      .map(_.getPath.toString)
    if (dirs.isEmpty) Seq.empty
    else spark.read.parquet(dirs.toIndexedSeq: _*)
      .select("doc_id", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  test("the diff shuffles hashes, not full-width rows") {
    // changesBetween's multiset diff projects each side to
    // (xxhash64(row), count) before shuffling; only rows whose hash
    // delta is nonzero carry their full image to the output. The plan
    // must show the hash aggregation and NO exceptAll machinery
    // (ReplicateRows / sum-of-flags), whose four full-width shuffles
    // would be 2x the rewritten bytes on a wide table.
    val lake = docsLake()
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val f = fs(lake)
    val vs = FileManifest.versions(f, lake)
    val feed = History.changesBetween(spark, lake, vs.head, vs.last)
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), plan.take(1200))
    assert(!plan.contains("ReplicateRows"), plan.take(1200))
    // and the answer is still the exact multiset delta
    assert(feed.select("doc_id", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "delete")))
  }

  test("null-swapped rows do not cancel out of the diff") {
    // Spark hash expressions skip null fields, so a naive row hash
    // folds (a=null, b="x") and (a="x", b=null) to the same value —
    // an update that swaps which nullable column holds the value would
    // cancel out of the feed. The hash must include the null mask.
    import spark.implicits._
    val lake = fresh("graft-cdf-nullswap")
    Seq((1L, Option.empty[String], Option("x")),
        (2L, Option("keep"), Option("keep2")))
      .toDF("doc_id", "a", "b")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val f = fs(lake)
    val v0 = FileManifest.latestVersion(f, lake).get
    // swap row 1's null pattern via a keyed merge
    History.mergeInto(spark, lake,
      Seq((1L, Option("x"), Option.empty[String])).toDF("doc_id", "a", "b"),
      Seq("doc_id")): Unit
    val v1 = FileManifest.latestVersion(f, lake).get
    val feed = History.changesBetween(spark, lake, v0, v1)
      .select("doc_id", "a", "b", "_change").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(3))).toSeq.sortBy(_._4)
    assert(feed === Seq(
      (1L, None, Some("x"), "delete"),
      (1L, Some("x"), None, "insert")).sortBy(_._4),
      s"null-swapped update must appear as delete+insert, got $feed")
  }

  test("a maintenance tick refreshes exactly the delivered range's files") {
    import graft.sources.FileBloomIndex
    val lake = docsLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    History.refreshStats(spark, lake, "n_chars"): Unit
    val out = fresh("graft-cdf-maint")
    LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      statsCols = Seq("n_chars"), keyCols = Seq("doc_id")): Unit // baseline

    // a takedown rewrites one file; the next tick delivers the range
    // AND indexes exactly the rewritten file — derived from the
    // version diff, never from listing the lake
    val f = fs(lake)
    val v0 = FileManifest.latestVersion(f, lake).get
    History.deleteKeys(spark, lake, "doc_id", Seq(2L)): Unit
    val v1 = FileManifest.latestVersion(f, lake).get
    val added = History.filesAddedBetween(spark, lake, v0, v1)
    assert(added.nonEmpty)

    val wBefore = FileBloomIndex.shardWrites.get()
    val range = LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      statsCols = Seq("n_chars"), keyCols = Seq("doc_id"))
    assert(range === Some((v0, v1)))
    // the key-index refresh touched only the added files' dirs' shards
    assert(FileBloomIndex.shardWrites.get() - wBefore ===
      added.map(FileManifest.entryDir).distinct.size.toLong)
    // every added file is now indexed and statted
    val idx = FileBloomIndex.readFor(f, lake, "doc_id", added)
    assert(added.forall(idx.contains))
    val stats = graft.sources.FileStats.read(f, lake)
    assert(added.forall(rel => stats.contains((rel, "n_chars"))))

    // a follow-up tick with no new commits: nothing delivered, and the
    // maintenance half does zero index work
    val wReplay = FileBloomIndex.shardWrites.get()
    assert(LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      statsCols = Seq("n_chars"), keyCols = Seq("doc_id")) === None)
    assert(FileBloomIndex.shardWrites.get() === wReplay,
      "an idle maintenance tick must touch no shards")
    // pruned keyed lookups still answer exactly post-maintenance
    val got = History.readPinnedKeyed(spark, lake, "doc_id", Seq(1L, 2L, 3L))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      === Seq(1L, 3L))
  }

  test("maintenance tick advances a materialized rollup alongside the feed") {
    import spark.implicits._
    import graft.sources.IncrementalRollup
    val lake = docsLake()
    val out = fresh("graft-cdf-out")
    val rollup = fresh("graft-cdf-rollup")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("doc_id"), "n_chars"): Unit
    LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      rollups = Seq(LakeChangeFeed.RollupSpec(rollup, Seq("doc_id"),
        "n_chars"))): Unit // baseline: feed high water = rollup version
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    History.append(spark, lake, Seq((9L, 90L)).toDF("doc_id", "n_chars"),
      key = "rb1"): Unit
    LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      rollups = Seq(LakeChangeFeed.RollupSpec(rollup, Seq("doc_id"),
        "n_chars"))): Unit
    val state = IncrementalRollup.read(spark, rollup)
      .select("doc_id", "sum_n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(state === Set((1L, 10L), (3L, 30L), (4L, 40L), (9L, 90L)))
    // idle maintenance tick: rollup version stays put
    val v = IncrementalRollup.currentVersion(spark, rollup)
    LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      rollups = Seq(LakeChangeFeed.RollupSpec(rollup, Seq("doc_id"),
        "n_chars"))): Unit
    assert(IncrementalRollup.currentVersion(spark, rollup) === v)
  }

  test("a poisoned rollup fails loudly but never starves its siblings") {
    import spark.implicits._
    import graft.sources.IncrementalRollup
    val lake = fresh("graft-cdf-lake3")
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L))
      .toDF("doc_id", "lang", "n_chars")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val out = fresh("graft-cdf-out")
    val hllRollup = fresh("graft-cdf-hll")
    val plainRollup = fresh("graft-cdf-plain")
    IncrementalRollup.bootstrap(spark, lake, hllRollup, Seq("lang"),
      Seq("n_chars"), distinctCols = Seq("doc_id")): Unit
    IncrementalRollup.bootstrap(spark, lake, plainRollup, Seq("lang"),
      Seq("n_chars")): Unit
    // a delete poisons the HLL rollup (sketches cannot retract) …
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val specs = Seq(
      LakeChangeFeed.RollupSpec(hllRollup, Seq("lang"), Seq("n_chars"),
        distinctCols = Seq("doc_id")),
      LakeChangeFeed.RollupSpec(plainRollup, Seq("lang"), Seq("n_chars")))
    val e = intercept[IllegalStateException] {
      LakeChangeFeed.tickWithMaintenance(spark, lake, out, rollups = specs)
    }
    assert(e.getMessage.contains(hllRollup))
    // … but the plain rollup still advanced to the lake's latest
    val latest = graft.sources.History.versions(spark, lake).last
    assert(IncrementalRollup.currentVersion(spark, plainRollup) ===
      Some(latest))
  }

  test("expire retires old ranges but never the high water") {
    import spark.implicits._
    val lake = docsLake()
    val out = fresh("graft-cdf-out")
    LakeChangeFeed.tick(spark, lake, out): Unit // baseline marker
    (0 until 4).foreach { i =>
      History.append(spark, lake, Seq((100L + i, 1L))
        .toDF("doc_id", "n_chars"), key = s"e$i"): Unit
      LakeChangeFeed.tick(spark, lake, out): Unit
    }
    val hwBefore = LakeChangeFeed.highWater(spark, out)
    val deleted = LakeChangeFeed.expire(spark, out, keepRanges = 2)
    assert(deleted >= 2)
    assert(LakeChangeFeed.highWater(spark, out) === hwBefore)
    val f = fs(out)
    val remaining = f.listStatus(new org.apache.hadoop.fs.Path(out))
      .map(_.getPath.getName).filter(_.startsWith("changes-"))
    assert(remaining.length === 2, remaining.mkString(", "))
    // delivery continues seamlessly from the surviving high water
    History.append(spark, lake, Seq((999L, 9L))
      .toDF("doc_id", "n_chars"), key = "e-post"): Unit
    val r = LakeChangeFeed.tick(spark, lake, out)
    assert(r.isDefined && r.get._1 === hwBefore.get)
  }

  test("ticks deliver net diffs exactly once; empty diffs advance") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out")

    // bootstrap at latest: nothing to deliver yet
    assert(LakeChangeFeed.tick(spark, lake, out) === None)

    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val r1 = LakeChangeFeed.tick(spark, lake, out)
    assert(r1 === Some((1L, 2L)))
    assert(feedRows(out) === Seq((2L, "delete")))
    // nothing new: no second delivery
    assert(LakeChangeFeed.tick(spark, lake, out) === None)

    // content-neutral commit (pure rewrite): range advances, no rows
    History.clusterBy(spark, lake, "doc_id", 1): Unit
    val r2 = LakeChangeFeed.tick(spark, lake, out)
    assert(r2.isDefined && r2.get._1 === 2L)
    assert(feedRows(out) === Seq((2L, "delete")))
    assert(LakeChangeFeed.highWater(spark, out) === Some(r2.get._2))

    // next real change baselines at the advanced high water
    History.deleteWhere(spark, lake, col("doc_id") === 4L): Unit
    LakeChangeFeed.tick(spark, lake, out): Unit
    assert(feedRows(out) === Seq((2L, "delete"), (4L, "delete")))
  }

  test("crash windows: staged leftovers overwritten, replays converge") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out2")
    History.deleteWhere(spark, lake, col("doc_id") === 1L): Unit

    // crash BEFORE rename: staged garbage only — nothing delivered
    val stage = new org.apache.hadoop.fs.Path(out, "_staging/changes-v1-v2")
    val f = fs(out)
    f.mkdirs(stage): Unit
    val o = f.create(new org.apache.hadoop.fs.Path(stage, "junk"), true)
    o.write("junk".getBytes("UTF-8")); o.close()
    assert(LakeChangeFeed.highWater(spark, out) === None)

    // the next tick overwrites the crashed attempt and delivers
    assert(LakeChangeFeed.tick(spark, lake, out, fromVersion = Some(1L))
      === Some((1L, 2L)))
    assert(feedRows(out) === Seq((1L, "delete")))

    // crash AFTER rename = delivered; a replayed tick skips re-writing
    assert(LakeChangeFeed.tick(spark, lake, out) === None)
    History.deleteWhere(spark, lake, col("doc_id") === 3L): Unit
    assert(LakeChangeFeed.tick(spark, lake, out) === Some((2L, 3L)))
    // replay of the same range: returns the range, writes nothing new
    val before = feedRows(out)
    assert(LakeChangeFeed.tick(spark, lake, out) === None)
    assert(feedRows(out) === before)
  }

  test("a vacuumed baseline fails loudly instead of re-baselining") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out3")
    History.deleteWhere(spark, lake, col("doc_id") === 1L): Unit
    assert(LakeChangeFeed.tick(spark, lake, out, fromVersion = Some(1L))
      === Some((1L, 2L)))
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    History.vacuum(spark, lake, graceMs = 0L): Unit // v2 gone
    val e = intercept[IllegalArgumentException] {
      LakeChangeFeed.tick(spark, lake, out)
    }
    assert(e.getMessage.contains("re-bootstrap"))
  }

  test("a vanilla file-source stream tails the delivered feed") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out5")
    LakeChangeFeed.tick(spark, lake, out): Unit // baseline marker
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    LakeChangeFeed.tick(spark, lake, out): Unit
    History.deleteWhere(spark, lake, col("doc_id") === 4L): Unit
    LakeChangeFeed.tick(spark, lake, out): Unit

    val ckpt = fresh("graft-cdf-ckpt")
    val sinkTable = "cdf_tail_" + System.nanoTime()
    val schema = spark.read.parquet(s"$out/changes-*").schema
    val q = spark.readStream.schema(schema)
      .parquet(s"$out/changes-*")
      .writeStream
      .format("memory").queryName(sinkTable)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L): Unit
    val got = spark.table(sinkTable)
      .select("doc_id", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got === Seq((2L, "delete"), (4L, "delete")))
  }

  test("maintenance tick retires small-file debt in the same agent pass") {
    import spark.implicits._
    val lake = fresh("graft-cdf-bp-lake")
    // five one-row files land as five commits (the archive debt shape)
    Seq((1L, 10L)).toDF("doc_id", "n_chars")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    (2 to 5).foreach { i =>
      History.append(spark, lake,
        Seq((i.toLong, i * 10L)).toDF("doc_id", "n_chars"),
        key = s"b$i"): Unit
    }
    val out = fresh("graft-cdf-bp-out")
    LakeChangeFeed.tick(spark, lake, out,
      fromVersion = Some(1L)): Unit // deliver the appends first
    History.append(spark, lake,
      Seq((6L, 60L)).toDF("doc_id", "n_chars"), key = "b6"): Unit
    LakeChangeFeed.tickWithMaintenance(spark, lake, out,
      binPackTargetBytes = Some(1024L * 1024)): Unit
    val fs1 = fs(lake)
    assert(FileManifest.latest(fs1, lake).get.cur.size === 1,
      "the maintenance pass must bin-pack the accumulated small files")
    assert(History.readPinned(spark, lake).count() === 6L)
    // the NEXT delivered range diffs the pure-layout commit to empty
    // rows (plus nothing else), so downstream consumers see no churn;
    // the baseline v1 already held doc 1, so the feed carries 2..6
    LakeChangeFeed.tick(spark, lake, out): Unit
    assert(feedRows(out).sorted ===
      (2L to 6L).map(i => (i, "insert")).sorted)
  }

  test("stream() resolves from the lake schema and resumes exactly once") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out6")
    val ckpt = fresh("graft-cdf-ckpt6")
    // schema comes from the LAKE: the stream resolves before any range
    // files exist (plain file inference would have nothing to read)
    LakeChangeFeed.tick(spark, lake, out): Unit // baseline marker only
    val df0 = LakeChangeFeed.stream(spark, lake, out)
    assert(df0.isStreaming)
    assert(df0.columns.toSeq === Seq("doc_id", "n_chars", "_change"))
    History.deleteWhere(spark, lake, col("doc_id") === 1L): Unit
    LakeChangeFeed.tick(spark, lake, out): Unit
    // foreachBatch sink: supports checkpoint RECOVERY (memory does not),
    // which is the property under test — a resumed run with the same
    // checkpoint must process only ranges it has not seen
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def runOnce(): Unit =
      LakeChangeFeed.stream(spark, lake, out).writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.select("doc_id", "_change").collect()
              .foreach(r => seen.add((r.getLong(0), r.getString(1))): Unit)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000L): Unit
    runOnce()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted === Seq((1L, "delete")))
    // evolve the lake with a MERGE-ON-READ takedown; the feed delivers
    // it positionally and a RESUMED stream (same checkpoint) must see
    // only the new range — never replay the old one
    History.deleteKeysDV(spark, lake, "doc_id", Seq(3L)): Unit
    LakeChangeFeed.tick(spark, lake, out): Unit
    runOnce()
    assert(seen.asScala.toSeq.sorted ===
      Seq((1L, "delete"), (3L, "delete")),
      "the resumed stream must deliver the new range exactly once")
  }

  test("explicit fromVersion baselines an initial-snapshot follow") {
    val lake = docsLake()
    val out = fresh("graft-cdf-out4")
    History.deleteWhere(spark, lake, col("doc_id") === 4L): Unit
    // baseline at v1 (oldest retained): the delete since then delivers
    assert(LakeChangeFeed.tick(spark, lake, out, fromVersion = Some(1L))
      === Some((1L, 2L)))
    assert(feedRows(out) === Seq((4L, "delete")))
  }
}
