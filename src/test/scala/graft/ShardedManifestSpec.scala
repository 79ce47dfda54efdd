package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** Sharded manifests: the version root becomes a per-partition shard
  * index, so (1) commits write only the shards they touch, (2)
  * partition-pruned plans parse only the shards they scan, (3) time
  * travel spans flat and sharded versions, and (4) vacuum reclaims
  * unreferenced shard files. Content equivalence is asserted against
  * the same lake read flat. */
class ShardedManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshLake(): String =
    java.nio.file.Files.createTempDirectory("graft-sharded").toString + "/lake"

  private def hadoopFs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A lang-partitioned documents-shaped lake: 3 partitions, 1+ file each. */
  private def docsLake(): String = {
    import spark.implicits._
    val dir = freshLake()
    Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "de", 40L), (5L, "de", 50L),
      (6L, "fr", 60L))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  private def shardNames(lake: String): Set[String] =
    FileManifest.listShardFiles(hadoopFs(lake), lake).map(_._1).toSet

  test("conversion preserves content; one shard per partition dir") {
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    val flatImage = ids(History.readPinned(spark, lake))

    val v = History.enableShardedManifests(spark, lake)
    assert(v === 2L)
    assert(History.enableShardedManifests(spark, lake) === 2L) // idempotent

    val fs = hadoopFs(lake)
    assert(FileManifest.isSharded(fs, lake, 2L))
    assert(!FileManifest.isSharded(fs, lake, 1L))
    assert(shardNames(lake).size === 3) // lang=de, lang=en, lang=fr

    // assembled sharded read == flat image; v1 time travel still flat
    assert(ids(History.readPinned(spark, lake)) === flatImage)
    assert(ids(History.readPinned(spark, lake, 1L)) === flatImage)
    assert(ids(History.readPinned(spark, lake, 2L)) === flatImage)
  }

  test("conversion stamps the declared schema version like any commit") {
    // convertToSharded bypasses publish() (a not-yet-sharded lake would
    // route back to a flat write), so it must stamp the schema version
    // itself — an unstamped conversion version silently falls back to
    // the PRESENT declaration under an era time-travel pin (ADVICE r18)
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.declareSchema(spark, lake): Unit
    val sv = graft.sources.SchemaLog
      .latestVersion(hadoopFs(lake), lake)
    assert(sv.isDefined)
    History.enableShardedManifests(spark, lake): Unit
    val m = FileManifest.latest(hadoopFs(lake), lake).get
    assert(m.schemaV === sv,
      s"conversion version v${m.version} must carry the stamp $sv, " +
        s"got ${m.schemaV}")
  }

  test("a commit touching one partition rewrites exactly one shard") {
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val before = shardNames(lake)
    val fs = hadoopFs(lake)

    // land one more file in lang=en only, manifest-committed
    import spark.implicits._
    val extra = java.nio.file.Files
      .createTempDirectory("graft-sharded-extra").toString + "/out"
    Seq((7L, 70L)).toDF("doc_id", "n_chars")
      .coalesce(1).write.parquet(extra)
    val newName = "part-extra-en.parquet"
    val src = new java.io.File(extra).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val dst = new org.apache.hadoop.fs.Path(s"$lake/lang=en/$newName")
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(src.toString), dst)
    FileManifest.addFiles(fs, lake, Seq(s"lang=en/$newName"))

    val after = shardNames(lake)
    val added = after -- before
    assert(added.size === 1, s"expected 1 new shard, got $added")
    assert(added.head.contains("-v000000000003-"),
      s"shard name should embed the publishing version: ${added.head}")
    // the untouched partitions' shards are REUSED by the new root —
    // their files are referenced by both v2 and v3
    val refs = FileManifest.referencedShards(fs, lake)
    assert((before -- refs).isEmpty, "v2 shards must stay referenced")
    assert(ids(History.readPinned(spark, lake)) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("partition-pruned read parses only the matching shards") {
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)

    // warm the root index, then count shard reads for a one-dir prune
    FileManifest.isSharded(fs, lake,
      FileManifest.latestVersion(fs, lake).get): Unit
    val before = FileManifest.shardFileReads.get()
    val en = History.readPinnedPartitions(spark, lake, _ == "lang=en")
    assert(ids(en) === Seq(1L, 2L, 3L))
    val delta = FileManifest.shardFileReads.get() - before
    assert(delta <= 1L,
      s"one-partition prune should read at most 1 uncached shard, read $delta")

    // full read equivalence and empty-prune schema retention
    assert(ids(History.readPinnedPartitions(spark, lake, _ => true)) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val none = History.readPinnedPartitions(spark, lake, _ => false)
    assert(none.columns.contains("doc_id") && none.count() === 0L)
  }

  test("copy-on-write ops stay sharded; vacuum reclaims orphan shards") {
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)

    // deleteWhere funnels through publish → must stay sharded
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val v = FileManifest.latestVersion(fs, lake).get
    assert(FileManifest.isSharded(fs, lake, v))
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 3L, 4L, 5L, 6L))

    // drop an orphan shard (crashed publish image) + vacuum grace 0:
    // the orphan goes, every referenced shard stays, reads still work
    val orphan = new org.apache.hadoop.fs.Path(
      FileManifest.shardsDir(lake), "deadbeef-v000000000099.shard")
    val out = fs.create(orphan, true)
    out.write("cur\tlang=en/ghost.parquet\n".getBytes("UTF-8"))
    out.close()
    History.vacuum(spark, lake, graceMs = 0L): Unit
    assert(!fs.exists(orphan), "unreferenced shard must be vacuumed")
    val refs = FileManifest.referencedShards(fs, lake)
    assert(shardNames(lake) === refs,
      "every surviving shard file must be referenced by a retained root")
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("change feed diffs only the files the commit touched") {
    import spark.implicits._
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    val v0 = FileManifest.latestVersion(hadoopFs(lake), lake).get

    // delete one row: rewrites ONLY the lang=en files holding it
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val v1 = FileManifest.latestVersion(hadoopFs(lake), lake).get

    val feed = History.changesBetween(spark, lake, v0, v1)
    val got = feed.select("doc_id", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "delete")),
      s"survivors must cancel in the multiset diff, got $got")

    // file-granularity: the feed's scan plans only files that DIFFER
    // between the versions — never the untouched lang=de / lang=fr ones
    val fs = hadoopFs(lake)
    val a = FileManifest.at(fs, lake, v0).get.curSet
    val b = FileManifest.at(fs, lake, v1).get.curSet
    val changed = (a -- b) ++ (b -- a)
    val planned = feed.inputFiles.toSet
    assert(planned.nonEmpty)
    planned.foreach { f =>
      assert(changed.exists(rel => f.endsWith(rel)),
        s"unchanged file planned by the change feed: $f")
    }

    // a pure rewrite (clusterBy) produces an EMPTY feed
    History.clusterBy(spark, lake, "doc_id", 2): Unit
    val v2 = FileManifest.latestVersion(fs, lake).get
    assert(History.changesBetween(spark, lake, v1, v2).count() === 0L)

    // identical versions: empty feed, schema intact
    val same = History.changesBetween(spark, lake, v1, v1)
    assert(same.count() === 0L && same.columns.contains("_change"))
  }

  test("takedown audit: deleteKeys victims appear in the delivered feed") {
    // the composite a compliance pipeline runs: bloom-pruned keyed
    // takedown → exactly-once change-feed delivery; the delivered
    // delete-images ARE the audit record of what was removed
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    val out = java.nio.file.Files
      .createTempDirectory("graft-sharded-audit").toString + "/feed"
    graft.stream.LakeChangeFeed.tick(spark, lake, out): Unit // baseline

    History.deleteKeys(spark, lake, "doc_id", Seq(2L, 5L)): Unit
    graft.stream.LakeChangeFeed.tick(spark, lake, out): Unit

    val f = hadoopFs(lake)
    val dirs = f.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.startsWith("changes-"))
      .map(_.getPath.toString)
    val audit = spark.read.parquet(dirs.toIndexedSeq: _*)
      .select("doc_id", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(audit === Seq((2L, "delete"), (5L, "delete")))
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 3L, 4L, 6L))
  }

  test("racing sharded publishes: second committer fails, state intact") {
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m = FileManifest.latest(fs, lake).get
    // two writers build the same next version; the first wins, the
    // second must fail loudly on the root rename — never corrupt
    FileManifest.publish(fs, lake, m.copy(version = m.version + 1))
    val e = intercept[java.io.IOException] {
      FileManifest.publish(fs, lake, m.copy(version = m.version + 1))
    }
    assert(e.getMessage.contains("two writers raced"))
    assert(ids(History.readPinned(spark, lake)) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(FileManifest.isSharded(fs, lake,
      FileManifest.latestVersion(fs, lake).get))
  }

  test("schema evolution: readEvolved merges late columns on a sharded lake") {
    import spark.implicits._
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    // land a file with an extra column into a NEW partition, committed
    val extra = java.nio.file.Files
      .createTempDirectory("graft-sharded-evo").toString + "/out"
    Seq((7L, 70L, "late")).toDF("doc_id", "n_chars", "note")
      .coalesce(1).write.parquet(extra)
    val src = new java.io.File(extra).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$lake/lang=it")): Unit
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(src.toString),
      new org.apache.hadoop.fs.Path(s"$lake/lang=it/part-evo.parquet"))
    FileManifest.addFiles(fs, lake, Seq("lang=it/part-evo.parquet"))

    val evolved = History.readEvolved(spark, lake)
    assert(evolved.columns.contains("note"))
    assert(evolved.filter(col("doc_id") === 7L)
      .select("note").head.getString(0) === "late")
    assert(evolved.count() === 7L)
  }

  test("a scan planned before a sharded commit completes correctly after it") {
    // the PinnedLakeSpec race, through the sharded planner: pinned
    // reads pin FILES, and copy-on-write never moves live files, so a
    // plan made from sharded vN still answers vN after any number of
    // later sharded commits (until vacuum grace)
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit

    val pinned = History.readPinned(spark, lake) // PLANNED NOW
    val expected = ids(pinned)

    History.deleteWhere(spark, lake, col("doc_id") % 2 === 0): Unit
    History.clusterBy(spark, lake, "doc_id", 2): Unit

    // the pre-planned scan still sees its full snapshot
    assert(ids(pinned) === expected)
    // a fresh read sees the post-delete image
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 3L, 5L))
  }

  test("a retried publish replaces a crashed attempt's orphan shard") {
    // shard names are deterministic (md5(dir)-v<version>): a publish
    // that crashed after writing shards but before the root rename
    // leaves orphans under the EXACT names the retry regenerates. The
    // retry must replace them (single-writer: no committed root can
    // reference an uncommitted version's shard) — not fail with a
    // misleading version-collision error that wedges the writer.
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m = FileManifest.latest(fs, lake).get
    val next = m.version + 1
    // the crashed attempt's orphan: the deterministic name the retry
    // will regenerate for the one dir the commit touches, stale content
    val orphan = new org.apache.hadoop.fs.Path(
      FileManifest.shardsDir(lake),
      f"${Hashes.md5Hex("lang=en", 32)}%s-v$next%012d.shard")
    val out = fs.create(orphan, true)
    out.write("cur\tlang=en/stale-from-crashed-attempt.parquet\n"
      .getBytes("UTF-8"))
    out.close()
    // the retry: drop one lang=en entry → rewrites exactly that shard
    val enVictim = m.cur.filter(_.startsWith("lang=en/")).head
    FileManifest.publish(fs, lake,
      FileManifest.Manifest(next, m.cur.filterNot(_ == enVictim),
        m.retired :+ (1L, enVictim)))
    // the committed root serves the RETRY's content, not the orphan's
    val after = FileManifest.latest(fs, lake).get
    assert(after.version === next)
    assert(!after.curSet.contains(enVictim))
    assert(!after.curSet.exists(_.contains("stale-from-crashed-attempt")),
      "retry must replace the crashed attempt's shard content")
    // the victim was lang=en's only file (1,2,3 live there) → de+fr remain
    assert(ids(History.readPinned(spark, lake)) === Seq(4L, 5L, 6L))
  }

  test("an empty manifest publish stays sharded") {
    // a fully-drained lake (all files deleted, retired set vacuumed)
    // publishes a manifest with zero entries; the root must still
    // classify as SHARDED or the lake silently drops to flat mode and
    // the next commit rewrites one monolithic manifest
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m = FileManifest.latest(fs, lake).get
    FileManifest.publish(fs, lake,
      FileManifest.Manifest(m.version + 1, Nil, Nil))
    assert(FileManifest.isSharded(fs, lake, m.version + 1),
      "empty sharded root must round-trip as sharded")
    val empty = FileManifest.latest(fs, lake).get
    assert(empty.cur.isEmpty && empty.retired.isEmpty)
    // and the NEXT publish (files return) is automatically sharded too
    FileManifest.publish(fs, lake,
      FileManifest.Manifest(m.version + 2, m.cur, Nil))
    assert(FileManifest.isSharded(fs, lake, m.version + 2))
    assert(ids(History.readPinned(spark, lake)) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("a warm writer's next commit reads zero prior shard files") {
    // the cold-writer bootstrap reads every prior shard once (the
    // reuse check needs the previous entries); after that, everything
    // the writer read or WROTE is cached — so the steady-state commit
    // cost is O(touched dirs) of writes with no physical re-reads
    val lake = docsLake()
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    // first post-conversion commit: may read prior shards (bootstrap)
    val m1 = FileManifest.latest(fs, lake).get
    FileManifest.publish(fs, lake, FileManifest.Manifest(
      m1.version + 1, m1.cur.filterNot(_.startsWith("lang=fr/")),
      m1.retired ++ m1.cur.filter(_.startsWith("lang=fr/")).map((1L, _))))
    // second commit from the same process: zero physical shard reads —
    // resolve latest (reassembles all shards) + publish (reuse-checks
    // every dir) must both be served from the cache
    val before = FileManifest.shardFileReads.get()
    val m2 = FileManifest.latest(fs, lake).get
    FileManifest.publish(fs, lake, FileManifest.Manifest(
      m2.version + 1, m2.cur.filterNot(_.startsWith("lang=de/")),
      m2.retired ++ m2.cur.filter(_.startsWith("lang=de/")).map((2L, _))))
    val delta = FileManifest.shardFileReads.get() - before
    assert(delta === 0L,
      s"warm-writer commit must be read-free, paid $delta shard reads")
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 2L, 3L))
  }

  test("unpartitioned lakes shard under the root dir key") {
    import spark.implicits._
    val lake = freshLake()
    Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    History.enableShardedManifests(spark, lake): Unit
    assert(shardNames(lake).size === 1)
    assert(ids(History.readPinned(spark, lake)) === Seq(1L, 2L))
    assert(ids(History.readPinnedPartitions(spark, lake, _ == ".")) ===
      Seq(1L, 2L))
  }
}
