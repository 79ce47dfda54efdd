package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.ReferenceFixtures._
import graft.sources.{FileManifest, History}
import graft.stream.Pipeline

/** Manifest-mode lake: file-granular snapshot isolation (a scan planned
  * BEFORE a compaction completes correctly AFTER it — the race
  * readSnapshot's directory pins could not close), vacuum/grace
  * reclamation, archive integration, and partition retention in both
  * manifest and legacy modes. */
class PinnedLakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val ts = "collectionendtimestamp_plus_3_mins"

  private def freshLake(): String =
    java.nio.file.Files.createTempDirectory("graft-pinned").toString

  private def records(payload: String) = {
    import spark.implicits._
    Pipeline.payloadToRecords(Seq(payload).toDF("value"))
  }

  private def hadoopFs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.select(col("siteId"), col(ts)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  test("schema memory: an undeclared lake emptied and fully vacuumed " +
      "keeps its read shape") {
    import spark.implicits._
    // round-17 deep-fuzz find: delete-all retires every file; a
    // grace-0 vacuum then destroys every donor byte, and the
    // UNDECLARED lake had nothing left to infer a schema from — the
    // pinned read degraded to a ZERO-COLUMN frame and any downstream
    // select died with an unresolved-column analysis error. Vacuum now
    // snapshots the shape before the last donor dies.
    val lake = freshLake() + "/lake"
    Seq((1L, "p0", 10L), (2L, "p1", 20L)).toDF("id", "part", "v")
      .write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    History.deleteWhere(spark, lake, lit(true)): Unit
    History.vacuum(spark, lake, graceMs = 0L): Unit
    val img = History.readPinned(spark, lake).select("id", "part", "v")
    assert(img.schema.fieldNames.toSeq === Seq("id", "part", "v"))
    assert(img.count() === 0L)
    // partition-column TYPE and layout memory both hold: the next
    // append lands partitioned and reads back whole
    History.append(spark, lake,
      Seq((3L, "p0", 30L)).toDF("id", "part", "v"), key = "post-vacuum",
      partitionCols = Seq("part")): Unit
    assert(History.readPinned(spark, lake).select("id", "part", "v")
      .as[(Long, String, Long)].collect().toSeq === Seq((3L, "p0", 30L)))
  }

  test("a scan planned before a compaction completes correctly after it") {
    val lake = freshLake()
    History.writePartitioned(records(streamPayload), lake)
    // second file in the same partition: the 15:43 doc again with a
    // bumped site so compaction has multiple files AND keys to fold
    History.writePartitioned(records(singleSiteDoc), lake, mode = "append")
    assert(History.enableManifests(spark, lake) === 1L)
    assert(History.enableManifests(spark, lake) === 1L) // idempotent

    val expected = rows(spark.read.parquet(lake)) // pre-compaction truth
    val pinned = History.readPinned(spark, lake)  // PLANNED NOW

    History.compactLatest(spark, lake, Seq("siteId"), ts,
      col("dt") === "2019-10-03")

    // the pre-planned scan completes and sees its full snapshot — the
    // old files were retired in the manifest, not moved or deleted
    assert(rows(pinned) === expected)

    // a fresh pinned read sees the compacted latest-wins state: site
    // 2087 keeps only its newest period per file set
    val fresh = rows(History.readPinned(spark, lake))
    assert(fresh.distinct === fresh, s"duplicates survive compaction: $fresh")
    assert(fresh.toSet ===
      expected.groupBy(_._1).map(_._2.maxBy(_._2)).toSet)

    // inside the grace window nothing is reclaimed; the pin still scans
    assert(History.vacuum(spark, lake, graceMs = 3600L * 1000) === ((0, 0)))
    assert(rows(pinned) === expected)

    // grace over: retired files physically reclaimed, and from here the
    // plain directory read agrees with the manifest exactly
    val (retired, orphans) = History.vacuum(spark, lake, graceMs = 0)
    assert(retired >= 2, s"expected both pre-compaction files retired: $retired")
    assert(orphans === 0)
    assert(rows(spark.read.parquet(lake)) ===
      rows(History.readPinned(spark, lake)))
  }

  test("parsed manifests are cached: repeat pinned reads re-read no manifest file") {
    // a published v<N>.manifest is immutable, so the session parses each
    // version once; every later plan against that version (pinned reads,
    // time travel, stats pruning) serves from the cache — at 100 TB the
    // manifest is ~10⁵–10⁶ lines and a per-plan driver read would tax
    // every query in the session
    val lake = freshLake()
    History.writePartitioned(records(streamPayload), lake)
    History.enableManifests(spark, lake): Unit
    val first = rows(History.readPinned(spark, lake))
    val baseline = FileManifest.manifestFileReads.get()
    val second = rows(History.readPinned(spark, lake))
    val third = rows(History.readPinned(spark, lake, version = 1L))
    assert(second === first)
    assert(third === first)
    assert(FileManifest.manifestFileReads.get() === baseline,
      "repeat reads of an already-parsed manifest version hit the file")
    // a NEW version is a new file: exactly one more physical read (the
    // manifest ADD itself reads the latest — from cache — then the next
    // pinned read parses only the freshly published version), and the
    // new plan sees the appended rows
    History.writePartitioned(records(singleSiteDoc), lake, mode = "append")
    val fs = hadoopFs(lake)
    FileManifest.addFiles(fs, lake, FileManifest.listLiveFiles(fs, lake))
    val after = rows(History.readPinned(spark, lake))
    assert(after.size > first.size)
    assert(FileManifest.manifestFileReads.get() === baseline + 1)
  }

  test("uncommitted files are invisible to readPinned and vacuumed as orphans") {
    val lake = freshLake()
    History.writePartitioned(records(singleSiteDoc), lake)
    History.enableManifests(spark, lake): Unit
    val before = rows(History.readPinned(spark, lake))
    // a writer crashed after landing a file but before its manifest add
    val dir = new java.io.File(lake)
      .listFiles().filter(_.getName.startsWith("region=")).head
      .listFiles().filter(_.getName.startsWith("dt=")).head
    java.nio.file.Files.write(
      dir.toPath.resolve("orphan-crashed.parquet"),
      Array[Byte](1, 2, 3)): Unit
    assert(rows(History.readPinned(spark, lake)) === before)
    val (retired, orphans) = History.vacuum(spark, lake, graceMs = 0)
    assert((retired, orphans) === ((0, 1)))
    assert(!new java.io.File(dir, "orphan-crashed.parquet").exists())
  }

  test("archive batches commit to the manifest; replay publishes nothing") {
    import spark.implicits._
    val lake = freshLake()
    History.enableManifests(spark, lake): Unit
    assert(History.readPinned(spark, lake).isEmpty)
    val ledger = new Pipeline.InMemoryBatchLedger
    Pipeline.archiveBatch(records(singleSiteDoc + NUL), 0L, lake, Some(ledger))
    val fs = hadoopFs(lake)
    val v1 = FileManifest.latest(fs, lake).get
    assert(rows(History.readPinned(spark, lake)).nonEmpty)
    assert(v1.cur.nonEmpty && v1.cur.forall(_.contains("b0-")))
    // crash-replay of batch 0: ledger high-water says done — no new
    // files, no new manifest version
    Pipeline.archiveBatch(records(singleSiteDoc + NUL), 0L, lake, Some(ledger))
    assert(FileManifest.latest(fs, lake).get.version === v1.version)
    // an UNledgered archive batch on a manifest lake still commits
    // through the manifest (stage-then-publish, never a bare append)
    Pipeline.archiveBatch(records(multiSiteDoc + NUL), 1L, lake, None)
    val v2 = FileManifest.latest(fs, lake).get
    assert(v2.version === v1.version + 1)
    assert(rows(History.readPinned(spark, lake)).size ===
      rows(History.readPinned(spark, lake)).distinct.size)
    assert(History.readPinned(spark, lake).count() === 3) // 1 + 2 sites
  }

  test("in-line maintenance on a manifest lake keeps every committed row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lake = freshLake()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pinned-ck").toString
    History.enableManifests(spark, lake): Unit
    val ledger = new Pipeline.FileBatchLedger(s"$lake/_ledger")
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Pipeline.archive(Pipeline.payloadToRecords(input.toDF()),
      lake, ckpt, Some(ledger), compactEvery = Some(2),
      keyIndexCol = Some(ts))
    try {
      // 4 micro-batches; maintenance compacts touched partitions on the
      // even ones — every append and every compaction is a manifest flip
      input.addData(singleSiteDoc + NUL)
      q.processAllAvailable()
      input.addData(multiSiteDoc + NUL)
      q.processAllAvailable()
      input.addData(singleSiteDoc + NUL) // exact logical duplicate
      q.processAllAvailable()
      input.addData(multiSiteDoc + NUL)
      q.processAllAvailable()
      val fs = hadoopFs(lake)
      val m = FileManifest.latest(fs, lake).get
      assert(m.version > 4, s"expected append+compact flips, got v${m.version}")
      // latest-wins on (siteId, ts): duplicates collapsed where
      // maintenance ran, and NO committed (siteId, ts) pair lost
      val got = History.readPinned(spark, lake)
        .select(col("siteId"), col(ts)).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got.toSet === Set(("2087", epoch1543), ("2087", epoch1548),
        ("8", epoch1548)), got.mkString(";"))
      // the maintenance tick also kept the stats sidecar warm: the
      // range read prunes against it and agrees with the full read
      assert(graft.sources.FileStats.read(fs, lake).nonEmpty)
      assert(rows(History.readPinnedRange(spark, lake, ts,
          epoch1548, epoch1548)).toSet ===
        rows(History.readPinned(spark, lake)
          .filter(col(ts) === epoch1548)).toSet)
      // ...and the bloom key index rode the same tick: content-pruned
      // point lookup agrees with the full read
      assert(graft.sources.FileBloomIndex.readAll(fs, lake, ts).nonEmpty)
      assert(rows(History.readPinnedKeyed(spark, lake, ts,
          Seq(epoch1548))).toSet ===
        rows(History.readPinned(spark, lake)
          .filter(col(ts) === epoch1548)).toSet)
      // after grace-0 vacuum the directory layout agrees with the
      // manifest exactly (retired + orphan files reclaimed)
      History.vacuum(spark, lake, graceMs = 0): Unit
      assert(rows(spark.read.parquet(lake)).sorted ===
        rows(History.readPinned(spark, lake)).sorted)
      assert(ledger.lastCommitted === 3L)
    } finally q.stop()
  }

  test("manifest-mode retention: expiry is a manifest flip, vacuum reclaims") {
    import spark.implicits._
    val lake = freshLake()
    val laterDoc = singleSiteDoc.replace("2019-10-03T15:43:00+10:00",
      "2019-10-04T15:43:00+10:00")
    History.writePartitioned(
      records(streamPayload + laterDoc + NUL), lake)
    History.enableManifests(spark, lake): Unit
    // the archive's replay guard must outlive retention
    val ledger = new Pipeline.FileBatchLedger(s"$lake/_ledger")
    ledger.markCommitted(7L)
    val expectedAll = rows(spark.read.parquet(lake))
    val pinned = History.readPinned(spark, lake) // planned pre-expiry

    val gone = History.expireOlderThan(spark, lake, retainDays = 1,
      asOf = java.time.LocalDate.parse("2019-10-05"))
    assert(gone.exists(_.contains("dt=2019-10-03")), gone.mkString(","))
    assert(!gone.exists(_.contains("dt=2019-10-04")), gone.mkString(","))

    // pre-planned scan still sees the full snapshot; fresh reads don't
    assert(rows(pinned) === expectedAll)
    val kept = History.readPinned(spark, lake)
    assert(kept.select("dt").distinct().collect()
      .map(_.get(0).toString).toSeq === Seq("2019-10-04"))

    val (retired, _) = History.vacuum(spark, lake, graceMs = 0)
    assert(retired >= 1)
    // expired partition dirs are gone; the kept one and the ledger stay
    val dirs = new java.io.File(lake).listFiles()
      .filter(_.getName.startsWith("region=")).flatMap(_.listFiles())
      .map(_.getName).toSet
    assert(!dirs.contains("dt=2019-10-03"), dirs.mkString(","))
    assert(ledger.lastCommitted === 7L)
  }

  test("bounded reads prune partitions and skip retired files on a manifest lake") {
    import spark.implicits._
    val lake = freshLake()
    val laterDoc = singleSiteDoc.replace("2019-10-03T15:43:00+10:00",
      "2019-10-04T15:43:00+10:00")
    History.writePartitioned(records(streamPayload + laterDoc + NUL), lake)
    History.enableManifests(spark, lake): Unit
    // compact one day: its old files are retired but physically present
    History.compactLatest(spark, lake, Seq("siteId"), ts,
      col("dt") === "2019-10-03")
    // a plain directory read would now double-count dt=2019-10-03; the
    // typed readers ride the manifest and must not
    val day1 = History.readFrom(spark, lake, "2019-10-03")
      .filter(col("dt") === "2019-10-03")
    assert(day1.select("siteId").distinct().count() ===
      day1.select("siteId").count()) // latest-wins, no double rows
    val pruned = History.readRegionFrom(spark, lake, "ROZ", "2019-10-04")
    assert(pruned.count() === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
  }

  test("replayed archive batch never re-publishes a manifest-committed batch") {
    val lake = freshLake()
    History.enableManifests(spark, lake): Unit
    val recs = records(singleSiteDoc)
    // first commit: batch 5 lands and is added to the manifest
    Pipeline.archiveBatch(recs, 5L, lake, ledger = None)
    val fs = hadoopFs(lake)
    val m1 = FileManifest.latest(fs, lake).get
    assert(m1.cur.exists(_.contains("b5-")), m1.cur.mkString(","))
    val pinned = History.readPinned(spark, lake) // planned from m1
    val expected = rows(pinned)

    // crash-replay of the SAME batch (no ledger: the manifest is the
    // only committed-state signal). It must be a complete no-op — no
    // sweep of the committed bN files, no manifest flip
    Pipeline.archiveBatch(recs, 5L, lake, ledger = None)
    assert(FileManifest.latest(fs, lake).get.version === m1.version)
    assert(rows(pinned) === expected) // the pre-planned scan still reads
    assert(rows(History.readPinned(spark, lake)) === expected)

    // in-line compaction retires the b5 files; a late replay after THAT
    // must also skip (retired counts as committed) — re-adding would
    // duplicate the batch's rows next to the compacted copy
    History.compactLatest(spark, lake, Seq("siteId"), ts,
      col("dt") === "2019-10-03")
    val m2 = FileManifest.latest(fs, lake).get
    assert(m2.retired.exists(_._2.contains("b5-")))
    Pipeline.archiveBatch(recs, 5L, lake, ledger = None)
    assert(FileManifest.latest(fs, lake).get.version === m2.version)
    assert(rows(History.readPinned(spark, lake)).sorted === expected.sorted)

    // a DIFFERENT stream incarnation (fresh checkpoint → new stream
    // tag) reusing batch id 5 is NOT a replay: its batch must land,
    // not be silently dropped by the other incarnation's b5- files
    val before = History.readPinned(spark, lake).count()
    Pipeline.archiveBatch(records(multiSiteDoc), 5L, lake,
      ledger = None, streamTag = Some(Pipeline.streamTagOf("/ck/other")))
    assert(History.readPinned(spark, lake).count() > before,
      "second incarnation's batch was dropped as already-committed")
  }

  test("time travel: readPinned at a retained version replays history") {
    import spark.implicits._
    val lake = freshLake()
    History.writePartitioned(records(singleSiteDoc), lake)
    History.enableManifests(spark, lake): Unit // v1
    val v1State = rows(History.readPinned(spark, lake))

    // a second committed batch advances the manifest
    History.writePartitioned(records(multiSiteDoc), lake, mode = "append")
    val fs = hadoopFs(lake)
    FileManifest.addFiles(fs, lake,
      FileManifest.listLiveFiles(fs, lake)) // v2 (idempotent dedupe adds only new)
    // compaction flips to v3: v2's files retired but still on disk
    History.compactLatest(spark, lake, Seq("siteId"), ts,
      col("dt") === "2019-10-03")
    assert(History.versions(spark, lake) === Seq(1L, 2L, 3L))

    // each retained version answers with ITS committed state
    assert(rows(History.readPinned(spark, lake, 1L)) === v1State)
    val v2 = rows(History.readPinned(spark, lake, 2L))
    assert(v2.size > v1State.size, s"v2 should see the appended batch: $v2")
    assert(rows(History.readPinned(spark, lake, 3L)) ===
      rows(History.readPinned(spark, lake)))

    // vacuum past grace collapses the travel horizon: it publishes its
    // own cleaned version (v4) and deletes the stale ones, so exactly
    // one version survives, and a vacuumed version fails loudly,
    // listing what's left
    History.vacuum(spark, lake, graceMs = 0): Unit
    val left = History.versions(spark, lake)
    assert(left.size === 1 && left.head >= 3L, left.mkString(","))
    val e = intercept[IllegalArgumentException] {
      History.readPinned(spark, lake, 1L)
    }
    assert(e.getMessage.contains(s"retained: ${left.head}"), e.getMessage)
  }

  test("copy-on-write delete: matching rows gone, snapshot + travel intact") {
    val lake = freshLake()
    History.writePartitioned(records(streamPayload), lake)
    History.writePartitioned(records(singleSiteDoc), lake, mode = "append")
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val before = rows(History.readPinned(spark, lake))
    val m0 = FileManifest.latest(fs, lake).get
    val pinned = History.readPinned(spark, lake) // PLANNED pre-delete

    val victim = before.head._1
    val (nFiles, nRows) =
      History.deleteWhere(spark, lake, col("siteId") === victim)
    assert(nRows === before.count(_._1 == victim).toLong)
    assert(nFiles >= 1)

    // fresh reads exclude exactly the victim's rows
    assert(rows(History.readPinned(spark, lake)) ===
      before.filterNot(_._1 == victim))
    // the scan planned before the delete still sees its full snapshot,
    // and time travel to the pre-delete version replays it — the
    // compliance clock starts at vacuum, which reclaims both
    assert(rows(pinned) === before)
    assert(rows(History.readPinned(spark, lake, m0.version)) === before)
    History.vacuum(spark, lake, graceMs = 0): Unit
    intercept[IllegalArgumentException] {
      History.readPinned(spark, lake, m0.version)
    }
    assert(rows(spark.read.parquet(lake)) ===
      before.filterNot(_._1 == victim))
  }

  test("copy-on-write delete: NULL keeps the row; untouched files untouched") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    Seq((1L, "a", Some("x")), (2L, "a", None), (3L, "b", Some("y")))
      .toDF("id", "part", "v")
      .coalesce(1) // exactly one file per partition dir
      .write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m0 = FileManifest.latest(fs, lake).get

    // DELETE WHERE v = 'x': true only for id 1 — id 2's NULL predicate
    // keeps it (SQL delete semantics), id 3's file holds no match
    assert(History.deleteWhere(spark, lake, col("v") === "x") === ((1, 1L)))
    val m1 = FileManifest.latest(fs, lake).get
    // part=b had no matches: its physical file stays current, unmoved
    assert(m0.cur.filter(_.startsWith("part=b")).forall(m1.curSet))
    // part=a was rewritten under this delete's version tag
    assert(m1.cur.exists(_.startsWith(s"part=a/d${m0.version + 1}-")),
      m1.cur.mkString(","))
    assert(History.readPinned(spark, lake)
      .select("id").as[Long].collect().sorted === Array(2L, 3L))

    // deleting a partition's last rows retires its file, no replacement
    assert(History.deleteWhere(spark, lake, col("part") === "b") === ((1, 1L)))
    assert(History.readPinned(spark, lake)
      .select("id").as[Long].collect() === Array(2L))

    // a no-match delete publishes nothing
    val vPre = FileManifest.latest(fs, lake).get.version
    assert(History.deleteWhere(spark, lake, col("v") === "zzz") === ((0, 0L)))
    assert(FileManifest.latest(fs, lake).get.version === vPre)
  }

  test("copy-on-write merge: matched keys replaced, inserts land, travel intact") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    Seq((1L, "a", "v1"), (2L, "a", "v2"), (3L, "b", "v3"))
      .toDF("id", "part", "v")
      .coalesce(1).write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m0 = FileManifest.latest(fs, lake).get
    val pinned = History.readPinned(spark, lake) // PLANNED pre-merge
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "part", "v").as[(Long, String, String)]
        .collect().sortBy(_._1)

    // one update (id 2 in part=a) + one insert (id 9, NEW part=c)
    val updates = Seq((2L, "a", "v2x"), (9L, "c", "v9")).toDF("id", "part", "v")
    assert(History.mergeInto(spark, lake, updates, Seq("id")) === ((1, 1L)))

    assert(img(History.readPinned(spark, lake)) === Array(
      (1L, "a", "v1"), (2L, "a", "v2x"), (3L, "b", "v3"), (9L, "c", "v9")))
    val m1 = FileManifest.latest(fs, lake).get
    // part=b held no matched key: its physical file stays current, unmoved
    assert(m0.cur.filter(_.startsWith("part=b")).forall(m1.curSet))
    // part=a rewritten and the insert's part=c created, both merge-tagged
    assert(m1.cur.exists(_.startsWith(s"part=a/u${m0.version + 1}-")))
    assert(m1.cur.exists(_.startsWith(s"part=c/u${m0.version + 1}-")))
    // the scan planned before the merge still sees its full snapshot,
    // and time travel to the pre-merge version replays it
    val before =
      Array((1L, "a", "v1"), (2L, "a", "v2"), (3L, "b", "v3"))
    assert(img(pinned) === before)
    assert(img(History.readPinned(spark, lake, m0.version)) === before)
  }

  test("copy-on-write merge: partition-moving update, pure insert, dup keys rejected") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    Seq((1L, "a", "v1"), (2L, "b", "v2")).toDF("id", "part", "v")
      .coalesce(1).write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    def img() = History.readPinned(spark, lake)
      .select("id", "part", "v").as[(Long, String, String)]
      .collect().sortBy(_._1)

    // an update that CHANGES the partition value: id 1 moves a → d;
    // the old part=a file retires with no replacement rows there
    assert(History.mergeInto(spark, lake,
      Seq((1L, "d", "v1d")).toDF("id", "part", "v"), Seq("id")) === ((1, 1L)))
    assert(img() === Array((1L, "d", "v1d"), (2L, "b", "v2")))

    // pure insert (no key matches): zero files rewritten, rows land
    assert(History.mergeInto(spark, lake,
      Seq((7L, "b", "v7")).toDF("id", "part", "v"), Seq("id")) === ((0, 0L)))
    assert(img() === Array((1L, "d", "v1d"), (2L, "b", "v2"), (7L, "b", "v7")))

    // key-duplicate updates are ambiguous and rejected up front
    val e = intercept[IllegalArgumentException] {
      History.mergeInto(spark, lake,
        Seq((5L, "a", "x"), (5L, "a", "y")).toDF("id", "part", "v"),
        Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
    assert(img() === Array((1L, "d", "v1d"), (2L, "b", "v2"), (7L, "b", "v7")))
  }

  test("clusterBy: contents identical, range reads plan a file subset") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    // ids 0..99 scattered round-robin across 5 files: every file spans
    // the whole id range, so a range read pre-cluster must plan all 5
    (0L until 100L).toDF("id").withColumn("v", col("id") * 7)
      .repartition(5).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val m0 = FileManifest.latest(fs, lake).get
    assert(m0.cur.size === 5)
    val pinned = History.readPinned(spark, lake) // PLANNED pre-cluster
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, Long)].collect().sortBy(_._1)
    val before = img(History.readPinned(spark, lake))

    val (retired, statted) = History.clusterBy(spark, lake, "id", 5)
    assert(retired === 5)
    assert(statted === 5)

    // rows moved, never folded: the clustered lake is bit-identical
    assert(img(History.readPinned(spark, lake)) === before)
    // each file now holds a tight range: a 20-id window plans 1-2 files
    val narrow = History.readPinnedRange(spark, lake, "id", 40L, 59L)
    assert(narrow.inputFiles.length <= 2,
      s"${narrow.inputFiles.length} files planned post-cluster")
    assert(img(narrow) === before.filter(r => r._1 >= 40 && r._1 <= 59))
    // a repeated stats-pruned plan parses the sidecar from CACHE — the
    // per-plan cost is one metadata RTT, not an O(lake-entries) re-read
    val statsBefore = graft.sources.FileStats.statsFileReads.get()
    History.readPinnedRange(spark, lake, "id", 40L, 59L).count(): Unit
    assert(graft.sources.FileStats.statsFileReads.get() === statsBefore,
      "repeated stats-pruned read must hit the parsed-sidecar cache")
    // keyed delete against the clustered layout touches one file
    val (nf, nr) = History.deleteWhere(spark, lake, col("id") === 42L)
    assert(nf === 1 && nr === 1L)
    // the scan planned before the cluster still sees its full snapshot
    assert(img(pinned) === before)
  }

  test("clusterByZ: box reads prune on every dimension; contents identical") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    // 64x64 grid scattered round-robin: pre-cluster every file spans
    // both full ranges, so NO box is prunable
    val grid = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, x * 64 + y)
    grid.toDF("x", "y", "payload").repartition(16).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("x", "y", "payload").as[(Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
    val before = img(History.readPinned(spark, lake))

    val (retired, statted) = History.clusterByZ(spark, lake,
      Seq("x", "y"), 16)
    assert(retired === 16 && statted === 16)

    // rows moved, never folded
    assert(img(History.readPinned(spark, lake)) === before)
    // a 16x16 box (1/16 of the area) plans a strict file subset — the
    // point of interleaving: BOTH dimensions prune, not just one
    val box = History.readPinnedBox(spark, lake,
      Seq(("x", 8L, 23L), ("y", 40L, 55L)))
    assert(box.inputFiles.length <= 8,
      s"${box.inputFiles.length} of 16 planned for a 1/16 box")
    assert(img(box) === before.filter(r =>
      r._1 >= 8 && r._1 <= 23 && r._2 >= 40 && r._2 <= 55))
    // each single dimension prunes too (Z keeps both spans tight)
    assert(History.readPinnedBox(spark, lake, Seq(("x", 0L, 15L)))
      .inputFiles.length < 16)
    assert(History.readPinnedBox(spark, lake, Seq(("y", 0L, 15L)))
      .inputFiles.length < 16)
    // a no-overlap box answers empty with schema intact
    assert(History.readPinnedBox(spark, lake,
      Seq(("x", 100L, 200L), ("y", 0L, 63L))).count() === 0L)
  }

  test("vacuum reclaims crashed copy-on-write staging leftovers past grace") {
    import spark.implicits._
    val lake = freshLake() + "/lake"
    Seq((1L, "x")).toDF("id", "v").write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    def plant(dir: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dir, "part-00000.parquet")
      fs.mkdirs(p.getParent): Unit
      val out = fs.create(p); out.write(1); out.close()
      p
    }
    val staleDel = plant(History.deleteStagingDir(lake))
    val staleMrg = plant(History.mergeStagingDir(lake))
    // within grace: a possibly-in-flight attempt's staging survives
    assert(History.vacuum(spark, lake, graceMs = 3600000L) === ((0, 0)))
    assert(fs.exists(staleDel) && fs.exists(staleMrg))
    // past grace: both reclaimed, emptied staging dirs dropped
    assert(History.vacuum(spark, lake, graceMs = 0L) === ((0, 2)))
    assert(!fs.exists(staleDel) && !fs.exists(staleMrg))
    assert(!fs.exists(staleDel.getParent) && !fs.exists(staleMrg.getParent))
    assert(History.readPinned(spark, lake).count() === 1L)
  }

  test("file stats prune within partitions; statless files stay planned") {
    import spark.implicits._
    val lake = freshLake()
    // two docs, 24h apart, SAME dt layout trick not needed — distinct
    // dt partitions each get a file, and within the manifest the stats
    // must let a narrow time range plan only the overlapping file
    val laterDoc = singleSiteDoc.replace("2019-10-03T15:43:00+10:00",
      "2019-10-04T15:43:00+10:00")
    History.writePartitioned(records(singleSiteDoc), lake)
    History.writePartitioned(records(laterDoc), lake, mode = "append")
    History.enableManifests(spark, lake): Unit
    val fs = hadoopFs(lake)
    val nFiles = FileManifest.latest(fs, lake).get.cur.size
    assert(nFiles >= 2)
    assert(History.refreshStats(spark, lake, ts) === nFiles)
    assert(History.refreshStats(spark, lake, ts) === 0) // incremental

    val all = History.readPinned(spark, lake)
    val Seq(t1, t2) = all.select(ts).distinct().collect()
      .map(_.getLong(0)).toSeq.sorted.toList match {
        case a :: b :: Nil => Seq(a, b)
        case other => fail(s"expected two distinct ts: $other")
      }
    // narrow range around t1: only t1's file is planned, result exact
    val narrow = History.readPinnedRange(spark, lake, ts, t1, t1)
    assert(narrow.inputFiles.length < nFiles,
      s"${narrow.inputFiles.length} vs $nFiles planned")
    assert(rows(narrow) === rows(all.filter(col(ts) === t1)))
    // full range plans everything and agrees with the plain pinned read
    assert(rows(History.readPinnedRange(spark, lake, ts, t1, t2)) ===
      rows(all))
    // a no-overlap range answers empty (schema intact, one file planned)
    assert(History.readPinnedRange(spark, lake, ts, t2 + 1, t2 + 2)
      .count() === 0L)

    // a file committed AFTER the refresh has no stats and must still be
    // planned by any range (correctness over pruning)
    val thirdDoc = singleSiteDoc.replace("2019-10-03T15:43:00+10:00",
      "2019-10-05T15:43:00+10:00")
    History.writePartitioned(records(thirdDoc), lake, mode = "append")
    FileManifest.addFiles(fs, lake, FileManifest.listLiveFiles(fs, lake))
    val t3 = History.readPinned(spark, lake).select(ts).agg(max(col(ts)))
      .collect()(0).getLong(0)
    assert(t3 > t2)
    val narrowAgain = History.readPinnedRange(spark, lake, ts, t1, t1)
    assert(rows(narrowAgain) === rows(all.filter(col(ts) === t1)))
    assert(narrowAgain.inputFiles.length === 2, // t1's file + statless file
      narrowAgain.inputFiles.mkString(","))
    // next refresh stats exactly the one new file, restoring the prune
    assert(History.refreshStats(spark, lake, ts) === 1)
    assert(History.readPinnedRange(spark, lake, ts, t1, t1)
      .inputFiles.length === 1)
  }

  test("footer-stat guards: DECIMAL refuses, pre-v2 sidecars discard, " +
      "renamed columns heal through the alias chain") {
    import spark.implicits._
    import graft.sources.{FileStats, SchemaLog}
    // DECIMAL-backed INT64: the footer stat is the UNSCALED long,
    // recorded under the DISTINCT UnscaledRange type — a plain-long
    // consumer (range pruning, BIGINT extrema) must never see it as
    // a LongRange, while the typed decimal reader serves it exactly
    val lake = java.nio.file.Files
      .createTempDirectory("graft-statguard").toString + "/lake"
    Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("56.78")))
      .toDF("id", "amount")
      .select(col("id"), col("amount").cast("decimal(10,2)").as("amount"))
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    History.refreshStats(spark, lake, "amount"): Unit
    val fs = hadoopFs(lake)
    val entries = FileStats.read(fs, lake)
      .collect { case ((_, c), v) if c == "amount" => v }
    assert(entries.nonEmpty && entries.forall(
        _.exists(_.isInstanceOf[FileStats.UnscaledRange])),
      s"decimal column must stat as UnscaledRange, got $entries")
    assert(entries.flatten === Seq(FileStats.UnscaledRange(1234L, 5678L)))
    // pre-v2 sidecar (no format header): discarded whole on read —
    // raw-millis timestamp entries must never be served as micros
    val statsP = new org.apache.hadoop.fs.Path(FileStats.statsPath(lake))
    val out = fs.create(statsP, true)
    try out.write("f.parquet\tid\t1\t2\n".getBytes("UTF-8"))
    finally out.close()
    assert(FileStats.read(fs, lake).isEmpty,
      "an unversioned sidecar must be discarded, not reinterpreted")
    // the next refresh republishes under v2 and serves again
    History.refreshStats(spark, lake, "id"): Unit
    assert(FileStats.read(fs, lake).exists { case ((_, c), v) =>
      c == "id" && v.isDefined })
    // RENAMED column: era-1 files hold the old physical name; the
    // refresh falls back through the alias chain, keyed to the new
    // name, so metadata extrema keep answering across the rename
    SchemaLog.declare(spark, lake): Unit
    SchemaLog.renameColumn(spark, lake, "id", "doc_key"): Unit
    History.refreshStats(spark, lake, "doc_key"): Unit
    val renamed = FileStats.read(fs, lake).collect {
      case ((_, c), Some(FileStats.LongRange(mn, mx)))
          if c == "doc_key" => (mn, mx)
    }
    assert(renamed.toSeq === Seq((1L, 2L)),
      s"alias-chain stats must serve the old files, got $renamed")
  }

  test("legacy retention: expire manifest is the commit point readers honor") {
    import spark.implicits._
    val lake = freshLake()
    val laterDoc = singleSiteDoc.replace("2019-10-03T15:43:00+10:00",
      "2019-10-04T15:43:00+10:00")
    History.writePartitioned(
      records(streamPayload + laterDoc + NUL), lake)
    val ledger = new Pipeline.FileBatchLedger(s"$lake/_ledger")
    ledger.markCommitted(3L)
    val fs = hadoopFs(lake)

    // simulate a crash mid-delete: the expire manifest is published but
    // the dirs still exist — a reader must already exclude them (no
    // partial-delete window), and recovery rolls the delete forward
    val pending = new org.apache.hadoop.fs.Path(
      History.expireManifestPath(lake))
    fs.mkdirs(pending.getParent): Unit
    val out = fs.create(pending, true)
    val doomed = new java.io.File(lake).listFiles()
      .filter(_.getName.startsWith("region=")).flatMap(_.listFiles())
      .filter(_.getName == "dt=2019-10-03")
      .map(d => d.getParentFile.getName + "/" + d.getName)
    try out.write(doomed.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val seen = History.readSnapshot(spark, lake)
      .select("dt").distinct().collect().map(_.get(0).toString).toSet
    assert(seen === Set("2019-10-04"), seen.mkString(","))
    assert(History.recoverExpire(spark, lake))
    assert(!fs.exists(pending))

    // and the normal path end-to-end on what remains: a no-match expire
    // is a no-op; expiring the rest leaves an empty (but readable) lake
    assert(History.expirePartitions(spark, lake,
      col("dt") === "1999-01-01").isEmpty)
    val gone = History.expirePartitions(spark, lake,
      col("dt") === "2019-10-04")
    assert(gone.nonEmpty)
    // every partition dir (and emptied region parent) is gone; the
    // ledger survives retention
    val remaining = new java.io.File(lake).listFiles()
      .map(_.getName).filter(_.startsWith("region=")).toSeq
    assert(remaining.isEmpty, remaining.mkString(","))
    assert(ledger.lastCommitted === 3L)
  }
}
