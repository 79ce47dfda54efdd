package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{DeletionVector, FileManifest, History}

/** Merge-on-read deletion vectors: a keyed takedown writes per-file
  * position sidecars + one manifest commit — ZERO data files rewritten
  * — and every reader (pinned, keyed, time travel, restore, change
  * feed, COW rewrites) answers the exact post-delete row set. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** A small multi-file lake: ids 0..29 over 3 files (no partitioning —
    * the layout where every file spans the id range). */
  private def lake(sharded: Boolean = false): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dv").toString + "/lake"
    (0 until 3).foreach { i =>
      (0 until 10).map(j => (i * 10L + j, s"doc-${i * 10 + j}", i.toLong))
        .toDF("id", "key", "batch")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    History.enableManifests(spark, dir): Unit
    if (sharded) History.enableShardedManifests(spark, dir): Unit
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("DV delete removes rows without touching any data file") {
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    val dataMtimes = before.cur.map { rel =>
      rel -> fs.getFileStatus(
        new org.apache.hadoop.fs.Path(dir, rel)).getModificationTime
    }.toMap
    val (files, rows) = History.deleteWhereDV(spark, dir,
      col("id") % 10 === 3) // one victim per file
    assert(files === 3 && rows === 3L)
    val after = FileManifest.latest(fs, dir).get
    // file set identical, three DV pointers attached, data bytes unmoved
    assert(after.curSet === before.curSet)
    assert(after.dvs.keySet === before.curSet)
    after.cur.foreach { rel =>
      assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, rel))
        .getModificationTime === dataMtimes(rel),
        s"data file $rel was rewritten by a merge-on-read delete")
    }
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(_ % 10 == 3))
    // time travel to the pre-delete version still answers in full
    assert(ids(History.readPinned(spark, dir, before.version)) ===
      (0L until 30L))
  }

  test("keyed DV takedown equals the COW result, including repeat unions") {
    val dir = lake()
    val (f1, r1) = History.deleteKeysDV(spark, dir, "id", Seq(4L, 14L))
    assert(f1 === 2 && r1 === 2L)
    // second vector on an already-vectored file must UNION positions
    val (f2, r2) = History.deleteKeysDV(spark, dir, "id", Seq(5L, 29L))
    assert(f2 === 2 && r2 === 2L)
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(4L, 14L, 5L, 29L)))
    // string keys ride the same typed path
    val (f3, r3) = History.deleteKeysDV(spark, dir, "key", Seq("doc-0"))
    assert(f3 === 1 && r3 === 1L)
    assert(!ids(History.readPinned(spark, dir)).contains(0L))
    // re-deleting already-deleted keys is a no-op (planManifest applied
    // the existing vectors to the victim scan)
    assert(History.deleteKeysDV(spark, dir, "id", Seq(4L)) === ((0, 0L)))
  }

  test("keyed pinned read and bloom-pruned lookups apply vectors") {
    val dir = lake()
    History.refreshKeyIndex(spark, dir, "id"): Unit
    History.deleteKeysDV(spark, dir, "id", Seq(7L, 8L)): Unit
    assert(ids(History.readPinnedKeyed(spark, dir, "id",
      Seq(6L, 7L, 8L, 9L))) === Seq(6L, 9L))
  }

  test("COW rewrites materialize through vectors instead of resurrecting") {
    val dir = lake()
    History.deleteWhereDV(spark, dir, col("id") === 11L): Unit
    // a COW delete of a DIFFERENT row in the same file must preserve
    // the vector's delete (the rewrite reads through it, pointer drops)
    History.deleteWhere(spark, dir, col("id") === 12L): Unit
    val fs = fsOf(dir)
    assert(FileManifest.latest(fs, dir).get.dvs.isEmpty)
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(11L, 12L)))
    // merge path: replacing a surviving row must not resurrect either
    import spark.implicits._
    History.deleteWhereDV(spark, dir, col("id") === 21L): Unit
    History.mergeInto(spark, dir,
      Seq((22L, "doc-22-fixed", 2L)).toDF("id", "key", "batch"),
      Seq("id")): Unit
    val latest = History.readPinned(spark, dir)
    assert(ids(latest) === (0L until 30L).filterNot(Set(11L, 12L, 21L)))
    assert(latest.filter(col("id") === 22L).select("key")
      .collect().head.getString(0) === "doc-22-fixed")
  }

  test("materializeDeletes folds vectors and drops pointers") {
    val dir = lake()
    History.deleteWhereDV(spark, dir, col("id").isin(1L, 2L, 25L)): Unit
    val fs = fsOf(dir)
    assert(FileManifest.latest(fs, dir).get.dvs.size === 2)
    val (files, rows) = History.materializeDeletes(spark, dir)
    assert(files === 2 && rows === 3L)
    val m = FileManifest.latest(fs, dir).get
    assert(m.dvs.isEmpty)
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(1L, 2L, 25L)))
    // threshold: only files at/above minDeletedRows rewrite
    History.deleteWhereDV(spark, dir, col("id").isin(5L, 6L, 15L)): Unit
    val (files2, _) = History.materializeDeletes(spark, dir,
      minDeletedRows = 2L)
    assert(files2 === 1)
    assert(FileManifest.latest(fs, dir).get.dvs.size === 1)
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(1L, 2L, 25L, 5L, 6L, 15L)))
  }

  test("restore travels across DV commits in both directions") {
    val dir = lake()
    val fs = fsOf(dir)
    val v0 = FileManifest.latest(fs, dir).get.version
    History.deleteWhereDV(spark, dir, col("id") === 9L): Unit
    val vDel = FileManifest.latest(fs, dir).get.version
    // restore BEFORE the takedown: un-deletes, metadata-only
    History.restore(spark, dir, v0): Unit
    assert(ids(History.readPinned(spark, dir)) === (0L until 30L))
    // restore back ONTO the takedown: re-deletes via the same sidecar
    History.restore(spark, dir, vDel): Unit
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(_ == 9L))
  }

  test("change feed carries DV deletes positionally, and restores as inserts") {
    val dir = lake()
    val fs = fsOf(dir)
    val v0 = FileManifest.latest(fs, dir).get.version
    History.deleteKeysDV(spark, dir, "id", Seq(3L, 17L)): Unit
    val v1 = FileManifest.latest(fs, dir).get.version
    val feed = History.changesBetween(spark, dir, v0, v1)
    val changes = feed.select("_change", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(changes === Seq(("delete", 3L), ("delete", 17L)))
    // un-delete via restore: the window's feed shows them as inserts
    History.restore(spark, dir, v0): Unit
    val v2 = FileManifest.latest(fs, dir).get.version
    val back = History.changesBetween(spark, dir, v1, v2)
      .select("_change", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(back === Seq(("insert", 3L), ("insert", 17L)))
    // and a mixed window (DV delete + append) unions both deltas
    import spark.implicits._
    History.deleteKeysDV(spark, dir, "id", Seq(5L)): Unit
    History.append(spark, dir,
      Seq((100L, "doc-100", 9L)).toDF("id", "key", "batch"),
      key = "late"): Unit
    val v3 = FileManifest.latest(fs, dir).get.version
    val mixed = History.changesBetween(spark, dir, v2, v3)
      .select("_change", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(mixed === Seq(("delete", 5L), ("insert", 100L)))
  }

  test("sharded manifests round-trip DV pointers through shard files") {
    val dir = lake(sharded = true)
    History.deleteWhereDV(spark, dir, col("id").isin(2L, 12L)): Unit
    val fs = fsOf(dir)
    val m = FileManifest.latest(fs, dir).get
    assert(m.dvs.size === 2)
    assert(FileManifest.isSharded(fs, dir, m.version))
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(2L, 12L)))
    // an unrelated append reuses untouched shards and keeps the dvs
    import spark.implicits._
    History.append(spark, dir,
      Seq((200L, "doc-200", 9L)).toDF("id", "key", "batch"),
      key = "b2"): Unit
    assert(FileManifest.latest(fs, dir).get.dvs === m.dvs)
    assert(ids(History.readPinned(spark, dir)) ===
      ((0L until 30L).filterNot(Set(2L, 12L)) :+ 200L).sorted)
  }

  test("vacuum reclaims superseded vectors, keeps referenced ones") {
    val dir = lake()
    val fs = fsOf(dir)
    History.deleteKeysDV(spark, dir, "id", Seq(4L)): Unit
    val dv1 = FileManifest.latest(fs, dir).get.dvs.values.head
    History.deleteKeysDV(spark, dir, "id", Seq(5L)): Unit // supersedes dv1
    val dv2 = FileManifest.latest(fs, dir).get.dvs.values.head
    assert(dv1 !== dv2)
    // both versions retained → both sidecars survive a grace-0 vacuum
    History.vacuum(spark, dir, graceMs = 0L): Unit
    val names0 = DeletionVector.listDvFiles(fs, dir).map(_._1).toSet
    assert(names0.contains(dv2))
    // age out the middle version: push new commits, vacuum again
    History.deleteWhere(spark, dir, col("id") === 6L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit
    val names = DeletionVector.listDvFiles(fs, dir).map(_._1).toSet
    assert(!names.contains(dv1),
      "superseded vector of a vacuumed version must be reclaimed")
    // the COW delete dropped the pointer; with its version aged out the
    // second vector goes too
    assert(!names.contains(dv2))
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 30L).filterNot(Set(4L, 5L, 6L)))
  }

  test("a tag pins its snapshot's vectors through aggressive vacuums") {
    val dir = lake()
    val fs = fsOf(dir)
    History.deleteKeysDV(spark, dir, "id", Seq(8L)): Unit
    History.tag(spark, dir, "hold"): Unit
    History.deleteWhere(spark, dir, col("id") === 9L): Unit // drops pointer
    History.vacuum(spark, dir, graceMs = 0L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit
    assert(ids(History.readTag(spark, dir, "hold")) ===
      (0L until 30L).filterNot(_ == 8L))
  }

  test("concurrent DV writers and rewrites conflict loudly, appends rebase") {
    val dir = lake()
    val fs = fsOf(dir)
    val m = FileManifest.latest(fs, dir).get
    History.deleteKeysDV(spark, dir, "id", Seq(3L)): Unit
    val rel = FileManifest.latest(fs, dir).get.dvs.keys.head
    // lost-update guard: a DV commit whose expectation predates the
    // takedown above must fail, not silently drop its deletes
    intercept[java.util.ConcurrentModificationException] {
      FileManifest.commitDelta(fs, dir, Nil, Nil,
        setDvs = Map(rel -> (None, "stale.dv")))
    }
    // rewrite-vs-DV guard: a rewrite that scanned before the takedown
    // (dvSeen = no vector) must not commit over the new vector
    intercept[java.util.ConcurrentModificationException] {
      FileManifest.commitDelta(fs, dir, Nil, Seq(rel),
        dvSeen = Map(rel -> None))
    }
    // a DV target retired by a concurrent rewrite: loud conflict
    intercept[java.util.ConcurrentModificationException] {
      FileManifest.commitDelta(fs, dir, Nil, Nil,
        setDvs = Map("region=zz/never.parquet" -> (None, "x.dv")))
    }
    // an unrelated APPEND between victim scan and DV commit rebases
    FileManifest.testRaceHook = Some(() => {
      import spark.implicits._
      History.append(spark, dir,
        Seq((300L, "doc-300", 9L)).toDF("id", "key", "batch"),
        key = "race"): Unit
    })
    History.deleteKeysDV(spark, dir, "id", Seq(14L)): Unit
    assert(ids(History.readPinned(spark, dir)) ===
      ((0L until 30L).filterNot(Set(3L, 14L)) :+ 300L).sorted)
    assert(m.dvs.isEmpty) // sanity: original manifest untouched
  }

  test("the dense-delete cap fails loudly toward the COW path") {
    val dir = lake()
    val e = intercept[IllegalArgumentException] {
      History.deleteWhereDV(spark, dir, col("id") < 20L, maxPositions = 5L)
    }
    assert(e.getMessage.contains("copy-on-write"))
    // nothing committed
    assert(ids(History.readPinned(spark, dir)) === (0L until 30L))
    assert(FileManifest.latest(fsOf(dir), dir).get.dvs.isEmpty)
  }

  test("the SQL catalog applies a DV-bearing snapshot's vectors") {
    val dir = lake()
    History.deleteKeysDV(spark, dir, "id", Seq(1L)): Unit
    spark.conf.set("spark.sql.catalog.dvlake",
      classOf[graft.sources.LakeCatalog].getName)
    // served through the engine's pinned-read plan (PinnedLakeTable):
    // the deleted row never surfaces in SQL results
    assert(spark.sql(s"SELECT count(*) FROM dvlake.`$dir`")
      .collect().head.getLong(0) === 29L)
    assert(spark.sql(s"SELECT count(*) FROM dvlake.`$dir` WHERE id = 1")
      .collect().head.getLong(0) === 0L)
    // materializing folds the vectors; the catalog returns to the
    // stock vectorized table with identical results
    History.materializeDeletes(spark, dir): Unit
    assert(FileManifest.latest(fsOf(dir), dir).get.dvs.isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM dvlake.`$dir`")
      .collect().head.getLong(0) === 29L)
  }

  test("a clustering rewrite folds vectors instead of resurrecting") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dv-part").toString + "/lake"
    (0 until 20).map(i => (i.toLong, s"d$i", "r1", "2024-01-01"))
      .toDF("id", "key", "region", "dt")
      .repartition(4).write.partitionBy("region", "dt").parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.deleteWhereDV(spark, dir, col("id").isin(2L, 7L)): Unit
    History.clusterBy(spark, dir, "id", numFiles = 2): Unit
    val fs = fsOf(dir)
    assert(FileManifest.latest(fs, dir).get.dvs.isEmpty,
      "a full rewrite must drop the pointers it materialized")
    assert(ids(History.readPinned(spark, dir)) ===
      (0L until 20L).filterNot(Set(2L, 7L)))
  }

  test("incremental rollup retracts DV deletes from the change feed") {
    import graft.sources.IncrementalRollup
    val dir = lake()
    val rollupDir = java.nio.file.Files
      .createTempDirectory("graft-dv-rollup").toString + "/rollup"
    IncrementalRollup.bootstrap(spark, dir, rollupDir,
      Seq("batch"), "id"): Unit
    History.deleteKeysDV(spark, dir, "id", Seq(3L, 14L, 15L)): Unit
    IncrementalRollup.tick(spark, dir, rollupDir, Seq("batch"), "id"): Unit
    val got = IncrementalRollup.read(spark, rollupDir)
      .select("batch", "n_rows", "sum_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = History.readPinned(spark, dir)
      .groupBy(col("batch")).agg(count(lit(1)), sum("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === want,
      "a rollup tick over a DV-only window must retract exactly the " +
        "vectored rows")
  }

  test("user predicates still push to the parquet scan under a DV filter") {
    val dir = lake()
    History.deleteKeysDV(spark, dir, "id", Seq(1L)): Unit
    val plan = History.readPinned(spark, dir)
      .filter(col("id") > 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,10)]"),
      s"the id predicate must reach the scan despite the DV filter:\n$plan")
    assert(plan.contains("dvdeleted"),
      s"the DV predicate must be present in the plan:\n$plan")
    // the DV predicate is codegen-native: the Filter carrying it must
    // sit INSIDE a WholeStageCodegen span, not fall back to interpreted
    // eval on the scan's hot path
    val codegenFilter = raw"\*\(\d+\) Filter".r
    val filterLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("dvdeleted"))
    assert(filterLine.exists(l => codegenFilter.findFirstIn(l).isDefined),
      s"dv_deleted filter must be whole-stage-codegen'd:\n$plan")
  }

  test("sidecar cache serves repeat reads; corrupt sidecars fail loudly") {
    val dir = lake()
    val fs = fsOf(dir)
    History.deleteKeysDV(spark, dir, "id", Seq(6L)): Unit
    val before = DeletionVector.dvFileReads.get()
    ids(History.readPinned(spark, dir)): Unit
    ids(History.readPinned(spark, dir)): Unit
    assert(DeletionVector.dvFileReads.get() === before,
      "the writer-populated cache must serve repeat pinned reads")
    // corrupt vector: truncated run count → loud IOException on read
    val name = FileManifest.latest(fs, dir).get.dvs.values.head
    val p = new org.apache.hadoop.fs.Path(
      DeletionVector.dvsDir(dir), name)
    val out = fs.create(p, true)
    out.write("file\tx\nn\t3\nr\t0\t1\n".getBytes("UTF-8")); out.close()
    DeletionVector.evictCache()
    val e = intercept[java.io.IOException] {
      DeletionVector.read(fs, dir, name)
    }
    assert(e.getMessage.contains("corrupt"))
  }

  test("corrupt run lengths fail BEFORE expansion, not at OOM") {
    val dir = lake()
    val fs = fsOf(dir)
    val dvs = new org.apache.hadoop.fs.Path(DeletionVector.dvsDir(dir))
    def writeDv(name: String, body: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dvs, name), true)
      out.write(body.getBytes("UTF-8")); out.close()
    }
    def corrupt(name: String, body: String): Unit = {
      writeDv(name, body)
      DeletionVector.evictCache()
      val e = intercept[java.io.IOException] {
        DeletionVector.read(fs, dir, name)
      }
      assert(e.getMessage.contains("corrupt"), e.getMessage)
    }
    // a run whose declared length would expand toward driver OOM must
    // throw on the run line itself (bounded by the declaration), in
    // microseconds — not loop 9e15 times first. The test completing at
    // all IS the assertion of early failure.
    corrupt("huge-run.dv", "file\tx\nn\t3\nr\t0\t9000000000000000\n")
    // a run before any `n` declaration (writer always declares first)
    corrupt("run-first.dv", "file\tx\nr\t0\t2\nn\t2\n")
    // an absurd declaration fails before anything allocates toward it
    corrupt("huge-n.dv", "file\tx\nn\t9000000000000000\nr\t0\t1\n")
    // negative / zero-length runs are malformed
    corrupt("neg-start.dv", "file\tx\nn\t2\nr\t-3\t2\n")
    corrupt("zero-len.dv", "file\tx\nn\t2\nr\t0\t0\n")
    // runs summing past the declaration fail on the overflowing line
    corrupt("over-decl.dv", "file\tx\nn\t2\nr\t0\t2\nr\t5\t1\n")
  }
}
