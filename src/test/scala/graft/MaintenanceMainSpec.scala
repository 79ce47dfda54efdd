package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History, IncrementalRollup}

/** The config-driven maintenance agent: one `runOnce` pass configured
  * purely through spark conf delivers the feed, advances a rollup,
  * retires small-file debt, and vacuums — the deployable shape of the
  * one-agent contract. */
class MaintenanceMainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/x"

  test("a conf-configured pass runs the whole maintenance contract") {
    import spark.implicits._
    val lake = fresh("graft-mm-lake")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_chars")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val feed = fresh("graft-mm-feed")
    val rollup = fresh("graft-mm-rollup")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("doc_id"), "n_chars"): Unit
    // baseline tick, then evolve: appends (small-file debt) + a DV
    // takedown — all through the conf surface from here on
    graft.stream.LakeChangeFeed.tick(spark, lake, feed): Unit
    (4 to 7).foreach { i =>
      History.append(spark, lake,
        Seq((i.toLong, i * 10L)).toDF("doc_id", "n_chars"),
        key = s"b$i"): Unit
    }
    History.deleteKeysDV(spark, lake, "doc_id", Seq(2L)): Unit
    def set(k: String, v: String): Unit =
      spark.conf.set(s"spark.graft.maintenance.$k", v)
    set("lake", lake)
    set("feedDir", feed)
    set("keyCols", "doc_id")
    set("rollups", s"$rollup|doc_id|n_chars")
    set("binPackTargetBytes", (1024L * 1024).toString)
    // grace must outlive the pass cadence (a zero grace would reclaim
    // the feed's baseline the moment vacuum's own publish supersedes
    // it — runOnce rejects it loudly)
    set("vacuumGraceMs", "60000")
    set("feedKeepRanges", "4")
    try {
      val range = MaintenanceMain.runOnce(spark)
      assert(range.isDefined, "the pass must deliver the pending range")
      // rollup advanced through appends AND the DV retraction
      val got = IncrementalRollup.read(spark, rollup)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 3L, 4L, 5L, 6L, 7L))
      // small-file debt retired in the same pass: binPack folded the
      // five appended files (and the DV) into one — a manifest-level
      // fact; the retired originals stay on disk inside the grace
      val fs = new org.apache.hadoop.fs.Path(lake).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(FileManifest.latest(fs, lake).get.cur.size === 1)
      assert(History.readPinned(spark, lake)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 3L, 4L, 5L, 6L, 7L))
      // a second pass is a clean no-op (nothing new to deliver)
      assert(MaintenanceMain.runOnce(spark).isEmpty)
      // and a zero grace is rejected up front, not discovered as a
      // wedged feed two passes later
      set("vacuumGraceMs", "0")
      intercept[IllegalArgumentException] {
        MaintenanceMain.runOnce(spark)
      }
    } finally {
      Seq("lake", "feedDir", "keyCols", "rollups", "binPackTargetBytes",
        "vacuumGraceMs", "feedKeepRanges")
        .foreach(k => spark.conf.unset(s"spark.graft.maintenance.$k"))
    }
  }

  test("malformed rollup and index specs fail loudly") {
    spark.conf.set("spark.graft.maintenance.rollups", "just-a-dir")
    try intercept[IllegalArgumentException] {
      MaintenanceMain.rollupSpecs(spark)
    } finally spark.conf.unset("spark.graft.maintenance.rollups")
    spark.conf.set("spark.graft.maintenance.vectorIndexes", "a|b")
    try intercept[IllegalArgumentException] {
      MaintenanceMain.indexSpecs(spark)
    } finally spark.conf.unset("spark.graft.maintenance.vectorIndexes")
    spark.conf.set("spark.graft.maintenance.textIndexes", "a|b|c|nope")
    try intercept[IllegalArgumentException] {
      MaintenanceMain.textIndexSpecs(spark)
    } finally spark.conf.unset("spark.graft.maintenance.textIndexes")
    spark.conf.set("spark.graft.maintenance.joinViews", "a|b|c")
    try intercept[IllegalArgumentException] {
      MaintenanceMain.joinViewSpecs(spark)
    } finally spark.conf.unset("spark.graft.maintenance.joinViews")
  }

  test("a conf-configured pass advances a maintained join view") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-mm-jv").toString
    val a = s"$base/a"
    val b = s"$base/b"
    val view = s"$base/view"
    (0L until 30L).map(i => (i % 10L, i)).toDF("k", "a_id")
      .coalesce(1).write.parquet(a)
    (0L until 10L).map(k => (k, s"d$k")).toDF("k", "b_name")
      .coalesce(1).write.parquet(b)
    History.enableManifests(spark, a): Unit
    History.enableManifests(spark, b): Unit
    graft.ext.JoinView.bootstrap(spark, a, b, view, "k"): Unit
    val feed = fresh("graft-mm-jv-feed")
    graft.stream.LakeChangeFeed.tick(spark, a, feed): Unit
    History.deleteKeysDV(spark, b, "k", Seq(2L)): Unit
    def set(k: String, v: String): Unit =
      spark.conf.set(s"spark.graft.maintenance.$k", v)
    set("lake", a)
    set("feedDir", feed)
    set("joinViews", s"$view|$a|$b|k")
    try {
      MaintenanceMain.runOnce(spark): Unit
      val got = graft.ext.JoinView.read(spark, view)
        .select("k", "a_id", "b_name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = History.readPinned(spark, a)
        .join(History.readPinned(spark, b), "k")
        .select("k", "a_id", "b_name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === want, "the daemon pass must tick the join view")
      assert(!got.exists(_._1 == 2L))
    } finally Seq("lake", "feedDir", "joinViews")
      .foreach(k => spark.conf.unset(s"spark.graft.maintenance.$k"))
  }

  test("a conf-configured pass advances a maintained band index") {
    import spark.implicits._
    val lake = fresh("graft-mm-bands-lake")
    (0L until 20L).map(i => (i, s"w$i a$i b$i c$i d$i e$i f$i"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val feed = fresh("graft-mm-bands-feed")
    val idx = fresh("graft-mm-bands-idx")
    graft.ext.BandIndex.bootstrap(spark, lake, idx): Unit
    graft.stream.LakeChangeFeed.tick(spark, lake, feed): Unit
    History.deleteKeysDV(spark, lake, "doc_id", Seq(4L)): Unit
    History.append(spark, lake,
      Seq((100L, "w100 a100 b100 c100 d100 e100 f100"))
        .toDF("doc_id", "text"), key = "mb"): Unit
    def set(k: String, v: String): Unit =
      spark.conf.set(s"spark.graft.maintenance.$k", v)
    set("lake", lake)
    set("feedDir", feed)
    set("textIndexes", s"$idx|doc_id|text|bands")
    try {
      assert(MaintenanceMain.runOnce(spark).isDefined)
      val got = graft.ext.BandIndex.read(spark, idx)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
      val want = graft.ext.BandIndex
        .deriveBands(History.readPinned(spark, lake))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(got === want,
        "the daemon pass must tick the band index to the corpus image")
    } finally Seq("lake", "feedDir", "textIndexes")
      .foreach(k => spark.conf.unset(s"spark.graft.maintenance.$k"))
  }

  test("a poisoned maintenance step cannot starve vacuum or feed expiry") {
    import spark.implicits._
    val lake = fresh("graft-mm-poison-lake")
    Seq((1L, 10L)).toDF("doc_id", "n_chars").coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val feed = fresh("graft-mm-poison-feed")
    graft.stream.LakeChangeFeed.tick(spark, lake, feed): Unit
    // retire a file: the COW delete rewrites its victim, leaving the
    // original data file reclaimable once past grace
    History.append(spark, lake,
      Seq((2L, 20L)).toDF("doc_id", "n_chars"), key = "b2"): Unit
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    val fs = new org.apache.hadoop.fs.Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(lake), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath.toString
        if (p.endsWith(".parquet") && !p.contains("_manifests")) b += p
      }
      b.result()
    }
    val before = dataFiles()
    def set(k: String, v: String): Unit =
      spark.conf.set(s"spark.graft.maintenance.$k", v)
    set("lake", lake)
    set("feedDir", feed)
    // POISON: a rollup dir that was never bootstrapped — its tick
    // throws every pass, the exact chronically-failing-spec scenario
    set("rollups", s"${fresh("graft-mm-poison-rollup")}|doc_id|n_chars")
    set("vacuumGraceMs", "1")
    set("feedKeepRanges", "1")
    Thread.sleep(50)
    try {
      // the pass still fails loudly (once-mode callers want that) ...
      val e = intercept[IllegalStateException] {
        MaintenanceMain.runOnce(spark)
      }
      assert(e.getMessage.contains("maintenance tick"))
      // ... but the shrink-side ops ADVANCED past the poisoned step:
      // vacuum reclaimed the delete-retired files past grace
      val after = dataFiles()
      assert(after.size < before.size,
        s"vacuum must still run under a poisoned rollup: " +
          s"${before.size} -> ${after.size} data files")
      // and feed expiry pruned delivered ranges down to the keep window
      val ranges = fs.listStatus(new org.apache.hadoop.fs.Path(feed))
        .map(_.getPath.getName).filter(_.startsWith("changes-"))
      assert(ranges.length === 1,
        s"expire must still run under a poisoned rollup: " +
          ranges.mkString(", "))
      // the lake itself stays correct throughout
      assert(History.readPinned(spark, lake)
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    } finally {
      Seq("lake", "feedDir", "rollups", "vacuumGraceMs", "feedKeepRanges")
        .foreach(k => spark.conf.unset(s"spark.graft.maintenance.$k"))
    }
  }
}
