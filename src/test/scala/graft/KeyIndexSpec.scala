package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FileBloomIndex, FileManifest, History}

/** Per-file bloom key index: content pruning for point lookups on
  * unclustered lakes — the layout where range stats can't prune. */
class KeyIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshLake(): String =
    java.nio.file.Files.createTempDirectory("graft-keyidx").toString + "/lake"

  private def hadoopFs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 400 ids scattered round-robin over 8 files: every file spans the
    * id range (range stats useless), each id lives in exactly one. */
  private def scatteredLake(): String = {
    import spark.implicits._
    val lake = freshLake()
    (0L until 400L).map(i => (i, s"doc-$i"))
      .toDF("doc_id", "text")
      .repartition(8)
      .write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    lake
  }

  test("probe hash matches the build job's xxhash64") {
    import spark.implicits._
    val sparkSide = Seq(42L).toDF("v")
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("v")))
      .head.getLong(0)
    assert(FileBloomIndex.probeHash(42L) === sparkSide)
  }

  test("point lookup plans a file subset and returns exact rows") {
    val lake = scatteredLake()
    val indexed = History.refreshKeyIndex(spark, lake, "doc_id")
    assert(indexed === 8)
    assert(History.refreshKeyIndex(spark, lake, "doc_id") === 0) // idempotent

    val hit = History.readPinnedKeyed(spark, lake, "doc_id", Seq(42L))
    assert(hit.collect().map(_.getLong(0)).toSeq === Seq(42L))
    val nFiles = hit.inputFiles.length
    assert(nFiles < 8,
      s"content pruning must beat the full 8-file scan, planned $nFiles")

    // multi-key: exact rows, still pruned
    val multi = History.readPinnedKeyed(spark, lake, "doc_id",
      Seq(1L, 99L, 250L, 399L))
    assert(multi.collect().map(_.getLong(0)).toSeq.sorted ===
      Seq(1L, 99L, 250L, 399L))

    // absent key: zero rows (schema intact)
    val none = History.readPinnedKeyed(spark, lake, "doc_id", Seq(100000L))
    assert(none.count() === 0L && none.columns.contains("text"))
  }

  test("unindexed files are always planned — pruning only saves work") {
    import spark.implicits._
    val lake = scatteredLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    val fs = hadoopFs(lake)

    // land a manifest-committed file the index hasn't seen
    val extra = java.nio.file.Files
      .createTempDirectory("graft-keyidx-extra").toString + "/out"
    Seq((9999L, "doc-9999")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(extra)
    val src = new java.io.File(extra).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.copyFromLocalFile(
      new org.apache.hadoop.fs.Path(src.toString),
      new org.apache.hadoop.fs.Path(s"$lake/part-late.parquet"))
    FileManifest.addFiles(fs, lake, Seq("part-late.parquet"))

    // the unindexed file is planned (its row is found) even though no
    // filter exists for it
    val got = History.readPinnedKeyed(spark, lake, "doc_id", Seq(9999L))
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(9999L))

    // refresh indexes ONLY the new file
    assert(History.refreshKeyIndex(spark, lake, "doc_id") === 1)
    // after indexing, the lookup prunes down to ~the one file
    val pruned = History.readPinnedKeyed(spark, lake, "doc_id", Seq(9999L))
    assert(pruned.inputFiles.length < 9)
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(9999L))
  }

  test("deleteKeys: bloom-pruned takedown removes exactly the victims") {
    val lake = scatteredLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit

    val (files, rows) = History.deleteKeys(spark, lake, "doc_id",
      Seq(42L, 250L, 100000L)) // one absent key: must change nothing
    assert(rows === 2L)
    assert(files <= 2, s"two victims live in at most 2 files, got $files")

    val left = History.readPinned(spark, lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!left(42L) && !left(250L))
    assert(left.size === 398)

    // absent keys only: no-op commit, version unchanged
    val fs = hadoopFs(lake)
    val v = FileManifest.latestVersion(fs, lake).get
    assert(History.deleteKeys(spark, lake, "doc_id",
      Seq(70000L, 80000L)) === ((0, 0L)))
    assert(FileManifest.latestVersion(fs, lake).get === v)

    // time travel to the pre-delete version still answers
    assert(History.readPinned(spark, lake, 1L).count() === 400L)
  }

  test("a corrupted index line weakens pruning, never drops rows") {
    val lake = scatteredLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    val fs = hadoopFs(lake)
    val p = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexPath(lake, "doc_id"))
    // append garbage + overwrite one entry's bytes with junk base64
    val entries = FileBloomIndex.read(fs, lake, "doc_id")
    val victim = entries.keys.head
    val out = fs.create(p, true)
    out.write((s"$victim\tZ29vZA==\nnot a valid line at all\n")
      .getBytes("UTF-8"))
    out.close()
    // victim's filter is malformed (answers true), every other file has
    // no entry (always planned): full scan, exact rows — never a loss
    val got = History.readPinnedKeyed(spark, lake, "doc_id", Seq(7L, 301L))
    assert(got.collect().map(_.getLong(0)).toSeq.sorted === Seq(7L, 301L))
  }
}
