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

  test("probe hash matches the build job's xxhash64, per built type") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    import spark.implicits._
    def sparkHash[T: org.apache.spark.sql.Encoder](v: T): Long =
      Seq(v).toDF("v")
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("v")))
        .head.getLong(0)
    assert(FileBloomIndex.probeHash(42L, LongType) === sparkHash(42L))
    assert(FileBloomIndex.probeHash("doc-42", StringType) ===
      sparkHash("doc-42"))
    // xxhash64 hashes Int and Long DIFFERENTLY — the probe must cast
    // the literal to the BUILT type or every probe is a false negative
    assert(sparkHash(42) !== sparkHash(42L))
    assert(FileBloomIndex.probeHash(42, LongType) === sparkHash(42L),
      "an Int probe against a Long-built index must hash as Long")
    assert(FileBloomIndex.probeHash(42L, IntegerType) === sparkHash(42),
      "a Long probe against an Int-built index must hash as Int")
    assert(FileBloomIndex.probeHash("42", LongType) === sparkHash(42L),
      "a numeric-string probe against a Long-built index casts through")
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

  test("a corrupted index shard weakens pruning, never drops rows") {
    val lake = scatteredLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    val fs = hadoopFs(lake)
    // the unpartitioned lake's one shard lives under the "." dir key
    val p = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexDir(lake, "doc_id"),
      FileBloomIndex.shardFileName("."))
    assert(fs.exists(p), "scattered lake must have a '.'-dir shard")
    val entries = FileBloomIndex.readAll(fs, lake, "doc_id")
    val victim = entries.keys.head
    val typeB64 = java.util.Base64.getEncoder.encodeToString(
      org.apache.spark.sql.types.LongType.json.getBytes("UTF-8"))
    // overwrite: one entry with junk filter bytes, one malformed line,
    // one entry with junk TYPE json — every failure mode must only
    // weaken pruning (plan the file), never drop rows
    val out = fs.create(p, true)
    out.write((s"$victim\tZ29vZA==\t$typeB64\n" +
      "not a valid line at all\n" +
      s"${entries.keys.drop(1).head}\tZ29vZA==\tbm90anNvbg==\n")
      .getBytes("UTF-8"))
    out.close()
    // victim's filter is malformed (answers true), every other file has
    // no entry (always planned): full scan, exact rows — never a loss
    val got = History.readPinnedKeyed(spark, lake, "doc_id", Seq(7L, 301L))
    assert(got.collect().map(_.getLong(0)).toSeq.sorted === Seq(7L, 301L))
  }

  /** 200 docs partitioned by lang with a STRING business key — the
    * takedown-list shape (URLs/UUIDs/content hashes, not numeric ids). */
  private def stringKeyLake(): String = {
    import spark.implicits._
    val lake = freshLake()
    (0L until 200L).map(i =>
      (i, s"url://host/${i}", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "url", "lang")
      .repartition(4)
      .write.partitionBy("lang").parquet(lake)
    History.enableManifests(spark, lake): Unit
    History.refreshKeyIndex(spark, lake, "url"): Unit
    lake
  }

  test("string-keyed lookup and takedown prune and hit exactly") {
    val lake = stringKeyLake()
    val got = History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/42", "url://host/77", "url://host/99999"))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      === Seq(42L, 77L))
    val all = History.readPinned(spark, lake).inputFiles.length
    assert(got.inputFiles.length < all,
      s"string-key content pruning must beat the $all-file scan")

    // string-keyed takedown: exactly the victims go
    val (files, rows) = History.deleteKeys(spark, lake, "url",
      Seq("url://host/42", "url://host/181", "url://host/99999"))
    assert(rows === 2L && files >= 1)
    val left = History.readPinned(spark, lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!left(42L) && !left(181L) && left.size === 198)
  }

  test("dir-pruned keyed read loads only the touched partitions' shards") {
    val lake = stringKeyLake()
    val fs = hadoopFs(lake)
    // warm nothing: fresh counters around a dir-pruned lookup
    val before = FileBloomIndex.shardReads.get()
    val got = History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/42"), dirPred = Some(_ == "lang=en"))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      Seq(42L))
    val delta = FileBloomIndex.shardReads.get() - before
    assert(delta <= 1L,
      s"a one-partition keyed read must load at most 1 shard, read $delta")
    // repeated read: served from the shard cache, zero physical reads
    val before2 = FileBloomIndex.shardReads.get()
    History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/42"), dirPred = Some(_ == "lang=en"))
      .count(): Unit
    assert(FileBloomIndex.shardReads.get() === before2,
      "repeated keyed read must hit the shard cache")
  }

  test("unrepresentable keys match nothing — never throw (ANSI default)") {
    // takedown lists mix key shapes; a URL probed against a Long-built
    // index cannot exist in the column, so the correct answer is "no
    // rows" — but a plain Cast under this build's ANSI default would
    // throw mid-prune (driver) or mid-filter (executors)
    val lake = scatteredLake()
    History.refreshKeyIndex(spark, lake, "doc_id"): Unit
    val got = History.readPinnedKeyed(spark, lake, "doc_id",
      Seq(42L, "url://host/not-a-number"))
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(42L))
    // all-unrepresentable: zero rows, schema intact
    val none = History.readPinnedKeyed(spark, lake, "doc_id",
      Seq("nope", "also-nope"))
    assert(none.count() === 0L && none.columns.contains("text"))
    // mixed takedown deletes exactly the representable victims
    val (_, rows) = History.deleteKeys(spark, lake, "doc_id",
      Seq(7L, "url://host/x"))
    assert(rows === 1L)
    val left = History.readPinned(spark, lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!left(7L) && left.size === 399)
    // all-unrepresentable takedown: clean no-op
    assert(History.deleteKeys(spark, lake, "doc_id",
      Seq("url://a", "url://b")) === ((0, 0L)))
  }

  test("a fully-pruned dirPred keeps the lake schema") {
    val lake = stringKeyLake()
    val none = History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/42"), dirPred = Some(_ == "lang=zz"))
    assert(none.columns.contains("doc_id") && none.columns.contains("url"),
      s"fully-pruned keyed read must keep the schema, got " +
        s"${none.columns.mkString(",")}")
    assert(none.count() === 0L)
  }

  test("vacuum reclaims the index shard of a vanished partition") {
    val lake = stringKeyLake()
    val fs = hadoopFs(lake)
    val deShard = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexDir(lake, "url"),
      FileBloomIndex.shardFileName("lang=de"))
    val enShard = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexDir(lake, "url"),
      FileBloomIndex.shardFileName("lang=en"))
    assert(fs.exists(deShard) && fs.exists(enShard))

    // delete every lang=de row: its files retire, the dir empties —
    // refresh would never touch it again, so only vacuum can reclaim
    // its (heavy) shard
    import org.apache.spark.sql.functions.col
    History.deleteWhere(spark, lake, col("lang") === "de"): Unit
    History.vacuum(spark, lake, graceMs = 0L): Unit
    assert(!fs.exists(deShard),
      "vanished partition's bloom shard must be vacuumed")
    assert(fs.exists(enShard),
      "live partition's bloom shard must survive vacuum")
    // the surviving index still prunes and answers exactly
    val got = History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/42", "url://host/43"))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      === Seq(42L), "43 was lang=de and is deleted")
  }

  test("refresh after files land in one partition rewrites one shard") {
    import spark.implicits._
    val lake = stringKeyLake()
    val fs = hadoopFs(lake)
    // land one manifest-committed file into lang=en only
    val extra = java.nio.file.Files
      .createTempDirectory("graft-keyidx-shardw").toString + "/out"
    Seq((9999L, "url://host/9999")).toDF("doc_id", "url")
      .coalesce(1).write.parquet(extra)
    val src = new java.io.File(extra).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(src.toString),
      new org.apache.hadoop.fs.Path(s"$lake/lang=en/part-late.parquet"))
    FileManifest.addFiles(fs, lake, Seq("lang=en/part-late.parquet"))

    val before = FileBloomIndex.shardWrites.get()
    assert(History.refreshKeyIndex(spark, lake, "url") === 1)
    assert(FileBloomIndex.shardWrites.get() - before === 1L,
      "a one-new-file refresh must rewrite exactly one shard")
    // and the other partition's shard bytes were untouched on disk
    val deShard = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexDir(lake, "url"),
      FileBloomIndex.shardFileName("lang=de"))
    val enShard = new org.apache.hadoop.fs.Path(
      FileBloomIndex.indexDir(lake, "url"),
      FileBloomIndex.shardFileName("lang=en"))
    assert(fs.exists(deShard) && fs.exists(enShard))
    val got = History.readPinnedKeyed(spark, lake, "url",
      Seq("url://host/9999"))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      Seq(9999L))
  }
}
