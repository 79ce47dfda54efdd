package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** Snapshot tags — named retention pins: a tagged version survives
  * vacuum in full (root + every data file it references), however far
  * past grace; deleting the tag releases the pin and the next vacuum
  * reclaims normally. */
class SnapshotTagSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tag").toString + "/lake"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def ids(dir: String, v: Option[Long] = None,
                  tag: Option[String] = None): Seq[Long] =
    (tag match {
      case Some(t) => History.readTag(spark, dir, t)
      case None => v.map(History.readPinned(spark, dir, _))
        .getOrElse(History.readPinned(spark, dir))
    }).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("a tagged snapshot survives an aggressive vacuum intact") {
    val dir = lake()
    val v1 = History.tag(spark, dir, "training-v1")
    History.deleteWhere(spark, dir, col("id") === 1L): Unit
    // grace 0: everything untagged and retired is reclaimable NOW
    History.vacuum(spark, dir, graceMs = 0L): Unit
    // latest reads the post-delete image...
    assert(ids(dir) === Seq(0L, 2L))
    // ...while the tag still reads the EXACT pre-delete multiset —
    // vacuum kept its root and its data files despite grace 0
    assert(ids(dir, tag = Some("training-v1")) === Seq(0L, 1L, 2L))
    assert(History.tags(spark, dir) === Seq(("training-v1", v1)))
    // repeated vacuums don't erode the pin
    History.vacuum(spark, dir, graceMs = 0L): Unit
    assert(ids(dir, tag = Some("training-v1")) === Seq(0L, 1L, 2L))
  }

  test("deleting the tag releases the pin") {
    val dir = lake()
    History.tag(spark, dir, "hold"): Unit
    History.deleteWhere(spark, dir, col("id") === 1L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit
    assert(ids(dir, tag = Some("hold")) === Seq(0L, 1L, 2L))
    assert(History.deleteTag(spark, dir, "hold"))
    History.vacuum(spark, dir, graceMs = 0L): Unit
    // the pinned version's root and victim file are now reclaimed
    val fs = fsOf(dir)
    assert(FileManifest.versions(fs, dir).size === 1,
      "untagged old versions must age out at grace 0")
    intercept[IllegalArgumentException] {
      History.readTag(spark, dir, "hold")
    }
    assert(ids(dir) === Seq(0L, 2L))
  }

  test("duplicate and malformed tags fail loudly; unknown is typed") {
    val dir = lake()
    History.tag(spark, dir, "t1"): Unit
    intercept[IllegalArgumentException] { History.tag(spark, dir, "t1") }
    intercept[IllegalArgumentException] {
      History.tag(spark, dir, "../escape")
    }
    intercept[IllegalArgumentException] {
      History.tag(spark, dir, "nope", version = Some(99L))
    }
    assert(!History.deleteTag(spark, dir, "never-created"))
  }

  test("restore rolls back a bad delete without touching data files") {
    val dir = lake()
    val fs = fsOf(dir)
    val v1 = FileManifest.latest(fs, dir).get.version
    History.deleteWhere(spark, dir, col("id") =!= 0L): Unit // "oops"
    assert(ids(dir) === Seq(0L))
    val dataFilesBefore = FileManifest.listLiveFiles(fs, dir).toSet
    val v3 = History.restore(spark, dir, v1)
    // metadata-only: not one data file appeared or vanished
    assert(FileManifest.listLiveFiles(fs, dir).toSet === dataFilesBefore)
    assert(ids(dir) === Seq(0L, 1L, 2L))
    assert(FileManifest.latest(fs, dir).get.version === v3)
    // the undone state stays time-travelable (REDO window = grace)
    assert(ids(dir, v = Some(v3 - 1)) === Seq(0L))
    val redo = History.restore(spark, dir, v3 - 1)
    assert(ids(dir) === Seq(0L))
    assert(redo === v3 + 1)
    // restoring to the current version is a no-op
    assert(History.restore(spark, dir, redo) === redo)
  }

  test("restore past a vacuumed version fails loudly") {
    val dir = lake()
    val fs = fsOf(dir)
    val v1 = FileManifest.latest(fs, dir).get.version
    History.deleteWhere(spark, dir, col("id") === 1L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit // v1's victim file gone
    val e = intercept[Exception] { History.restore(spark, dir, v1) }
    assert(e.getMessage.contains("restore"))
    // unknown version is its own loud failure
    intercept[IllegalArgumentException] { History.restore(spark, dir, 99L) }
  }

  test("a tag pins a SHARDED version and its shard files") {
    val dir = lake()
    History.enableShardedManifests(spark, dir): Unit
    History.tag(spark, dir, "sharded-pin"): Unit
    History.deleteWhere(spark, dir, col("id") === 0L): Unit
    History.vacuum(spark, dir, graceMs = 0L): Unit
    assert(ids(dir, tag = Some("sharded-pin")) === Seq(0L, 1L, 2L))
    assert(ids(dir) === Seq(1L, 2L))
  }

  test("describeHistory: one metadata row per retained version, exact deltas") {
    import spark.implicits._
    val dir = lake() // 3 files at v1
    val v1 = FileManifest.latestVersion(fsOf(dir), dir).get
    History.tag(spark, dir, "pinned"): Unit
    History.append(spark, dir, Seq((7L, "row7")).toDF("id", "tag"),
      key = "dh1"): Unit
    History.deleteWhere(spark, dir, col("id") === 1L): Unit
    val h = History.describeHistory(spark, dir)
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(v1, v1 + 1, v1 + 2))
    // v1: 3 files, all "added" relative to nothing, tagged
    assert(h(0).getLong(2) === 3L && h(0).getLong(4) === 3L)
    assert(h(0).getString(6) === "pinned")
    // append: +1 file, nothing removed, nothing retired yet
    assert(h(1).getLong(4) === 1L && h(1).getLong(5) === 0L)
    // COW delete: the rewritten file replaces the matched one
    assert(h(2).getLong(5) >= 1L && h(2).getLong(3) >= 1L)
    // commit times are real and monotone (rename instants)
    assert(h.map(_.getLong(1)).toSeq ===
      h.map(_.getLong(1)).toSeq.sorted)
    assert(h.forall(_.getLong(1) > 0L))
    // no merge-on-read deletes here: every version reports zero vectors
    assert(h.forall(_.getLong(7) === 0L))
    // a DV takedown surfaces in the version's n_dv_files
    History.deleteWhereDV(spark, dir, col("id") === 2L): Unit
    val h2 = History.describeHistory(spark, dir)
      .orderBy("version").collect()
    assert(h2.last.getLong(7) === 1L)
  }
}
