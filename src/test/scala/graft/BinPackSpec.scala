package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** Generic small-file compaction (OPTIMIZE): only dirs past the
  * small-file threshold rewrite, content is byte-identical (deletion
  * vectors materialized through), healthy files keep their identity. */
class BinPackSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def image(dir: String): Seq[(Long, String)] = {
    import spark.implicits._
    History.readPinned(spark, dir).select("id", "part")
      .as[(Long, String)].collect().sorted.toSeq
  }

  test("binPack retires small-file debt per dir, leaves healthy dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-binpack").toString + "/lake"
    // p0: four one-row files (debt); p1: a single file (healthy count)
    (0 until 4).foreach { i =>
      Seq((i.toLong, "p0")).toDF("id", "part")
        .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)
    }
    Seq((10L, "p1"), (11L, "p1")).toDF("id", "part")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)
    History.enableManifests(spark, dir): Unit
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    val p1Files = before.cur.filter(_.startsWith("part=p1"))
    val want = image(dir)
    val (in, out) = History.binPack(spark, dir,
      targetBytes = 1024L * 1024, minFiles = 2)
    assert(in === 4 && out === 1, s"packed $in -> $out")
    val after = FileManifest.latest(fs, dir).get
    assert(after.cur.count(_.startsWith("part=p0")) === 1)
    // the healthy dir's file identity is untouched
    assert(after.cur.filter(_.startsWith("part=p1")) === p1Files)
    assert(image(dir) === want, "binPack is layout-only")
    // converged: nothing left to pack
    assert(History.binPack(spark, dir, 1024L * 1024, 2) === ((0, 0)))
  }

  test("binPack materializes deletion vectors on the files it packs") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-binpack-dv").toString + "/lake"
    (0 until 3).foreach { i =>
      Seq((i.toLong, "p0"), (i + 100L, "p0")).toDF("id", "part")
        .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)
    }
    History.enableManifests(spark, dir): Unit
    History.deleteWhereDV(spark, dir, col("id") === 101L): Unit
    val fs = fsOf(dir)
    assert(FileManifest.latest(fs, dir).get.dvs.size === 1)
    val (in, _) = History.binPack(spark, dir, 1024L * 1024, 2)
    assert(in === 3)
    assert(FileManifest.latest(fs, dir).get.dvs.isEmpty,
      "packing a vectored file must fold and drop its pointer")
    assert(image(dir).map(_._1) === Seq(0L, 1L, 2L, 100L, 102L))
  }

  test("overwritePartitions restates exactly the batch's partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ow").toString + "/lake"
    Seq((1L, "p0"), (2L, "p0"), (10L, "p1"), (20L, "p2"))
      .toDF("id", "part")
      .repartition(2).write.partitionBy("part").parquet(dir)
    History.enableManifests(spark, dir): Unit
    // a DV on an UNTOUCHED partition must survive the restatement
    History.deleteWhereDV(spark, dir, col("id") === 20L): Unit
    val fs = fsOf(dir)
    val v0 = FileManifest.latest(fs, dir).get.version
    // restate p0 (new rows) and create p3; p1/p2 untouched
    val (parts, retired) = History.overwritePartitions(spark, dir,
      Seq((100L, "p0"), (101L, "p0"), (300L, "p3")).toDF("id", "part"),
      Seq("part"))
    assert(parts === 2 && retired >= 1)
    assert(image(dir) === Seq((10L, "p1"), (100L, "p0"), (101L, "p0"),
      (300L, "p3")).sorted)
    // pre-backfill image still answers via time travel (incl. its DV)
    assert(History.readPinned(spark, dir, v0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 10L))
    // wrong scheme fails loudly
    intercept[IllegalArgumentException] {
      History.overwritePartitions(spark, dir,
        Seq((1L, "x")).toDF("id", "other"), Seq("other")): Unit
    }
  }

  test("binPack packs an unpartitioned lake by byte target") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-binpack-flat").toString + "/lake"
    (0 until 5).foreach { i =>
      Seq((i.toLong, "x")).toDF("id", "part")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    History.enableManifests(spark, dir): Unit
    val (in, out) = History.binPack(spark, dir, 1024L * 1024, 2)
    assert(in === 5 && out === 1)
    assert(image(dir).map(_._1) === (0L until 5L))
  }
}
