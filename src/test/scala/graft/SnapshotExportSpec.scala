package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** Snapshot export: a pinned/tagged version copied (distributed) into
  * an independent lake — reads identically, shares nothing with the
  * source, carries deletion vectors and the declared schema. */
class SnapshotExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def fresh(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/x"

  private def lake(): String = {
    import spark.implicits._
    val dir = fresh("graft-export-src")
    (0 until 3).foreach { i =>
      (0 until 8).map(j => (i * 8L + j, s"p${i % 2}"))
        .toDF("id", "part")
        .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)
    }
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("an exported tag survives the source's complete destruction") {
    val src = lake()
    History.tag(spark, src, "ship"): Unit
    History.deleteWhere(spark, src, col("id") % 3 === 0): Unit
    val dst = fresh("graft-export-dst")
    History.exportSnapshot(spark, src, dst, tag = Some("ship")): Unit
    // the export reads the EXACT tagged image...
    assert(ids(History.readPinned(spark, dst)) === (0L until 24L))
    // ...and keeps doing so after the source lake is obliterated
    History.deleteTag(spark, src, "ship"): Unit
    History.vacuum(spark, src, graceMs = 0L): Unit
    val fs = fsOf(src)
    fs.delete(new org.apache.hadoop.fs.Path(src), true): Unit
    graft.sources.DeletionVector.evictCache()
    assert(ids(History.readPinned(spark, dst)) === (0L until 24L),
      "the export must share no storage with the source")
    // partition layout survived → pruned reads work at the destination
    assert(ids(History.readPinnedPartitions(spark, dst,
      _ == "part=p0")) === (0L until 24L).filter(i => (i / 8) % 2 == 0))
  }

  test("deletion vectors travel with the export as metadata") {
    val src = lake()
    History.deleteKeysDV(spark, src, "id", Seq(4L, 17L)): Unit
    val dst = fresh("graft-export-dv")
    History.exportSnapshot(spark, src, dst): Unit
    val dm = FileManifest.latest(fsOf(dst), dst).get
    assert(dm.dvs.nonEmpty, "DV pointers must carry to the clone")
    assert(ids(History.readPinned(spark, dst)) ===
      (0L until 24L).filterNot(Set(4L, 17L)))
    // the clone folds its vectors independently of the source
    History.materializeDeletes(spark, dst): Unit
    assert(FileManifest.latest(fsOf(dst), dst).get.dvs.isEmpty)
    assert(ids(History.readPinned(spark, dst)) ===
      (0L until 24L).filterNot(Set(4L, 17L)))
    // and the source still has its own pointers
    assert(FileManifest.latest(fsOf(src), src).get.dvs.nonEmpty)
  }

  test("the declared schema travels: a mixed-era export projects eras") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val src = fresh("graft-export-evo")
    Seq((1L, 10), (2L, 20)).toDF("id", "n") // era 1: n is INT32
      .coalesce(1).write.parquet(src)
    History.enableManifests(spark, src): Unit
    History.declareSchema(spark, src): Unit
    val declared = History.declaredSchema(spark, src).get
    History.evolveSchema(spark, src, StructType(declared.fields.map {
      case f if f.name == "n" => f.copy(dataType = LongType)
      case f => f
    })): Unit
    History.append(spark, src, Seq((3L, 30L)).toDF("id", "n"),
      key = "era2"): Unit
    val dst = fresh("graft-export-evo-dst")
    History.exportSnapshot(spark, src, dst): Unit
    val got = History.readPinned(spark, dst)
    assert(got.schema("n").dataType === LongType,
      "the destination must project through the carried declaration")
    assert(got.select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("drop tombstones and rename aliases travel with the export") {
    import spark.implicits._
    val src = fresh("graft-export-ret")
    Seq((1L, 10L, 0.5), (2L, 20L, 0.7)).toDF("id", "n", "score")
      .coalesce(1).write.parquet(src)
    History.enableManifests(spark, src): Unit
    graft.sources.SchemaLog.declare(spark, src): Unit
    graft.sources.SchemaLog.dropColumn(spark, src, "score"): Unit
    graft.sources.SchemaLog.renameColumn(spark, src, "n", "n_chars"): Unit
    val dst = fresh("graft-export-ret-dst")
    History.exportSnapshot(spark, src, dst): Unit
    // the rename alias travels in the schema: era-1 files (physical
    // `n`) read back under the new name at the destination
    assert(History.readPinned(spark, dst).columns.toSeq ===
      Seq("id", "n_chars"))
    assert(History.readPinned(spark, dst).select("n_chars").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(10L, 20L))
    // the DROP tombstone travels too: the copied files still hold
    // `score`'s raw bytes, so re-adding the name at the destination
    // would resurrect them — it must refuse exactly like the source
    val destFs = fsOf(dst)
    val e = intercept[IllegalArgumentException] {
      graft.sources.SchemaLog.evolve(spark, dst,
        org.apache.spark.sql.types.StructType(
          graft.sources.SchemaLog.latest(destFs, dst).get.fields :+
            org.apache.spark.sql.types.StructField("score",
              org.apache.spark.sql.types.DoubleType)))
    }
    assert(e.getMessage.contains("retired"), e.getMessage)
  }

  test("export refuses an occupied destination and unknown references") {
    val src = lake()
    val dst = fresh("graft-export-occ")
    History.exportSnapshot(spark, src, dst): Unit
    intercept[IllegalArgumentException] {
      History.exportSnapshot(spark, src, dst): Unit
    }
    intercept[IllegalArgumentException] {
      History.exportSnapshot(spark, src, fresh("graft-export-x"),
        tag = Some("nope")): Unit
    }
    intercept[IllegalArgumentException] {
      History.exportSnapshot(spark, src, fresh("graft-export-y"),
        version = Some(99L)): Unit
    }
  }
}
