package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Constraints, FileManifest, History}

/** [[History.updateWhere]]: copy-on-write row UPDATE — file-granular
  * rewrites, SQL NULL semantics, partition moves, DV composition,
  * staged-bytes constraint validation, time travel. */
class UpdateWhereSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** lang-partitioned lake: one file per lang dir. */
  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-updwhere").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
        (4L, "de", 40L), (5L, "fr", 50L))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def rows(dir: String): Seq[(Long, String, Long)] =
    History.readPinned(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("updates exactly the matching rows, rewriting only their files") {
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    val (files, n) = History.updateWhere(spark, dir,
      col("lang") === "en" && col("doc_id") >= 2L,
      Seq("n_chars" -> (col("n_chars") * 10L)))
    assert((files, n) === (1, 1L))
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 200L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
    val after = FileManifest.latest(fs, dir).get
    // only the en file was touched: de and fr files survive unrewritten
    val untouched = before.cur.filterNot(_.startsWith("lang=en"))
    assert(untouched.forall(after.cur.contains),
      s"non-matching files must not rewrite: ${after.cur}")
    assert(!before.cur.filter(_.startsWith("lang=en"))
      .exists(after.cur.contains), "the matched file must retire")
    // time travel: the pre-update version still answers
    assert(History.readPinned(spark, dir, before.version)
      .filter(col("doc_id") === 2L).select("n_chars")
      .collect().map(_.getLong(0)).toSeq === Seq(20L))
  }

  test("NULL predicate keeps the row (SQL UPDATE semantics)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-updnull").toString + "/lake"
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("id", "v").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    // v > 15 is NULL for id=2: that row must stay unchanged
    val (_, n) = History.updateWhere(spark, dir, col("v") > 15L,
      Seq("v" -> lit(0L)))
    assert(n === 1L)
    val got = History.readPinned(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, Some(10L)), (2L, None), (3L, Some(0L))))
  }

  test("assigning a partition column moves the row to its new directory") {
    val dir = lake()
    val (_, n) = History.updateWhere(spark, dir, col("doc_id") === 5L,
      Seq("lang" -> lit("de")))
    assert(n === 1L)
    assert(rows(dir).filter(_._1 == 5L) === Seq((5L, "de", 50L)))
    // the row's bytes now live under lang=de (directory-encoded)
    val m = FileManifest.latest(fsOf(dir), dir).get
    assert(!m.cur.exists(_.startsWith("lang=fr")),
      s"the fr directory must empty out: ${m.cur}")
    // partition pruning on the NEW value finds the moved row
    assert(History.readPinned(spark, dir).filter(col("lang") === "de")
      .count() === 3L)
  }

  test("a constraint-violating update bounces whole") {
    val dir = lake()
    Constraints.add(spark, dir, "chars_pos", "n_chars > 0"): Unit
    val before = rows(dir)
    val m0 = FileManifest.latest(fsOf(dir), dir).get.version
    val e = intercept[IllegalArgumentException] {
      History.updateWhere(spark, dir, col("lang") === "de",
        Seq("n_chars" -> lit(-1L)))
    }
    assert(e.getMessage.contains("chars_pos"))
    assert(rows(dir) === before, "no row may land from a rejected update")
    assert(FileManifest.latest(fsOf(dir), dir).get.version === m0)
  }

  test("vectored-out rows neither update nor resurrect") {
    val dir = lake()
    History.deleteWhereDV(spark, dir, col("doc_id") === 1L): Unit
    val (_, n) = History.updateWhere(spark, dir, col("lang") === "en",
      Seq("n_chars" -> lit(777L)))
    assert(n === 1L, "the DV'd row must not count as updated")
    assert(rows(dir) === Seq((2L, "en", 777L), (3L, "de", 30L),
      (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("assignment values cast to the column's existing type") {
    val dir = lake()
    // an int literal assigned to the long column must land as long
    History.updateWhere(spark, dir, col("doc_id") === 3L,
      Seq("n_chars" -> lit(7))): Unit
    val df = History.readPinned(spark, dir)
    assert(df.schema("n_chars").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(rows(dir).filter(_._1 == 3L) === Seq((3L, "de", 7L)))
  }

  test("unknown columns and duplicate targets fail loudly, lake untouched") {
    val dir = lake()
    val before = rows(dir)
    intercept[IllegalArgumentException] {
      History.updateWhere(spark, dir, lit(true), Seq("nope" -> lit(1L)))
    }
    intercept[IllegalArgumentException] {
      History.updateWhere(spark, dir, lit(true),
        Seq("n_chars" -> lit(1L), "n_chars" -> lit(2L)))
    }
    assert(rows(dir) === before)
  }

  test("a DV landing mid-update conflicts loudly, never resurrects") {
    val dir = lake()
    // race: a takedown's deletion vector lands on the en file INSIDE
    // updateWhere's commit window — the update's rewrite scan did not
    // apply that vector, so letting the flip land would resurrect the
    // deleted row inside the rewritten file. The dvSeen declaration
    // must turn that into a loud conflict instead.
    FileManifest.testRaceHookPath = Some(dir)
    FileManifest.testRaceHook = Some(() =>
      History.deleteWhereDV(spark, dir, col("doc_id") === 1L): Unit)
    intercept[java.util.ConcurrentModificationException] {
      History.updateWhere(spark, dir, col("lang") === "en",
        Seq("n_chars" -> lit(0L)))
    }
    assert(FileManifest.testRaceHook.isEmpty, "hook must be consumed")
    // the takedown won; the update landed nothing
    assert(rows(dir) === Seq((2L, "en", 20L), (3L, "de", 30L),
      (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("updateKeys: bloom-pruned keyed correction, index-independent") {
    import spark.implicits._
    val dir = lake()
    History.refreshKeyIndex(spark, dir, "doc_id"): Unit
    val (_, n) = History.updateKeys(spark, dir, "doc_id",
      Seq(2L, 4L, 999L), Seq("n_chars" -> (col("n_chars") + 1L)))
    assert(n === 2L, "999 is absent; 2 and 4 update")
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 21L),
      (3L, "de", 30L), (4L, "de", 41L), (5L, "fr", 50L)))
    // absent keys only: a no-op, no version flip
    val v0 = FileManifest.latest(fsOf(dir), dir).get.version
    assert(History.updateKeys(spark, dir, "doc_id", Seq(777L),
      Seq("n_chars" -> lit(0L))) === ((0, 0L)))
    assert(FileManifest.latest(fsOf(dir), dir).get.version === v0)
    // a STALE index (rows appended since refresh) must only cost scan
    // width, never rows: the unindexed file is always scanned
    History.append(spark, dir,
      Seq((6L, "en", 60L)).toDF("doc_id", "lang", "n_chars"),
      key = "b2", partitionCols = Seq("lang")): Unit
    val (_, n2) = History.updateKeys(spark, dir, "doc_id", Seq(6L),
      Seq("n_chars" -> lit(61L)))
    assert(n2 === 1L)
    assert(rows(dir).filter(_._1 == 6L) === Seq((6L, "en", 61L)))
  }

  test("no matches is a no-op: no version bump, no rewrite") {
    val dir = lake()
    val v0 = FileManifest.latest(fsOf(dir), dir).get.version
    val (files, n) = History.updateWhere(spark, dir,
      col("doc_id") === 999L, Seq("n_chars" -> lit(0L)))
    assert((files, n) === (0, 0L))
    assert(FileManifest.latest(fsOf(dir), dir).get.version === v0)
  }
}
