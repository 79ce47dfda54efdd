package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Constraints, FileManifest, History, SchemaLog}

/** Declared CHECK constraints: committed as versioned lake metadata,
  * validated against existing data at add time, and enforced at every
  * data-adding write edge with ANSI CHECK semantics (only FALSE
  * violates; NULL passes; narrower batches evaluate as their read
  * image). */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-constraints").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L))
      .toDF("doc_id", "lang", "n_chars").coalesce(1).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("add/drop version the set; duplicates and unknown drops fail") {
    val dir = lake()
    val fs = fsOf(dir)
    assert(Constraints.current(fs, dir).isEmpty)
    assert(Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0") === 1L)
    assert(Constraints.add(spark, dir, "id_present",
      "doc_id IS NOT NULL") === 2L)
    assert(Constraints.current(fs, dir).map(_._1) ===
      Seq("chars_nonneg", "id_present"))
    intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0")
    }
    assert(Constraints.drop(spark, dir, "id_present") === 3L)
    assert(Constraints.current(fs, dir).map(_._1) === Seq("chars_nonneg"))
    intercept[IllegalArgumentException] {
      Constraints.drop(spark, dir, "nope")
    }
    // history retained: every version readable
    assert(Constraints.at(fs, dir, 2L).map(_._1) ===
      Seq("chars_nonneg", "id_present"))
  }

  test("an empty partitioned batch appends as a no-op, not a crash") {
    import spark.implicits._
    val dir = lake()
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    val v0 = FileManifest.latest(fsOf(dir), dir).get.version
    // zero rows + partitionBy stages NO parquet files: staged-bytes
    // validation must treat the fileless stage as trivially valid
    // instead of throwing 'Unable to infer schema'
    History.append(spark, dir,
      Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_chars")
        .where(lit(false)),
      key = "empty-batch", partitionCols = Seq("lang")): Unit
    assert(History.readPinned(spark, dir).count() === 3L)
    // still enforcing afterwards
    intercept[IllegalArgumentException] {
      History.append(spark, dir,
        Seq((9L, "en", -5L)).toDF("doc_id", "lang", "n_chars"),
        key = "bad-after-empty")
    }
    assert(History.readPinned(spark, dir).count() === 3L)
    assert(FileManifest.latest(fsOf(dir), dir).get.version >= v0)
  }

  test("a constraint the existing data violates is never committed") {
    val dir = lake()
    val e = intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "big_chars", "n_chars > 15")
    }
    assert(e.getMessage.contains("violated by existing data"))
    assert(Constraints.current(fsOf(dir), dir).isEmpty)
  }

  test("append enforcement: violating batch rejected whole, clean lands") {
    import spark.implicits._
    val dir = lake()
    val fs = fsOf(dir)
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    val v0 = FileManifest.latest(fs, dir).get.version
    val e = intercept[IllegalArgumentException] {
      History.append(spark, dir,
        Seq((4L, "en", 40L), (5L, "en", -1L))
          .toDF("doc_id", "lang", "n_chars"), key = "bad")
    }
    assert(e.getMessage.contains("chars_nonneg"))
    // rejected WHOLE: no version flip, image unchanged (the valid row
    // in the same batch did not land either)
    assert(FileManifest.latest(fs, dir).get.version === v0)
    assert(History.readPinned(spark, dir).count() === 3L)
    History.append(spark, dir,
      Seq((4L, "en", 40L)).toDF("doc_id", "lang", "n_chars"),
      key = "good"): Unit
    assert(History.readPinned(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
  }

  test("ANSI CHECK: NULL passes; IS NOT NULL expresses non-nullness") {
    import spark.implicits._
    val dir = lake()
    Constraints.add(spark, dir, "lang_known", "lang IN ('en', 'de')"): Unit
    // NULL lang → predicate NULL → passes (not FALSE)
    History.append(spark, dir,
      Seq((10L, null.asInstanceOf[String], 5L))
        .toDF("doc_id", "lang", "n_chars"), key = "nulllang"): Unit
    assert(History.readPinned(spark, dir).count() === 4L)
    // non-nullness must be said explicitly
    Constraints.add(spark, dir, "chars_present",
      "n_chars IS NOT NULL"): Unit
    intercept[IllegalArgumentException] {
      History.append(spark, dir,
        Seq((11L, "en", null.asInstanceOf[java.lang.Long]))
          .toDF("doc_id", "lang", "n_chars"), key = "nullchars")
    }
  }

  test("narrower batches evaluate as their read image (null-extended)") {
    import spark.implicits._
    val dir = lake()
    SchemaLog.declare(spark, dir): Unit
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    // a mid-evolution writer without n_chars: lands as NULL n_chars at
    // read → CHECK passes (NULL is not FALSE)
    History.append(spark, dir,
      Seq((20L, "fr")).toDF("doc_id", "lang"), key = "narrow"): Unit
    assert(History.readPinned(spark, dir).count() === 4L)
    // but an IS NOT NULL constraint on the missing column rejects a
    // narrow batch (fresh lake: the declared set must predate the
    // narrow write — existing-data validation correctly refuses it
    // afterwards, which the add on THIS lake now demonstrates too)
    intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "chars_present2", "n_chars IS NOT NULL")
    }
    val dir2 = lake()
    SchemaLog.declare(spark, dir2): Unit
    Constraints.add(spark, dir2, "chars_present2",
      "n_chars IS NOT NULL"): Unit
    val e = intercept[IllegalArgumentException] {
      History.append(spark, dir2,
        Seq((21L, "fr")).toDF("doc_id", "lang"), key = "narrow2")
    }
    assert(e.getMessage.contains("chars_present2"))
  }

  test("mergeInto and overwritePartitions enforce too") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-constraints-p").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "de", 20L))
      .toDF("doc_id", "lang", "n_chars")
      .write.partitionBy("lang").parquet(dir)
    History.enableManifests(spark, dir): Unit
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    intercept[IllegalArgumentException] {
      History.mergeInto(spark, dir,
        Seq((1L, "en", -5L)).toDF("doc_id", "lang", "n_chars"),
        Seq("doc_id"))
    }
    intercept[IllegalArgumentException] {
      History.overwritePartitions(spark, dir,
        Seq((3L, "en", -5L)).toDF("doc_id", "n_chars", "lang")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"))
    }
    // image unchanged by both rejections
    assert(History.readPinned(spark, dir).count() === 2L)
    assert(History.readPinned(spark, dir)
      .filter(col("n_chars") < 0).count() === 0L)
    // a clean merge passes
    History.mergeInto(spark, dir,
      Seq((1L, "en", 99L)).toDF("doc_id", "lang", "n_chars"),
      Seq("doc_id")): Unit
    assert(History.readPinned(spark, dir)
      .filter(col("doc_id") === 1L).head().getAs[Long]("n_chars") === 99L)
  }

  test("snapshot export carries the constraint set to the clone") {
    import spark.implicits._
    val dir = lake()
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    val dst = java.nio.file.Files
      .createTempDirectory("graft-constraints-export").toString + "/clone"
    History.exportSnapshot(spark, dir, dst): Unit
    assert(Constraints.current(fsOf(dst), dst).map(_._1) ===
      Seq("chars_nonneg"))
    // the clone ENFORCES: the source's data-quality contract travels
    intercept[IllegalArgumentException] {
      History.append(spark, dst,
        Seq((9L, "en", -1L)).toDF("doc_id", "lang", "n_chars"),
        key = "bad-clone")
    }
    assert(History.readPinned(spark, dst).count() === 3L)
  }

  test("malformed expressions and names fail loudly at add") {
    val dir = lake()
    intercept[Exception] {
      Constraints.add(spark, dir, "bad_col", "no_such_column > 0")
    }
    intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "tab\tname", "n_chars >= 0")
    }
    // a non-boolean expression is a typo, not a constraint — no silent
    // cast to "!= 0" semantics
    val e = intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "typo", "n_chars")
    }
    assert(e.getMessage.contains("not BOOLEAN"))
    assert(Constraints.current(fsOf(dir), dir).isEmpty)
  }

  test("restore cannot roll back past the active constraint set") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-constraints-r").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "en", -7L))
      .toDF("doc_id", "lang", "n_chars").coalesce(1).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    val v1 = graft.sources.FileManifest
      .latest(fsOf(dir), dir).get.version
    History.deleteWhere(spark, dir, col("n_chars") < 0): Unit
    Constraints.add(spark, dir, "chars_nonneg", "n_chars >= 0"): Unit
    // v1 holds the violating row: restoring to it would silently un-make
    // the constraint readers now trust
    val e = intercept[IllegalArgumentException] {
      History.restore(spark, dir, v1)
    }
    assert(e.getMessage.contains("violates the active constraint"))
    assert(History.readPinned(spark, dir).count() === 1L)
    // dropping the constraint re-opens the rollback
    Constraints.drop(spark, dir, "chars_nonneg"): Unit
    History.restore(spark, dir, v1): Unit
    assert(History.readPinned(spark, dir).count() === 2L)
  }

  test("racing adds surface as loud commit failures, never lost writes") {
    val dir = lake()
    val fs = fsOf(dir)
    // both racers resolve latest=0 and publish v1: the atomic
    // no-overwrite rename arbitrates — the loser throws, and the
    // committed set holds exactly the winner (a lost-update would
    // silently drop one constraint; retry-after-failure composes)
    val results = (0 until 2).map { i =>
      new Thread { var out: Either[Throwable, Long] = null
        override def run(): Unit =
          out = try Right(Constraints.add(spark, dir, s"c$i",
            "n_chars >= 0")) catch { case e: Throwable => Left(e) } }
    }
    results.foreach(_.start()); results.foreach(_.join(60000))
    // a racer still null after the join timed out is a hang — report
    // it as such instead of NPE-ing in the partition below
    val outs = results.map(t => Option(t.out).getOrElse(
      Left(new IllegalStateException("racer did not finish in 60s"))))
    val (failed, won) = outs.partition(_.isLeft)
    val cur = Constraints.current(fs, dir).map(_._1).toSet
    assert(won.nonEmpty, "at least one racer must commit")
    assert(cur.size === won.size,
      s"committed set $cur must hold exactly the winners")
    // a loser's retry composes onto the winner's version
    failed.zipWithIndex.foreach { case (_, i) =>
      Constraints.add(spark, dir, s"retry$i", "doc_id IS NOT NULL"): Unit
    }
    assert(Constraints.current(fs, dir).size ===
      won.size + failed.size)
  }

  test("a non-deterministic batch cannot smuggle violating rows") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-constraints-nd").toString + "/lake"
    Seq((1L, "en", 0.9), (2L, "de", 0.8))
      .toDF("doc_id", "lang", "score").coalesce(1).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    Constraints.add(spark, dir, "score_floor", "score >= 0.5"): Unit
    // rand() re-evaluates per job: a pre-write validation could see one
    // row set and land another — staged-bytes validation judges the
    // exact parquet that would publish, so EVERY accepted append's
    // landed rows satisfy the check, run after run
    (1 to 5).foreach { i =>
      val batch = Seq((i * 100L, "en"), (i * 100L + 1L, "fr"))
        .toDF("doc_id", "lang")
        .withColumn("score", rand())
      val accepted =
        try { History.append(spark, dir, batch, key = s"nd$i"); true }
        catch { case _: IllegalArgumentException => false }
      assert(History.readPinned(spark, dir)
        .filter(col("score") < 0.5).count() === 0L,
        s"attempt $i (accepted=$accepted) landed violating rows")
    }
  }
}
