package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History, LakeCatalog}

/** The CDC-apply MERGE shapes ([[graft.sources.GraftMergeCdcCommand]]):
  * `WHEN MATCHED [AND cond] THEN DELETE` alone or beside the upsert
  * pair, conditional INSERT arms, update-only and insert-only shapes —
  * composed from the engine's DV keyed delete + keyed COW merge with
  * standard MERGE semantics (matched-ness pinned at statement start,
  * duplicate source keys refused, NULL arm conditions three-valued). */
class MergeCdcSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    s
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Unpartitioned manifest lake with ids 1..5. */
  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mergecdc").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
        (4L, "de", 40L), (5L, "fr", 50L))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(2)
      .write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def rows(dir: String): Seq[(Long, String, Long)] =
    History.readPinned(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("WHEN MATCHED THEN DELETE lands matched keys as deletion vectors") {
    import spark.implicits._
    val dir = lake()
    val fs = fsOf(dir)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    // 2 and 4 exist (deleted); 99 does not (no-op, standard MERGE)
    Seq(2L, 4L, 99L).toDF("doc_id").createOrReplaceTempView("cdc_del")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_del s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN DELETE""")
    assert(rows(dir).map(_._1) === Seq(1L, 3L, 5L))
    val m = FileManifest.latest(fs, dir).get
    assert(m.cur.toSet === filesBefore, "DV delete rewrites no data file")
    assert(m.dvs.nonEmpty, "the delete landed as deletion vectors")
  }

  test("mixed CDC batch: conditional DELETE + UPDATE + conditional INSERT") {
    import spark.implicits._
    val dir = lake()
    // the classic Debezium replay: op flag decides the arm; the op
    // column is NOT part of the target image
    Seq((1L, "en", 111L, "U"),  // matched, op=U -> updated
        (2L, "en", 0L, "D"),    // matched, op=D -> deleted
        (6L, "it", 60L, "I"),   // unmatched, op!=D -> inserted
        (7L, "pt", 0L, "D"))    // unmatched, op=D -> NOT inserted
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_batch")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_batch s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED AND s.op = 'D' THEN DELETE
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *""")
    assert(rows(dir) === Seq((1L, "en", 111L), (3L, "de", 30L),
      (4L, "de", 40L), (5L, "fr", 50L), (6L, "it", 60L)))
  }

  test("a deleted key is never resurrected by an unconditional INSERT arm") {
    import spark.implicits._
    val dir = lake()
    // key 2 is matched and op=D: standard MERGE deletes it and never
    // reaches the NOT MATCHED clause — an implementation that
    // evaluates matched-ness AFTER the delete commit would see 2 as
    // unmatched and resurrect it through the unconditional INSERT
    Seq((2L, "en", 999L, "D"), (8L, "it", 80L, "I"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_resurrect")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_resurrect s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED AND s.op = 'D' THEN DELETE
                  WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(dir) === Seq((1L, "en", 10L), (3L, "de", 30L),
      (4L, "de", 40L), (5L, "fr", 50L), (8L, "it", 80L)))
  }

  test("update-only and insert-only shapes apply exactly their arm") {
    import spark.implicits._
    val dir = lake()
    // update-only: unmatched source rows must NOT insert
    Seq((1L, "en", 100L), (9L, "xx", 900L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_updonly")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_updonly s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *""")
    assert(rows(dir) === Seq((1L, "en", 100L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
    // insert-only (insert-if-absent): matched source rows must NOT
    // update
    Seq((1L, "en", 777L), (9L, "xx", 900L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_insonly")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_insonly s
                  ON t.doc_id = s.doc_id
                  WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(dir) === Seq((1L, "en", 100L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L),
      (9L, "xx", 900L)))
  }

  test("a NULL delete condition falls through to the UPDATE arm") {
    import spark.implicits._
    val dir = lake()
    // op NULL: `op = 'D'` is NULL -> not deleted -> updated (SQL
    // three-valued logic)
    Seq((1L, "en", 111L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_nullcond")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_nullcond s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED AND s.op = 'D' THEN DELETE
                  WHEN MATCHED THEN UPDATE SET *""")
    assert(rows(dir).head === (1L, "en", 111L))
  }

  test("arm conditions over target columns refuse loudly") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_tgtcond")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_tgtcond s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED AND t.n_chars > 20 THEN DELETE""")
    }
    assert(e.getMessage.contains("source columns"), e.getMessage)
    assert(rows(dir).size === 5)
  }

  test("duplicate source keys refuse across arms (ambiguous apply)") {
    import spark.implicits._
    val dir = lake()
    // key 1 appears once per arm: applying both delete and update to
    // one target row is the ambiguity standard MERGE refuses
    Seq((1L, "en", 0L, "D"), (1L, "en", 111L, "U"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_dup")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_dup s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED AND s.op = 'D' THEN DELETE
                    WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("WHEN NOT MATCHED BY SOURCE THEN DELETE: the full-sync shape") {
    import spark.implicits._
    val dir = lake()
    // source carries keys 1 (update image), 6 (insert); everything
    // else in the target must go — after the statement the lake IS
    // the source image
    Seq((1L, "en", 111L), (6L, "it", 60L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("sync_src")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_src s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *
                  WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows(dir) === Seq((1L, "en", 111L), (6L, "it", 60L)))
  }

  test("NOT MATCHED BY SOURCE with a target condition deletes its slice") {
    import spark.implicits._
    val dir = lake()
    // sync only the de partition's stragglers: target rows no source
    // key matches AND lang='de' delete; the fr row (also unmatched)
    // survives the guarded arm
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("sync_cond_src")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_cond_src s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED BY SOURCE AND t.lang = 'de'
                    THEN DELETE""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 20L),
      (5L, "fr", 50L)))
    // bare sync-delete (no other arms) also works
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_cond_src s
                  ON t.doc_id = s.doc_id
                  WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows(dir) === Seq((1L, "en", 111L)))
  }

  test("a constraint-violating upsert arm bounces the WHOLE statement " +
      "before any delete lands") {
    import spark.implicits._
    val dir = lake()
    graft.sources.Constraints.add(spark, dir, "chars_nonneg",
      "n_chars >= 0"): Unit
    val fs = fsOf(dir)
    val v0 = FileManifest.latest(fs, dir).get.version
    // the delete arm alone would succeed; the update arm carries a
    // violating row — statement atomicity demands the delete must NOT
    // have landed when the statement errors
    Seq((2L, "en", 0L, "D"), (1L, "en", -5L, "U"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_atomic_src")
    intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_atomic_src s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED AND s.op = 'D' THEN DELETE
                    WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(FileManifest.latest(fs, dir).get.version === v0,
      "no arm may commit when another arm's validation bounces")
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("a failure after a delete arm committed compensates with a " +
      "rollback to the statement's base version") {
    import spark.implicits._
    val dir = lake()
    // arm a two-stage hook: the delete arm's commit re-arms it, then
    // the MERGE flip's commit window gets a concurrent DV landing —
    // mergeInto conflicts loudly AFTER the delete arm already
    // committed, and the compensation must roll the lake back whole
    Seq((2L, "en", 0L, "D"), (1L, "en", 111L, "U"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_comp_src")
    FileManifest.testRaceHookPath = Some(dir)
    FileManifest.testRaceHook = Some { () =>
      FileManifest.testRaceHookPath = Some(dir)
      FileManifest.testRaceHook = Some { () =>
        History.deleteWhereDV(spark, dir, col("doc_id") === 4L): Unit
      }
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_comp_src s
                      ON t.doc_id = s.doc_id
                      WHEN MATCHED AND s.op = 'D' THEN DELETE
                      WHEN MATCHED THEN UPDATE SET *""")
      }
      // the statement's own delete (key 2) must NOT survive the
      // failed statement; the in-window concurrent takedown (key 4)
      // rolls back with it — the documented single-writer caveat
      assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 20L),
        (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
    } finally {
      FileManifest.testRaceHook = None
      FileManifest.testRaceHookPath = None
    }
  }

  test("a DV landing under the CDC merge's rewrite conflicts loudly") {
    import spark.implicits._
    val dir = lake()
    // a concurrent takedown vectors a row in a file the merge's COW
    // rewrite already scanned: committing the rewrite would resurrect
    // it, so the merge must conflict loudly (dvSeen declaration)
    Seq((1L, "en", 111L), (2L, "en", 222L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_race")
    FileManifest.testRaceHookPath = Some(dir)
    FileManifest.testRaceHook = Some { () =>
      History.deleteWhereDV(spark, dir, col("doc_id") === 2L): Unit
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_race s
                      ON t.doc_id = s.doc_id
                      WHEN MATCHED THEN UPDATE SET *
                      WHEN NOT MATCHED AND s.n_chars > 0 THEN INSERT *""")
      }
      // the concurrent takedown survived; the merge applied nothing
      assert(rows(dir) === Seq((1L, "en", 10L), (3L, "de", 30L),
        (4L, "de", 40L), (5L, "fr", 50L)))
    } finally {
      FileManifest.testRaceHook = None
      FileManifest.testRaceHookPath = None
    }
  }
}
