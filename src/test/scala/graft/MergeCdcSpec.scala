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

  /** Run `body` on a fresh thread and join — the concurrent-writer
    * simulation must not share the statement thread, or the
    * publish-funnel commit witness would attribute its commit to the
    * statement. Failures rethrow on the caller. */
  private def onOtherThread(body: => Unit): Unit = {
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() =>
      try body catch { case e: Throwable => err = Some(e) })
    t.start(); t.join()
    err.foreach(throw _)
  }

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

  test("dense MERGE delete arms fall back to copy-on-write past the " +
      "DV cap (matched and by-source)") {
    import spark.implicits._
    val dir = lake()
    spark.conf.set("spark.graft.dml.dvMaxPositions", "1")
    try {
      // matched-delete frame route: multi-column key forces the frame
      // path (not the bloom key list); 2 victims > cap 1 → COW
      Seq((2L, "en"), (4L, "de")).toDF("doc_id", "lang")
        .createOrReplaceTempView("dense_del")
      spark.sql(s"""MERGE INTO lake.`$dir` t USING dense_del s
                    ON t.doc_id = s.doc_id AND t.lang = s.lang
                    WHEN MATCHED THEN DELETE""")
      assert(rows(dir).map(_._1) === Seq(1L, 3L, 5L))
      // by-source delete arm: 2 unmatched victims > cap 1 → COW
      Seq((1L, "en")).toDF("doc_id", "lang")
        .createOrReplaceTempView("dense_sync")
      spark.sql(s"""MERGE INTO lake.`$dir` t USING dense_sync s
                    ON t.doc_id = s.doc_id AND t.lang = s.lang
                    WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      assert(rows(dir).map(_._1) === Seq(1L))
    } finally spark.conf.unset("spark.graft.dml.dvMaxPositions")
  }

  test("WHEN NOT MATCHED BY SOURCE THEN UPDATE marks the rows the " +
      "source no longer carries (ordered, first-match-wins)") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L), (6L, "it", 60L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("sync_upd_src")
    // matched 1 updates; 6 inserts; unmatched 2..5 take the FIRST
    // by-source arm whose target condition holds: de rows mark -1,
    // everything else marks 0 — values are target-side expressions
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_upd_src s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *
                  WHEN NOT MATCHED BY SOURCE AND t.lang = 'de'
                    THEN UPDATE SET n_chars = -1
                  WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = 0""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 0L),
      (3L, "de", -1L), (4L, "de", -1L), (5L, "fr", 0L), (6L, "it", 60L)))
  }

  test("ordered by-source arms mix DELETE and UPDATE with pristine-row " +
      "condition evaluation") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("sync_mix_src")
    // unmatched 2..5: the DELETE arm takes n_chars >= 40 (ids 4, 5);
    // the UPDATE arm takes the remainder (2 → 21, 3 → 31). The update
    // value references the target row (n_chars + 1), and its arm
    // filter (!(n_chars >= 40)) must evaluate on PRISTINE rows
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_mix_src s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED BY SOURCE AND t.n_chars >= 40
                    THEN DELETE
                  WHEN NOT MATCHED BY SOURCE
                    THEN UPDATE SET n_chars = t.n_chars + 1""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 21L),
      (3L, "de", 31L)))
    // UPDATE arm FIRST, DELETE second: first-match-wins — row 2
    // (pristine 21 ≤ 30) takes the update to 121; the later DELETE
    // arm must judge the PRISTINE value (21, filtered out by !arm1),
    // never the updated 121 — while row 3 (pristine 31 > 30) falls
    // through to the DELETE honestly
    spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_mix_src s
                  ON t.doc_id = s.doc_id
                  WHEN NOT MATCHED BY SOURCE AND t.n_chars <= 30
                    THEN UPDATE SET n_chars = t.n_chars + 100
                  WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 121L)))
  }

  test("by-source UPDATE refusals: key reassignment, source-column " +
      "values, unreachable arms") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("sync_refuse_src")
    def bounce(sqlText: String, needle: String): Unit = {
      val e = intercept[UnsupportedOperationException] {
        spark.sql(sqlText)
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    // reassigning the ON key on an unmatched row could move it INTO
    // the source key set mid-statement
    bounce(s"""MERGE INTO lake.`$dir` t USING sync_refuse_src s
               ON t.doc_id = s.doc_id
               WHEN NOT MATCHED BY SOURCE THEN UPDATE SET doc_id = 99""",
      "key column")
    // the source row is absent by definition (Spark's analyzer refuses
    // source references in by-source arms before our rule sees them,
    // with its own error type — accept either refusal)
    intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_refuse_src s
                    ON t.doc_id = s.doc_id
                    WHEN NOT MATCHED BY SOURCE
                      THEN UPDATE SET n_chars = s.n_chars""")
    }: Unit
    // an arm after an unconditional by-source arm is dead code —
    // Spark's PARSER already rejects unconditional-then-more arm
    // lists, so the guard never reaches our reachable() check; assert
    // the statement bounces either way
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING sync_refuse_src s
                    ON t.doc_id = s.doc_id
                    WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = 0
                    WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }: Unit
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)),
      "every refusal must leave the lake untouched")
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
    // the delete arm (key 2) commits, then the UPDATE arm's SET
    // expression throws at evaluation time (ANSI divide-by-zero hits
    // only inside mergeInto — constraints ran upfront, there are
    // none): a failure with ONLY this statement's own commit in the
    // window, so the compensation must roll the lake back whole
    Seq((2L, "en", 0L, "D"), (1L, "en", 0L, "U"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_comp_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_comp_src s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED AND s.op = 'D' THEN DELETE
                    WHEN MATCHED THEN UPDATE SET n_chars = 100 div s.n_chars""")
    }
    assert(e.toString.toLowerCase.contains("divide"),
      s"expected the SET expression's divide-by-zero, got: $e")
    // the statement's own delete (key 2) must NOT survive the failed
    // statement — compensated by the metadata-only restore
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 20L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("the compensating rollback REFUSES over a concurrent writer's " +
      "in-window commit and surfaces the partial application loudly") {
    import spark.implicits._
    val dir = lake()
    // arm a two-stage hook: the delete arm's commit re-arms it, then
    // the MERGE flip's commit window gets a concurrent DV landing —
    // mergeInto conflicts loudly AFTER the delete arm already
    // committed. Restoring to the base version here would silently
    // revert the CONCURRENT writer's durable takedown (key 4), so the
    // compensation must refuse and name the foreign version instead.
    Seq((2L, "en", 0L, "D"), (1L, "en", 111L, "U"))
      .toDF("doc_id", "lang", "n_chars", "op")
      .createOrReplaceTempView("cdc_comp_refuse_src")
    FileManifest.testRaceHookPath = Some(dir)
    FileManifest.testRaceHook = Some { () =>
      FileManifest.testRaceHookPath = Some(dir)
      FileManifest.testRaceHook = Some { () =>
        // the concurrent writer must be a real OTHER THREAD: the
        // publish-funnel commit witness is thread-local, so a same-
        // thread hook commit would be (wrongly, for this simulation)
        // attributed to the statement itself
        onOtherThread {
          History.deleteWhereDV(spark, dir, col("doc_id") === 4L): Unit
        }
      }
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_comp_refuse_src s
                      ON t.doc_id = s.doc_id
                      WHEN MATCHED AND s.op = 'D' THEN DELETE
                      WHEN MATCHED THEN UPDATE SET *""")
      }
      assert(e.getSuppressed.exists(s =>
          s.getMessage.contains("concurrent writer") &&
            s.getMessage.contains("PARTIALLY applied")),
        "the refused compensation must surface the partial state: " +
          e.getSuppressed.map(_.getMessage).mkString(" | "))
      // key 2: our committed delete arm survives (partial application,
      // surfaced loudly); key 4: the concurrent takedown survives (the
      // one thing the old restore-to-base would have reverted)
      assert(rows(dir) === Seq((1L, "en", 10L), (3L, "de", 30L),
        (5L, "fr", 50L)))
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
      // other-thread for the same reason as the refused-compensation
      // test: a concurrent writer is never the statement's own thread
      onOtherThread {
        History.deleteWhereDV(spark, dir, col("doc_id") === 2L): Unit
      }
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

  test("a partial SET list keeps unassigned columns byte-identical " +
      "(the Debezium column-subset feed)") {
    import spark.implicits._
    val dir = lake()
    // the feed carries only the changed column (n_chars); lang is NOT
    // in the source image at all and must survive untouched
    Seq((1L, 111L), (3L, 333L)).toDF("doc_id", "n_chars")
      .createOrReplaceTempView("cdc_partial")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_partial s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 20L),
      (3L, "de", 333L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("conditional UPDATE arms apply first-match-wins in statement " +
      "order, each with its own SET list") {
    import spark.implicits._
    val dir = lake()
    // key 1: op=A -> first arm (set n_chars); key 3: op=B -> second
    // arm (set lang); key 4: op=C -> no arm matches, row untouched
    Seq((1L, "A", "zz", 111L), (3L, "B", "yy", 333L),
        (4L, "C", "xx", 444L))
      .toDF("doc_id", "op", "lang", "n_chars")
      .createOrReplaceTempView("cdc_condupd")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_condupd s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED AND s.op = 'A'
                    THEN UPDATE SET n_chars = s.n_chars
                  WHEN MATCHED AND s.op = 'B'
                    THEN UPDATE SET lang = s.lang""")
    assert(rows(dir) === Seq((1L, "en", 111L), (2L, "en", 20L),
      (3L, "yy", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("SET values may be arbitrary source-side expressions") {
    import spark.implicits._
    val dir = lake()
    Seq((2L, 7L)).toDF("doc_id", "delta")
      .createOrReplaceTempView("cdc_expr")
    // delta is a source column OUTSIDE the target image; the value is
    // a computed expression over it
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_expr s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET n_chars = s.delta * 100 + 1""")
    assert(rows(dir) === Seq((1L, "en", 10L), (2L, "en", 701L),
      (3L, "de", 30L), (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("a partial INSERT column list fills unassigned columns with NULL") {
    import spark.implicits._
    val dir = lake()
    Seq((7L, "it", 70L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_partins")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_partins s
                  ON t.doc_id = s.doc_id
                  WHEN NOT MATCHED THEN INSERT (doc_id, lang)
                    VALUES (s.doc_id, s.lang)""")
    val got = History.readPinned(spark, dir)
      .filter(col("doc_id") === 7L).collect()
    assert(got.length === 1)
    assert(got.head.getString(1) === "it")
    assert(got.head.isNullAt(2), "unassigned n_chars must be NULL")
  }

  test("NULL-keyed source rows are exempt from the duplicate-key " +
      "refusal and each takes the NOT MATCHED arm") {
    import spark.implicits._
    val dir = lake()
    // two NULL-keyed rows: standard MERGE matches them to nothing —
    // no ambiguity, both insert
    Seq((null.asInstanceOf[java.lang.Long], "n1", 1L),
        (null.asInstanceOf[java.lang.Long], "n2", 2L),
        (1L: java.lang.Long, "en", 111L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_nullkey")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_nullkey s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    val got = History.readPinned(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq((-1L, "n1", 1L), (-1L, "n2", 2L),
      (1L, "en", 111L), (2L, "en", 20L), (3L, "de", 30L),
      (4L, "de", 40L), (5L, "fr", 50L)))
  }

  test("MERGE into an EMPTY undeclared lake inserts every source row " +
      "(no zero-column pin failure)") {
    import spark.implicits._
    // a TRUNCATED lake: current file set empty, schema only derivable
    // from retired files — the empty-target shape a SQL session can
    // actually reach (a never-written lake has no columns for the ON
    // clause to resolve at analysis)
    val dir = lake()
    spark.sql(s"DELETE FROM lake.`$dir`")
    assert(rows(dir).isEmpty)
    Seq((1L, "en", 10L), (2L, "de", 0L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_empty")
    // mixed arms: delete/update no-op against an empty target, the
    // conditional insert applies — standard MERGE
    spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_empty s
                  ON t.doc_id = s.doc_id
                  WHEN MATCHED AND s.n_chars = 0 THEN DELETE
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED AND s.n_chars > 0 THEN INSERT *""")
    assert(rows(dir) === Seq((1L, "en", 10L)))
  }

  test("reassigning a key column to anything but its source image " +
      "refuses (row identity under the keyed merge)") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_keyset")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_keyset s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED THEN UPDATE SET doc_id = s.doc_id + 1000""")
    }
    assert(e.getMessage.contains("key column"), e.getMessage)
    assert(rows(dir).size === 5)
  }

  test("SET values over target columns refuse loudly (replay against " +
      "the source frame)") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, 5L)).toDF("doc_id", "delta")
      .createOrReplaceTempView("cdc_tgtval")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_tgtval s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + s.delta""")
    }
    assert(e.getMessage.contains("target columns"), e.getMessage)
  }

  test("an arm after an unconditional arm refuses (unreachable)") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en", 111L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("cdc_unreach")
    // Spark's PARSER rejects this shape already ("only the last
    // MATCHED clause can omit the condition"); the rule's own
    // reachability check guards catalog-API constructions of the plan
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_unreach s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
                    WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.toLowerCase.contains("unreachable") ||
      e.getMessage.toLowerCase.contains("omit the condition") ||
      e.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
      e.toString)
  }

  test("engine mergeInto inserts into a truncated DECLARED lake (the " +
      "schema-bearing empty plan has no _metadata to scan)") {
    import spark.implicits._
    // a CREATE TABLE'd lake: declared schema, ZERO current files —
    // exactly the shape whose planManifest is a schema-bearing
    // LocalRelation with no _metadata pseudo-column
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mergecdc-decl").toString + "/lake"
    spark.sql(s"""CREATE TABLE lake.`$dir`
                  (doc_id BIGINT, lang STRING, n_chars BIGINT)
                  USING parquet""")
    assert(FileManifest.latest(fsOf(dir), dir).get.cur.isEmpty)
    // pre-fix this crashed resolving _metadata.file_path against the
    // declared-schema LocalRelation (round-16 renames-fuzz find)
    val (_, replaced) = History.mergeInto(spark, dir,
      Seq((9L, "it", 90L)).toDF("doc_id", "lang", "n_chars"),
      Seq("doc_id"))
    assert(replaced === 0L)
    assert(rows(dir) === Seq((9L, "it", 90L)))
  }

  test("a partial update against a multi-copy matched key refuses " +
      "through the duplicate-key check (documented deviation)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mergecdc-multi").toString + "/lake"
    // TWO target copies of key 1: a whole-row arm supersedes both
    // (upsert-by-key); a PARTIAL arm would need each copy's own
    // unassigned values — refusing beats silently collapsing copies
    Seq((1L, "en", 10L), (1L, "de", 11L), (2L, "fr", 20L))
      .toDF("doc_id", "lang", "n_chars").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    Seq((1L, 111L)).toDF("doc_id", "n_chars")
      .createOrReplaceTempView("cdc_multicopy")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING cdc_multicopy s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars""")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }
}
