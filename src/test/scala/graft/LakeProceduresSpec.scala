package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History, LakeCatalog}

/** SQL `CALL` maintenance surface ([[graft.sources.LakeProcedures]]):
  * every lifecycle operator runs from a SQL-only session through the
  * SAME engine implementation, returns its result counters as rows,
  * and composes with the rest of the SQL surface (constraints declared
  * via CALL bounce a violating INSERT; a CALL'd tag serves time
  * travel; a CALL'd vacuum respects it). */
class LakeProceduresSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    s
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-callproc").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
        (4L, "de", 40L), (5L, "fr", 50L))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def call(sql: String): Seq[Any] =
    spark.sql(sql).collect().head.toSeq

  test("repartition_lake re-grains the layout: pruned reads follow the " +
      "new scheme, pre-change snapshots still answer") {
    import spark.implicits._
    val dir = lake() // lang-partitioned, no declaration
    val fs = fsOf(dir)
    val v0 = FileManifest.latest(fs, dir).get.version
    spark.sql(s"CALL lake.tag('$dir', 'pre-grain')")
    // a DV takedown before the re-grain: the restated files must
    // materialize it through (no DV debt survives a whole-lake rewrite)
    History.deleteKeysDV(spark, dir, "doc_id", Seq(2L)): Unit
    val Seq(staged, retired) =
      call(s"CALL lake.repartition_lake('$dir', 'doc_id')")
    assert(retired.asInstanceOf[Int] >= 2, s"retired=$retired")
    assert(staged.asInstanceOf[Int] >= 1)
    // the declared layout follows the new scheme
    assert(FileManifest.declaredPartitioning(fs, dir) ===
      Some(Seq("doc_id")))
    // current files live under doc_id=… dirs; none under lang=…
    val cur = FileManifest.latest(fs, dir).get.cur
    assert(cur.nonEmpty && cur.forall(_.startsWith("doc_id=")), cur)
    // content identical minus the DV'd row, lang now a data column
    assert(History.readPinned(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq ===
      Seq((1L, "en", 10L), (3L, "de", 30L), (4L, "de", 40L),
        (5L, "fr", 50L)))
    // pre-grain time travel and the tag still answer the OLD image
    assert(History.readPinned(spark, dir, v0).count() === 5L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` VERSION AS OF 'pre-grain'")
      .collect()(0).getLong(0) === 5L)
    // writes after the re-grain land under the NEW scheme
    History.append(spark, dir,
      Seq((6L, "it", 60L)).toDF("doc_id", "lang", "n_chars"),
      key = "regrain-a6"): Unit
    val cur2 = FileManifest.latest(fs, dir).get.cur
    assert(cur2.exists(_.startsWith("doc_id=6")), cur2)
    // re-grain to UNPARTITIONED removes the declaration
    call(s"CALL lake.repartition_lake('$dir', '')")
    assert(FileManifest.declaredPartitioning(fs, dir) === None)
    assert(FileManifest.latest(fs, dir).get.cur.forall(!_.contains("=")))
    assert(History.readPinned(spark, dir).count() === 5L)
    // unknown column refuses, lake untouched
    val e = intercept[Exception] {
      call(s"CALL lake.repartition_lake('$dir', 'nope')")
    }
    assert(e.getMessage.contains("no such column"), e.getMessage)
  }

  test("stats/rowcount/key-index refreshes run via CALL") {
    val dir = lake()
    assert(call(s"CALL lake.refresh_row_counts('$dir')") === Seq(3))
    assert(call(s"CALL lake.refresh_stats('$dir', 'doc_id')") === Seq(3))
    assert(call(s"CALL lake.refresh_key_index('$dir', 'doc_id')").head
      .asInstanceOf[Int] >= 1)
    // the refreshed sidecar serves the metadata COUNT(*) immediately
    val df = spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
    assert(df.collect().head.getLong(0) === 5L)
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    // the system namespace spelling works too
    assert(call(s"CALL lake.system.refresh_row_counts('$dir')") === Seq(0))
  }

  test("tag + restore + vacuum lifecycle via CALL") {
    val dir = lake()
    val v1 = FileManifest.latest(fsOf(dir), dir).get.version
    assert(call(s"CALL lake.tag('$dir', 'pre-delete')") === Seq(v1))
    History.deleteWhere(spark, dir, col("doc_id") === 2L): Unit
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      .collect().head.getLong(0) === 4L)
    // restore by CALL: metadata-only rollback
    val restored = call(s"CALL lake.restore('$dir', $v1)")
    assert(restored.head.asInstanceOf[Long] > v1)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      .collect().head.getLong(0) === 5L)
    // vacuum by CALL (grace 0): reclaims the undone delete's files but
    // keeps the tag's pinned snapshot readable
    History.deleteWhere(spark, dir, col("doc_id") === 5L): Unit
    val Seq(files, versions) = call(s"CALL lake.vacuum('$dir', 0)")
    assert(files.asInstanceOf[Int] >= 1 || versions.asInstanceOf[Int] >= 1)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` VERSION AS OF 'pre-delete'")
      .collect().head.getLong(0) === 5L)
  }

  test("constraints declared via CALL bounce a violating SQL INSERT") {
    val dir = lake()
    val v = call(
      s"CALL lake.add_constraint('$dir', 'chars_nonneg', 'n_chars >= 0')")
    assert(v === Seq(1L))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, -1, 'en')")
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(chain(e).contains("chars_nonneg"), chain(e))
    assert(call(s"CALL lake.drop_constraint('$dir', 'chars_nonneg')") ===
      Seq(2L))
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, -1, 'en')")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      .collect().head.getLong(0) === 6L)
  }

  test("DV folding and compaction via CALL") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-callproc2").toString + "/lake"
    (0L until 40L).map(i => (i, s"p$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.deleteKeysDV(spark, dir, "id", Seq(3L, 17L)): Unit
    assert(FileManifest.latest(fsOf(dir), dir).get.dvs.nonEmpty)
    val Seq(rewritten, dropped) =
      call(s"CALL lake.materialize_deletes('$dir', 1)")
    assert(rewritten.asInstanceOf[Int] >= 1 &&
      dropped.asInstanceOf[Long] === 2L)
    assert(FileManifest.latest(fsOf(dir), dir).get.dvs.isEmpty)
    val Seq(dirsPacked, _) =
      call(s"CALL lake.bin_pack('$dir', ${256L * 1024 * 1024}, 2)")
    assert(dirsPacked.asInstanceOf[Int] >= 1)
    assert(History.readPinned(spark, dir).count() === 38L)
    // unknown procedures fail loudly (Spark wraps in
    // FAILED_TO_LOAD_ROUTINE; our inventory message rides the cause)
    val e2 = intercept[Exception] {
      spark.sql(s"CALL lake.frobnicate('$dir')")
    }
    val chain2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString(" | ")
    assert(chain2.contains("frobnicate"), chain2)
  }

  test("cluster, Z-order, expire, and export snapshot via CALL") {
    val dir = lake()
    // single-column cluster: layout-only — the row set is unchanged
    val c = call(s"CALL lake.cluster('$dir', 'doc_id', 2)")
    assert(c.head.asInstanceOf[Int] >= 1 &&
      c(1).asInstanceOf[Int] >= 1, c.mkString(","))
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect().head.getLong(0) === 150L)
    // Z-order on two integral columns
    val z = call(s"CALL lake.cluster_z('$dir', 'doc_id, n_chars', 2)")
    assert(z.head.asInstanceOf[Int] >= 1, z.mkString(","))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      .collect().head.getLong(0) === 5L)
    // export the current version to a fresh root: exact clone
    val v = FileManifest.latest(fsOf(dir), dir).get.version
    val dest = java.nio.file.Files
      .createTempDirectory("graft-callexport").toString + "/clone"
    assert(call(s"CALL lake.export_snapshot('$dir', '$dest', $v)") ===
      Seq(1L))
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dest`")
      .collect().head.getLong(0) === 150L)
    // expire one whole partition by predicate; the clone is untouched
    val vPre = FileManifest.latest(fsOf(dir), dir).get.version
    assert(call(
      s"CALL lake.expire_partitions('$dir', 'lang = ''fr''')") === Seq(1))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      .collect().head.getLong(0) === 4L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dest`")
      .collect().head.getLong(0) === 5L)
    // metadata-only: pre-expire time travel still answers
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` VERSION AS OF $vPre")
      .collect().head.getLong(0) === 5L)
    // a data-column predicate refuses loudly (whole partitions only)
    val e = intercept[Exception] {
      call(s"CALL lake.expire_partitions('$dir', 'doc_id = 1')")
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("partition columns"), chain)
  }

  test("change-feed delivery and expiry via CALL") {
    import spark.implicits._
    val dir = lake()
    val feed = java.nio.file.Files
      .createTempDirectory("graft-callfeed").toString + "/feed"
    // bootstrap tick: baselines at latest, nothing delivered
    assert(call(s"CALL lake.tick_feed('$dir', '$feed')") ===
      Seq(-1L, -1L))
    val v0 = FileManifest.latest(fsOf(dir), dir).get.version
    History.append(spark, dir,
      Seq((6L, "it", 60L)).toDF("doc_id", "lang", "n_chars"),
      key = "feed-b1", partitionCols = Seq("lang")): Unit
    val v1 = FileManifest.latest(fsOf(dir), dir).get.version
    assert(call(s"CALL lake.tick_feed('$dir', '$feed')") ===
      Seq(v0, v1))
    // the delivered range holds exactly the appended row
    val delivered = spark.read.parquet(s"$feed/changes-v$v0-v$v1")
    assert(delivered.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(6L))
    // replayed tick converges to the same range; nothing new after
    assert(call(s"CALL lake.tick_feed('$dir', '$feed')") ===
      Seq(-1L, -1L))
    // expiry prunes beyond the retention tail (keep the last range)
    History.append(spark, dir,
      Seq((7L, "it", 70L)).toDF("doc_id", "lang", "n_chars"),
      key = "feed-b2", partitionCols = Seq("lang")): Unit
    assert(call(s"CALL lake.tick_feed('$dir', '$feed')").last ===
      FileManifest.latest(fsOf(dir), dir).get.version)
    assert(call(s"CALL lake.expire_feed('$feed', 1)")
      .head.asInstanceOf[Int] >= 1)
  }

  test("rollup bootstrap and advance via CALL") {
    import spark.implicits._
    val dir = lake()
    val roll = java.nio.file.Files
      .createTempDirectory("graft-callroll").toString + "/rollup"
    val v0 = FileManifest.latest(fsOf(dir), dir).get.version
    assert(call(s"CALL lake.bootstrap_rollup('$dir', '$roll', " +
      s"'lang', 'n_chars')") === Seq(v0))
    // already current: tick no-ops
    assert(call(s"CALL lake.tick_rollup('$dir', '$roll', " +
      s"'lang', 'n_chars')") === Seq(-1L, -1L))
    History.append(spark, dir,
      Seq((6L, "en", 100L)).toDF("doc_id", "lang", "n_chars"),
      key = "roll-b1", partitionCols = Seq("lang")): Unit
    val v1 = FileManifest.latest(fsOf(dir), dir).get.version
    assert(call(s"CALL lake.tick_rollup('$dir', '$roll', " +
      s"'lang', 'n_chars')") === Seq(v0, v1))
    // the advanced state equals a fresh aggregate
    val state = graft.sources.IncrementalRollup
      .read(spark, roll).select("lang", "sum_n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(state === Map("en" -> 130L, "de" -> 70L, "fr" -> 50L))
  }
}
