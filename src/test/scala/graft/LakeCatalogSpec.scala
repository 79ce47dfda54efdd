package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History, LakeCatalog}

/** SQL surface over manifest lakes ([[LakeCatalog]]): plain SELECTs
  * resolve the pinned manifest, time travel works by version, tag
  * name, and timestamp, pushdown reaches the parquet scan, and the
  * surface is read-only. */
class LakeCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    s
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** lang-partitioned manifest lake over a tiny documents-like frame. */
  private def lake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat").toString + "/lake"
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
        (4L, "de", 40L), (5L, "fr", 50L))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("SELECT over a lake path equals the pinned read") {
    val dir = lake()
    val viaSql = spark.sql(s"SELECT doc_id, lang, n_chars FROM lake.`$dir`")
    assert(ids(viaSql) === Seq(1L, 2L, 3L, 4L, 5L))
    // the SQL scan plans the MANIFEST's files: a delete commit flips
    // what SQL sees, exactly like readPinned
    History.deleteWhere(spark, dir, col("doc_id") === 2L): Unit
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 4L, 5L))
  }

  test("VERSION AS OF n, tag names, and TIMESTAMP AS OF all resolve") {
    val dir = lake()
    val fs = fsOf(dir)
    val v1 = FileManifest.latest(fs, dir).get.version
    val t1 = FileManifest.versionMtime(fs, dir, v1).get
    History.tag(spark, dir, "pre-delete"): Unit
    Thread.sleep(5) // ensure the delete's commit mtime is after t1
    History.deleteWhere(spark, dir, col("doc_id") <= 2L): Unit
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(3L, 4L, 5L))
    // numeric version
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF $v1")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // tag name
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF 'pre-delete'")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // timestamp: the instant v1 committed resolves to v1
    val asOf = new java.sql.Timestamp(t1).toString
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` TIMESTAMP AS OF '$asOf'")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // unknown tag and vacuumed version fail loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM lake.`$dir` VERSION AS OF 'nope'").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM lake.`$dir` VERSION AS OF 999").collect()
    }
  }

  test("partition and filter pushdown reach the SQL scan") {
    val dir = lake()
    val df = spark.sql(
      s"SELECT doc_id FROM lake.`$dir` WHERE lang = 'de' AND n_chars > 30")
    assert(ids(df) === Seq(4L))
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate prunes partitions; the n_chars predicate is
    // pushed into the parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), " +
      "GreaterThan(n_chars,30)]") || plan.contains("GreaterThan(n_chars"),
      plan.take(1200))
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scanned.contains("lang=en") || scanned.contains("PartitionFilters"),
      scanned.take(800))
  }

  test("a declared-schema lake projects every file era through SQL") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-ev").toString + "/lake"
    Seq((1, "a")).toDF("id", "tag").write.parquet(dir) // id INT32
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit
    History.evolveSchema(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType),
      StructField("score", DoubleType)))): Unit
    History.append(spark, dir,
      Seq((2L, "b", 0.5)).toDF("id", "tag", "score"), key = "e2"): Unit
    val rows = spark.sql(s"SELECT id, tag, score FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)))).toSet
    assert(rows === Set((1L, "a", None), (2L, "b", Some(0.5))))
  }

  test("configured aliases name lakes and enumerate via SHOW TABLES") {
    val dir = lake()
    // a second catalog instance with an alias option (catalog configs
    // are read at first reference, so use a fresh catalog name)
    spark.conf.set("spark.sql.catalog.corpuscat",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.corpuscat.docs", dir)
    assert(ids(spark.sql("SELECT * FROM corpuscat.docs")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    val shown = spark.sql("SHOW TABLES IN corpuscat")
      .select("tableName").collect().map(_.getString(0)).toSeq
    assert(shown === Seq("docs"))
    // time travel works through the alias too
    History.tag(spark, dir, "alias-pin"): Unit
    History.deleteWhere(spark, dir, col("doc_id") === 5L): Unit
    assert(ids(spark.sql(
      "SELECT * FROM corpuscat.docs VERSION AS OF 'alias-pin'")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(spark.sql("SELECT * FROM corpuscat.docs")) ===
      Seq(1L, 2L, 3L, 4L))
  }

  test("SHOW TBLPROPERTIES surfaces version, schema, and constraints") {
    val dir = lake()
    graft.sources.Constraints.add(spark, dir, "chars_nonneg",
      "n_chars >= 0"): Unit
    graft.sources.SchemaLog.declare(spark, dir): Unit
    def props(): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES lake.`$dir`")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val p = props()
    assert(p("graft.version") ===
      FileManifest.latest(fsOf(dir), dir).get.version.toString)
    assert(p("graft.schema.version") === "1")
    assert(p("graft.constraint.chars_nonneg") === "n_chars >= 0")
    // the contract tracks the lake: a drop + a new commit both show
    graft.sources.Constraints.drop(spark, dir, "chars_nonneg"): Unit
    History.deleteWhere(spark, dir, col("doc_id") === 5L): Unit
    val p2 = props()
    assert(!p2.contains("graft.constraint.chars_nonneg"))
    assert(p2("graft.version").toLong > p("graft.version").toLong)
    // metadata-only row count: absent until the sidecar is fresh,
    // exact thereafter (and delete-aware — doc 5 is gone)
    assert(!p2.contains("graft.rowcount"))
    History.refreshRowCounts(spark, dir): Unit
    val expected = History.readPinned(spark, dir).count()
    assert(props()("graft.rowcount") === expected.toString)
  }

  test("INSERT INTO routes through the staged append; DDL still fails") {
    val dir = lake()
    // the table schema orders partition cols last: (doc_id, n_chars,
    // lang); the staged append partitions the batch into the lake's
    // lang=... layout and commits one manifest version
    val before = FileManifest.latest(fsOf(dir), dir).get.version
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, 90, 'en'), (10, 100, 'pt')")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 3L, 4L, 5L, 9L, 10L))
    // visible to the engine's readers too (same manifest commit), and
    // the new rows landed INSIDE the partition layout
    val pinned = History.readPinned(spark, dir)
    assert(pinned.count() === 7)
    assert(pinned.filter(col("lang") === "pt").count() === 1)
    val m = FileManifest.latest(fsOf(dir), dir).get
    assert(m.version > before)
    assert(m.cur.exists(_.startsWith("lang=pt/")), m.cur.mkString(", "))
    // destructive DDL on a DATA-BEARING lake is still refused — SQL
    // must not delete data plus its time-travel history in one verb
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    val e = intercept[Exception] {
      spark.sql(s"DROP TABLE lake.`$dir`")
    }
    assert(messageChain(e).contains("data-bearing"), messageChain(e))
    // a time-travel pin is not a write target: the pinned table never
    // declares write capability, so analysis rejects any INSERT at it
    val cat = new LakeCatalog
    cat.initialize("lake",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    val pinnedTable = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, dir), before.toString)
    import org.apache.spark.sql.connector.catalog.TableCapability._
    assert(!pinnedTable.capabilities().contains(V1_BATCH_WRITE) &&
      !pinnedTable.capabilities().contains(BATCH_WRITE))
    val latest = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, dir))
    assert(latest.capabilities().contains(V1_BATCH_WRITE))
  }

  test("a constraint-violating SQL INSERT bounces whole at the append edge") {
    val dir = lake()
    graft.sources.Constraints.add(spark, dir, "chars_nonneg",
      "n_chars >= 0"): Unit
    val before = FileManifest.latest(fsOf(dir), dir).get.version
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, 90, 'en'), (10, -1, 'de')")
    }
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(messageChain(e).contains("chars_nonneg"), messageChain(e))
    // NOTHING landed — not even the batch's valid rows
    assert(FileManifest.latest(fsOf(dir), dir).get.version === before)
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // and a clean retry lands normally
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, 90, 'en')")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 3L, 4L, 5L, 9L))
  }

  test("DV-bearing snapshots serve through SQL with vectors applied") {
    val dir = lake()
    History.deleteKeysDV(spark, dir, "doc_id", Seq(2L, 5L)): Unit
    // the catalog routes to the engine's pinned-read plan: deleted
    // rows never surface, on the full scan or under pushed filters
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 4L))
    val filtered = spark.sql(
      s"SELECT doc_id FROM lake.`$dir` WHERE lang = 'de' AND n_chars > 30")
    assert(ids(filtered) === Seq(4L))
    // pushed filters surface in the scan description (pruning reaches
    // the inner plan); every filter is also re-evaluated post-scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GraftPinnedLake"), plan.take(1200))
    assert(plan.contains("PushedFilters: [IsNotNull(lang)"),
      plan.take(1200))
    // time travel composes: the pre-delete version still reads whole,
    // and a DV-bearing version resolved BY VERSION applies its vectors
    val fs = fsOf(dir)
    val vs = FileManifest.versions(fs, dir)
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${vs.head}")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${vs.last}")) ===
      Seq(1L, 3L, 4L))
    // a later COW delete composes on top through the same surface
    History.deleteWhere(spark, dir, col("doc_id") === 3L): Unit
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 4L))
  }

  test("SQL INSERT works on a DV-bearing lake (staged append, vectors kept)") {
    val dir = lake()
    History.deleteKeysDV(spark, dir, "doc_id", Seq(1L)): Unit
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (6, 60, 'fr')")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(2L, 3L, 4L, 5L, 6L))
  }

  test("COUNT(*) answers from metadata when the sidecar is fresh") {
    val dir = lake()
    // stale sidecar: the count falls back to a real scan — correct,
    // just not metadata-only
    def countPlan(): (Long, String) = {
      val df = spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
      (df.collect().head.getLong(0),
        df.queryExecution.executedPlan.toString)
    }
    val (n0, p0) = countPlan()
    assert(n0 === 5L)
    assert(!p0.contains("LocalTableScan"), p0.take(800))
    History.refreshRowCounts(spark, dir): Unit
    val (n1, p1) = countPlan()
    assert(n1 === 5L)
    // fresh stats: the whole aggregate collapsed to the metadata
    // answer — no file scan in the plan
    assert(p1.contains("LocalTableScan"), p1.take(800))
    assert(!p1.contains("Parquet"), p1.take(800))
    // a DATA-column WHERE clause disqualifies the metadata answer
    // (partition-decidable predicates are covered separately) — falls
    // back to the scan, still correct
    val wdf = spark.sql(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE n_chars >= 20")
    assert(wdf.collect().head.getLong(0) === 4L)
    assert(!wdf.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    // DV-bearing lake: the metadata count nets out vector
    // cardinalities (fastCount) and STILL answers scan-free through
    // the V1 fallback table
    History.deleteKeysDV(spark, dir, "doc_id", Seq(2L, 5L)): Unit
    val (n2, p2) = countPlan()
    assert(n2 === 3L)
    assert(p2.contains("LocalTableScan"), p2.take(800))
    // an INSERT staleness-checks correctly: new files lack sidecar
    // entries until the next refresh, so the count scans (and is right)
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, 90, 'en')")
    val (n3, p3) = countPlan()
    assert(n3 === 4L)
    assert(!p3.contains("LocalTableScan"), p3.take(800))
    History.refreshRowCounts(spark, dir): Unit
    val (n4, p4) = countPlan()
    assert(n4 === 4L && p4.contains("LocalTableScan"), p4.take(800))
  }

  test("partition-decidable filters keep aggregates metadata-only") {
    val dir = lake() // lang-partitioned: en(2), de(2), fr(1)
    History.refreshStats(spark, dir, "doc_id"): Unit
    History.refreshRowCounts(spark, dir): Unit
    def run(sql: String): (Seq[Any], Boolean) = {
      val df = spark.sql(sql)
      (df.collect().head.toSeq,
        df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    }
    // equality, IN, and negation on the partition column: answered
    // from the selected files' sidecar entries, zero scans
    val (v1, m1) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE lang = 'en'")
    assert(v1 === Seq(2L) && m1)
    val (v2, m2) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE lang IN ('en', 'de')")
    assert(v2 === Seq(4L) && m2)
    val (v3, m3) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE lang != 'fr'")
    assert(v3 === Seq(4L) && m3)
    // partition-filtered MIN/MAX compose in the same pushed aggregate
    val (v4, m4) = run(
      s"SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx, COUNT(*) AS n " +
        s"FROM lake.`$dir` WHERE lang = 'de'")
    assert(v4 === Seq(3L, 4L, 2L) && m4)
    // a DATA-column predicate refuses the metadata answer (scan runs,
    // result stays exact)
    val (v5, m5) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE n_chars > 15")
    assert(v5 === Seq(4L) && !m5)
    // mixed partition+data predicates refuse too
    val (v6, m6) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` " +
        "WHERE lang = 'en' AND n_chars > 15")
    assert(v6 === Seq(1L) && !m6)
    // an empty selection is exactly zero — still metadata-only
    val (v7, m7) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE lang = 'xx'")
    assert(v7 === Seq(0L) && m7)
    // DV path: a takedown inside one partition nets that partition's
    // count and refuses extrema there, while other partitions keep
    // the metadata extrema path
    History.deleteKeysDV(spark, dir, "doc_id", Seq(1L)): Unit // lang=en
    val (v8, m8) = run(
      s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE lang = 'en'")
    assert(v8 === Seq(1L) && m8)
    val (v9, m9) = run(
      s"SELECT MIN(doc_id) AS mn FROM lake.`$dir` WHERE lang = 'en'")
    assert(v9 === Seq(2L) && !m9) // vector on the subset: scan decides
    val (v10, m10) = run(
      s"SELECT MIN(doc_id) AS mn FROM lake.`$dir` WHERE lang = 'de'")
    assert(v10 === Seq(3L) && m10) // untouched partition: metadata
  }

  test("GROUP BY a partition column answers per-dir from metadata") {
    val dir = lake() // lang-partitioned: en(2), de(2), fr(1)
    History.refreshStats(spark, dir, "doc_id"): Unit
    History.refreshRowCounts(spark, dir): Unit
    def run(sql: String)
        : (Seq[(String, Seq[Any])], Boolean) = {
      val df = spark.sql(sql)
      (df.collect().map(r =>
          (r.getString(0), r.toSeq.drop(1))).sortBy(_._1).toSeq,
        df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    }
    // per-lang counts: one metadata row per partition dir, zero scans
    val (v1, m1) = run(
      s"SELECT lang, COUNT(*) AS n FROM lake.`$dir` GROUP BY lang")
    assert(v1 === Seq(("de", Seq(2L)), ("en", Seq(2L)), ("fr", Seq(1L))))
    assert(m1)
    // grouped extrema + count compose; filters compose too
    val (v2, m2) = run(
      s"SELECT lang, MIN(doc_id) AS mn, MAX(doc_id) AS mx, " +
        s"COUNT(*) AS n FROM lake.`$dir` " +
        "WHERE lang != 'fr' GROUP BY lang")
    assert(v2 === Seq(("de", Seq(3L, 4L, 2L)), ("en", Seq(1L, 2L, 2L))))
    assert(m2)
    // grouping by a DATA column refuses (scan runs, stays exact)
    val df3 = spark.sql(
      s"SELECT n_chars, COUNT(*) AS n FROM lake.`$dir` GROUP BY n_chars")
    assert(!df3.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(df3.collect().length === 5)
    // a DV nets its partition's count per group and refuses extrema
    History.deleteKeysDV(spark, dir, "doc_id", Seq(3L)): Unit // lang=de
    val (v4, m4) = run(
      s"SELECT lang, COUNT(*) AS n FROM lake.`$dir` GROUP BY lang")
    assert(v4 === Seq(("de", Seq(1L)), ("en", Seq(2L)), ("fr", Seq(1L))))
    assert(m4)
    val df5 = spark.sql(
      s"SELECT lang, MIN(doc_id) AS mn FROM lake.`$dir` GROUP BY lang")
    assert(!df5.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(df5.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      .toSeq === Seq(("de", 4L), ("en", 1L), ("fr", 5L)))
  }

  test("metadata tables: #history, #files, #tags, #constraints via SQL") {
    val dir = lake()
    History.tag(spark, dir, "v1-pin"): Unit
    graft.sources.Constraints.add(spark, dir, "chars_nonneg",
      "n_chars >= 0"): Unit
    History.deleteKeysDV(spark, dir, "doc_id", Seq(5L)): Unit
    History.refreshRowCounts(spark, dir): Unit
    // #history: one row per retained version, newest carries the DV
    val hist = spark.sql(
      s"SELECT version, n_files, tags, n_dv_files FROM lake.`$dir#history` " +
        "ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(hist.length >= 2)
    assert(hist.head._3 === "v1-pin" && hist.head._4 === 0L)
    assert(hist.last._4 === 1L)
    // #files: current inventory with DV pointer + sidecar row counts
    val files = spark.sql(
      s"SELECT file, dv_file, n_rows FROM lake.`$dir#files`")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(files.nonEmpty && files.forall(_._3.isDefined))
    assert(files.count(_._2.isDefined) === 1) // exactly one vectored file
    assert(files.map(_._3.get).sum === 5L)    // sidecar counts pre-DV
    // #tags and #constraints
    val tags = spark.sql(s"SELECT tag, version FROM lake.`$dir#tags`")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tags.toSeq === Seq(("v1-pin", hist.head._1)))
    val cs = spark.sql(
      s"SELECT name, expression FROM lake.`$dir#constraints`")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(cs.toSeq === Seq(("chars_nonneg", "n_chars >= 0")))
    // SQL composes over the metadata: the dashboard join
    val n = spark.sql(
      s"""SELECT COUNT(*) FROM lake.`$dir#files` f
          WHERE f.dv_file IS NOT NULL""").collect().head.getLong(0)
    assert(n === 1L)
    // #schema: the declared-schema history as DDL — empty before a
    // declaration, one row per evolution step after
    assert(spark.sql(s"SELECT * FROM lake.`$dir#schema`").count() === 0L)
    History.declareSchema(spark, dir): Unit
    History.evolveSchema(spark, dir,
      org.apache.spark.sql.types.StructType(
        History.declaredSchema(spark, dir).get.fields :+
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))): Unit
    val sch = spark.sql(
      s"SELECT version, schema_ddl FROM lake.`$dir#schema` " +
        "ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sch.length === 2)
    assert(!sch.head._2.contains("score") && sch.last._2.contains("score"))
    // an unknown suffix is just a path that is not a lake
    intercept[Exception] {
      spark.sql(s"SELECT * FROM lake.`$dir#nope`").collect()
    }
    // drift guard: the catalog's STATIC metadata schemas must match
    // the maker frames field-for-field (names + types) — a drifted
    // field would mis-project rows at the needConversion=false boundary
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.map(f => (f.name, f.dataType))
    assert(shape(spark.sql(s"SELECT * FROM lake.`$dir#history`")) ===
      shape(History.describeHistory(spark, dir)))
    assert(shape(spark.sql(s"SELECT * FROM lake.`$dir#files`")) ===
      shape(History.describeFiles(spark, dir)))
  }

  test("#changes serves the row-level change feed through SQL") {
    val dir = lake()
    val fs = fsOf(dir)
    val v1 = FileManifest.latest(fs, dir).get.version
    History.deleteKeysDV(spark, dir, "doc_id", Seq(2L)): Unit
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (9, 90, 'pt')")
    val vLast = FileManifest.latest(fs, dir).get.version
    // explicit window: both commits' row-level deltas
    val feed = spark.sql(
      s"SELECT doc_id, _change FROM lake.`$dir#changes@$v1..$vLast`")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(feed === Seq((2L, "delete"), (9L, "insert")))
    // bare #changes = the LAST commit's window (the INSERT)
    val lastW = spark.sql(
      s"SELECT doc_id, _change FROM lake.`$dir#changes`")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(lastW === Seq((9L, "insert")))
    // CDC composes in SQL: aggregate the feed like a downstream rollup
    val net = spark.sql(
      s"""SELECT SUM(CASE WHEN _change = 'insert' THEN n_chars
                          ELSE -n_chars END) AS net
          FROM lake.`$dir#changes@$v1..$vLast`""")
      .collect().head.getLong(0)
    assert(net === 70L) // +90 (insert) - 20 (deleted doc 2)
    // TAG-addressed window: "what changed between the two snapshots
    // my models trained on" — endpoints resolve through the same tag
    // registry VERSION AS OF reads (dotted names included)
    History.tag(spark, dir, "train.v1", Some(v1)): Unit
    History.tag(spark, dir, "train.v2", Some(vLast)): Unit
    val byTag = spark.sql(
      s"SELECT doc_id, _change FROM lake.`$dir#changes@train.v1..train.v2`")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(byTag === feed, "tag endpoints must equal version endpoints")
    // an unknown endpoint names the available tags
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM lake.`$dir#changes@nope..train.v2`")
        .collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("neither a version nor a tag"), chain)
  }

  test("MIN/MAX answer from footer stats; DVs and non-bigint fall back") {
    val dir = lake()
    def run(sql: String): (Seq[Any], String) = {
      val df = spark.sql(sql)
      (df.collect().head.toSeq, df.queryExecution.executedPlan.toString)
    }
    val q = s"SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx, " +
      s"COUNT(*) AS n FROM lake.`$dir`"
    // no stats yet: correct via the scan
    val (v0, p0) = run(q)
    assert(v0 === Seq(1L, 5L, 5L) && !p0.contains("LocalTableScan"))
    History.refreshStats(spark, dir, "doc_id"): Unit
    History.refreshRowCounts(spark, dir): Unit
    // fresh stats, no DVs: the WHOLE aggregate collapses to metadata
    val (v1, p1) = run(q)
    assert(v1 === Seq(1L, 5L, 5L))
    assert(p1.contains("LocalTableScan") && !p1.contains("Parquet"),
      p1.take(800))
    // a PARTITION column's extrema answer from the k=v directory
    // names themselves (zero footer stats — guarded by the fresh
    // row counts refreshed above, so an empty file could never vote)
    val (v2, p2) = run(
      s"SELECT MIN(lang) AS ml, MAX(lang) AS xl FROM lake.`$dir`")
    assert(v2 === Seq("de", "fr"))
    assert(p2.contains("LocalTableScan"), p2.take(800))
    // a live DV may have deleted the extreme row: MIN/MAX must fall
    // back to the scan (COUNT alone still answers from metadata)
    History.deleteKeysDV(spark, dir, "doc_id", Seq(5L)): Unit
    val (v3, p3) = run(q)
    assert(v3 === Seq(1L, 4L, 4L), v3)
    assert(!p3.contains("LocalTableScan"), p3.take(800))
    val cdf = spark.sql(s"SELECT COUNT(*) AS n FROM lake.`$dir`")
    assert(cdf.collect().head.getLong(0) === 4L)
    assert(cdf.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    // folding the vectors restores the metadata extrema path
    History.materializeDeletes(spark, dir): Unit
    History.refreshStats(spark, dir, "doc_id"): Unit
    History.refreshRowCounts(spark, dir): Unit
    val (v4, p4) = run(q)
    assert(v4 === Seq(1L, 4L, 4L))
    assert(p4.contains("LocalTableScan"), p4.take(800))
  }

  test("DATE, INT, and STRING extrema answer from footer stats, " +
      "type-exact") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-dt").toString + "/lake"
    Seq((1, java.sql.Date.valueOf("2026-01-03"), "beta"),
        (2, java.sql.Date.valueOf("2026-02-14"), "alpha"),
        (3, java.sql.Date.valueOf("2025-12-31"), "gamma"))
      .toDF("rank", "dt", "tag")
      .repartition(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.refreshStats(spark, dir, "dt"): Unit
    History.refreshStats(spark, dir, "rank"): Unit
    History.refreshStats(spark, dir, "tag"): Unit
    val df = spark.sql(s"""SELECT MIN(dt) AS mn_dt, MAX(dt) AS mx_dt,
                                  MIN(rank) AS mn_r, MAX(rank) AS mx_r,
                                  MIN(tag) AS mn_t, MAX(tag) AS mx_t
                           FROM lake.`$dir`""")
    val r = df.collect().head
    assert(r.getDate(0) === java.sql.Date.valueOf("2025-12-31"))
    assert(r.getDate(1) === java.sql.Date.valueOf("2026-02-14"))
    assert((r.getInt(2), r.getInt(3)) === (1, 3))
    assert((r.getString(4), r.getString(5)) === ("alpha", "gamma"))
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
    // the string sidecar round-trips exactly through its encoding —
    // the SAME extrema answer after the parsed-cache is bypassed by a
    // second refresh cycle (publish rewrites the sidecar whole)
    History.refreshStats(spark, dir, "rank"): Unit
    val again = spark.sql(
      s"SELECT MIN(tag) AS mn_t, MAX(tag) AS mx_t FROM lake.`$dir`")
    assert(again.collect().head.toSeq === Seq("alpha", "gamma"))
  }

  test("DOUBLE metadata extrema answer from footer stats; NaN and " +
      "±0.0 bounds refuse to the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-dbl").toString + "/lake"
    Seq((1L, 1.5), (2L, -3.25), (3L, 8.75))
      .toDF("id", "score")
      .repartition(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.refreshStats(spark, dir, "score"): Unit
    History.refreshRowCounts(spark, dir): Unit
    val df = spark.sql(s"""SELECT MIN(score) AS mn, MAX(score) AS mx
                           FROM lake.`$dir`""")
    assert(df.collect().head.toSeq === Seq(-3.25, 8.75))
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
    // NaN values poison parquet's double bounds (Math.min/max
    // propagate NaN) → the bound refuses at stat time and the SCAN
    // answers — Spark orders NaN greatest, a footer answer would lie
    val dirNan = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-dblnan").toString + "/lake"
    Seq((1L, 2.5), (2L, Double.NaN)).toDF("id", "score")
      .repartition(1).write.parquet(dirNan)
    History.enableManifests(spark, dirNan): Unit
    History.refreshStats(spark, dirNan, "score"): Unit
    History.refreshRowCounts(spark, dirNan): Unit
    val dfNan = spark.sql(
      s"SELECT MAX(score) AS mx FROM lake.`$dirNan`")
    assert(dfNan.collect().head.getDouble(0).isNaN)
    assert(!dfNan.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    // DECIMAL extrema: unscaled footer bounds reassemble at the
    // declared (precision, scale) — LocalTableScan, exact values
    val dirDec = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-dec").toString + "/lake"
    Seq((1L, BigDecimal("10.25")), (2L, BigDecimal("-3.50")),
        (3L, BigDecimal("99.75")))
      .toDF("id", "amount")
      .select(col("id"), col("amount").cast("decimal(12,2)").as("amount"))
      .repartition(2).write.parquet(dirDec)
    History.enableManifests(spark, dirDec): Unit
    History.refreshStats(spark, dirDec, "amount"): Unit
    History.refreshRowCounts(spark, dirDec): Unit
    val dfDec = spark.sql(
      s"SELECT MIN(amount) AS mn, MAX(amount) AS mx FROM lake.`$dirDec`")
    assert(dfDec.collect().head.toSeq ===
      Seq(new java.math.BigDecimal("-3.50"),
        new java.math.BigDecimal("99.75")))
    assert(dfDec.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      dfDec.queryExecution.executedPlan.toString.take(800))
    // a bound touching ±0.0 refuses too (writer min/max conventions
    // around signed zero vary) — the scan answers exactly
    val dirZero = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-dblzero").toString + "/lake"
    Seq((1L, 0.0), (2L, 4.5)).toDF("id", "score")
      .repartition(1).write.parquet(dirZero)
    History.enableManifests(spark, dirZero): Unit
    History.refreshStats(spark, dirZero, "score"): Unit
    History.refreshRowCounts(spark, dirZero): Unit
    val dfZ = spark.sql(
      s"SELECT MIN(score) AS mn FROM lake.`$dirZero`")
    assert(dfZ.collect().head.getDouble(0) === 0.0)
    assert(!dfZ.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
  }

  test("COUNT(col) answers non-null counts from footer null stats") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-cnt").toString + "/lake"
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None),
        (5L, Some(50L)))
      .toDF("id", "opt")
      .repartition(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.refreshRowCounts(spark, dir): Unit
    History.refreshStats(spark, dir, "opt"): Unit
    // COUNT(col) = footer rows − footer nulls, COUNT(*) beside it —
    // the whole SELECT plans a LocalTableScan, zero file reads
    val df = spark.sql(s"""SELECT COUNT(opt) AS n_opt, COUNT(*) AS n
                           FROM lake.`$dir`""")
    assert(df.collect().head.toSeq === Seq(3L, 5L))
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
    // COUNT(DISTINCT col) has no metadata answer: the scan runs
    val dfd = spark.sql(
      s"SELECT COUNT(DISTINCT opt) AS d FROM lake.`$dir`")
    assert(dfd.collect().head.getLong(0) === 3L)
    assert(!dfd.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    // a live DV refuses (a vector deletes null/non-null unevenly):
    // values stay correct via the scan
    History.deleteKeysDV(spark, dir, "id", Seq(2L)): Unit
    val dfv = spark.sql(s"SELECT COUNT(opt) AS n_opt FROM lake.`$dir`")
    assert(dfv.collect().head.getLong(0) === 3L)
    assert(!dfv.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
  }

  test("grouped metadata aggregates compose COUNT with typed extrema") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-grp").toString + "/lake"
    Seq((1L, "en", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
        (2L, "en", java.sql.Timestamp.valueOf("2026-01-02 11:30:00")),
        (3L, "de", java.sql.Timestamp.valueOf("2026-01-03 09:15:00")))
      .toDF("id", "lang", "ts")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.refreshRowCounts(spark, dir): Unit
    History.refreshStats(spark, dir, "id"): Unit
    History.refreshStats(spark, dir, "ts"): Unit
    // per-partition COUNT + MIN answer per group from each lang dir's
    // sidecar entries — but the default-written (INT96) timestamp has
    // NO footer stats, so including MAX(ts) refuses the whole push
    // (half-answered aggregates cannot be stitched onto a scan)
    val df = spark.sql(s"""SELECT lang, COUNT(*) AS n, MIN(id) AS mn
                           FROM lake.`$dir` GROUP BY lang""")
    assert(df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      === Seq(("de", 1L, 3L), ("en", 2L, 1L)))
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
    val dfTs = spark.sql(s"""SELECT lang, MAX(ts) AS mx
                             FROM lake.`$dir` GROUP BY lang""")
    assert(!dfTs.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "INT96 timestamps carry no footer stats — the scan must answer")
    assert(dfTs.collect().map(_.getTimestamp(1).toString).sorted.toSeq
      === Seq("2026-01-02 11:30:00.0", "2026-01-03 09:15:00.0"))
  }

  test("INT64-micros timestamps serve extrema from footer stats") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-ts64").toString + "/lake"
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try
      Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
          (2L, java.sql.Timestamp.valueOf("2026-01-02 11:30:00")))
        .toDF("id", "ts")
        .repartition(2).write.parquet(dir)
    finally
      spark.conf.unset("spark.sql.parquet.outputTimestampType")
    History.enableManifests(spark, dir): Unit
    History.refreshRowCounts(spark, dir): Unit
    History.refreshStats(spark, dir, "ts"): Unit
    val df = spark.sql(
      s"SELECT MIN(ts) AS mn, MAX(ts) AS mx FROM lake.`$dir`")
    val r = df.collect().head
    assert((r.getTimestamp(0).toString, r.getTimestamp(1).toString) ===
      ("2026-01-01 10:00:00.0", "2026-01-02 11:30:00.0"))
    assert(df.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
  }

  test("partition-column extrema answer from directory names, guarded") {
    import spark.implicits._
    // a DATE-partitioned lake: dt extrema come from the dt=... dirs
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-pdt").toString + "/lake"
    Seq((1L, java.sql.Date.valueOf("2026-01-03")),
        (2L, java.sql.Date.valueOf("2026-02-14")),
        (3L, java.sql.Date.valueOf("2025-12-31")))
      .toDF("id", "dt")
      .repartition(col("dt"))
      .write.partitionBy("dt").parquet(dir)
    History.enableManifests(spark, dir): Unit
    // without row counts the extrema refuse (an empty file's dir
    // value must never vote) — the scan answers
    val q = s"SELECT MIN(dt) AS mn, MAX(dt) AS mx FROM lake.`$dir`"
    val df0 = spark.sql(q)
    assert(!df0.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(df0.collect().head.getDate(0) ===
      java.sql.Date.valueOf("2025-12-31"))
    History.refreshRowCounts(spark, dir): Unit
    val df1 = spark.sql(q)
    val r = df1.collect().head
    assert(r.getDate(0) === java.sql.Date.valueOf("2025-12-31"))
    assert(r.getDate(1) === java.sql.Date.valueOf("2026-02-14"))
    assert(df1.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      df1.queryExecution.executedPlan.toString.take(800))
    // partition-FILTERED partition extrema decide per file too
    val df2 = spark.sql(s"""SELECT MAX(dt) AS mx FROM lake.`$dir`
                            WHERE dt < DATE'2026-02-01'""")
    assert(df2.collect().head.getDate(0) ===
      java.sql.Date.valueOf("2026-01-03"))
    // a DV on the selection refuses extrema (vector may have emptied
    // a file) — values stay correct via the scan
    History.deleteKeysDV(spark, dir, "id", Seq(2L)): Unit
    val df3 = spark.sql(q)
    assert(df3.collect().head.getDate(1) ===
      java.sql.Date.valueOf("2026-01-03"))
    assert(!df3.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
  }

  test("SQL DELETE lands as deletion vectors on both table routes") {
    val dir = lake()
    val fs = fsOf(dir)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    // route 1: the DV-free lake resolves the stock bridge table
    spark.sql(s"DELETE FROM lake.`$dir` WHERE doc_id IN (2, 5)")
    val m1 = FileManifest.latest(fs, dir).get
    assert(m1.cur.toSet === filesBefore,
      "merge-on-read: zero data files rewritten")
    assert(m1.dvs.nonEmpty, "the delete must land as DV sidecars")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 4L))
    // route 2: the now-DV-bearing lake resolves the pinned table —
    // DELETE must work identically through it
    spark.sql(s"DELETE FROM lake.`$dir` WHERE lang = 'de' AND n_chars >= 40")
    val m2 = FileManifest.latest(fs, dir).get
    assert(m2.cur.toSet === filesBefore)
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 3L))
    // time travel between the two deletes still answers (compliance
    // clock starts at vacuum, not at DELETE)
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${m1.version}")) ===
      Seq(1L, 3L, 4L))
  }

  test("unconditional SQL DELETE truncates copy-on-write") {
    val dir = lake()
    val fs = fsOf(dir)
    History.declareSchema(spark, dir): Unit
    spark.sql(s"DELETE FROM lake.`$dir`")
    val m = FileManifest.latest(fs, dir).get
    assert(m.cur.isEmpty,
      "truncate retires every file — zero sidecars for zero survivors")
    assert(m.dvs.isEmpty)
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").count() === 0L)
    // the pre-truncate version still answers until vacuum
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${m.version - 1}")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("SQL UPDATE routes through the copy-on-write engine operator") {
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    // the statement returns the engine receipt: (files, rows)
    val receipt = spark.sql(
      s"UPDATE lake.`$dir` SET n_chars = n_chars * 10 WHERE lang = 'en'")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(receipt === Seq((1, 2L)))
    val got = spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 100L), (2L, 200L), (3L, 30L), (4L, 40L),
      (5L, 50L)))
    // file-granular: the de and fr files survive unrewritten
    val after = FileManifest.latest(fs, dir).get
    assert(before.cur.filterNot(_.startsWith("lang=en"))
      .forall(after.cur.contains), after.cur.mkString(","))
    // pre-update time travel still answers
    assert(spark.sql(
      s"""SELECT n_chars FROM lake.`$dir` VERSION AS OF ${before.version}
          WHERE doc_id = 1""").collect().map(_.getLong(0)).toSeq ===
      Seq(10L))
    // the DV-bearing lake resolves the pinned table — UPDATE must work
    // identically through that route, never resurrecting the DV'd row
    spark.sql(s"DELETE FROM lake.`$dir` WHERE doc_id = 2")
    spark.sql(s"UPDATE lake.`$dir` SET n_chars = 0 WHERE lang = 'en'")
    assert(spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`" +
        " WHERE lang = 'en'")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 0L)))
  }

  test("SQL UPDATE without WHERE updates every row") {
    val dir = lake()
    spark.sql(s"UPDATE lake.`$dir` SET n_chars = doc_id")
    assert(spark.sql(
      s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 15L)
  }

  test("a bare uncorrelated IN-subquery DML materializes to a key list") {
    val dir = lake()
    val fs = fsOf(dir)
    // DELETE … WHERE key IN (SELECT …): the subquery runs eagerly, its
    // values ride the keyed DV route (no data file rewritten)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    spark.sql(s"""DELETE FROM lake.`$dir`
                  WHERE doc_id IN (SELECT doc_id FROM lake.`$dir`
                                   WHERE n_chars >= 40)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 2L, 3L))
    assert(FileManifest.latest(fs, dir).get.cur.toSet === filesBefore,
      "keyed IN-subquery delete lands as deletion vectors")
    // UPDATE rides the same materialized-key route
    spark.sql(s"""UPDATE lake.`$dir` SET n_chars = n_chars + 500
                  WHERE doc_id IN (SELECT doc_id FROM lake.`$dir`
                                   WHERE lang = 'en')""")
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === (10L + 500 + 20 + 500 + 30))
    // a subquery wider than the key cap refuses, lake untouched
    spark.conf.set("spark.graft.dml.subqueryKeyCap", "1")
    try {
      val e = intercept[UnsupportedOperationException] {
        spark.sql(s"""DELETE FROM lake.`$dir`
                      WHERE doc_id IN (SELECT doc_id FROM lake.`$dir`)""")
      }
      assert(e.getMessage.contains("key list"), e.getMessage)
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
        Seq(1L, 2L, 3L))
    } finally spark.conf.unset("spark.graft.dml.subqueryKeyCap")
  }

  test("correlated EXISTS DELETE decorrelates onto the keyed-frame " +
      "DV route; NOT EXISTS onto the anti-join") {
    import spark.implicits._
    val dir = lake()
    val fs = fsOf(dir)
    Seq((2L, true), (4L, true), (5L, false)).toDF("id", "flagged")
      .createOrReplaceTempView("corr_flags")
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    // the correlated equality becomes the join key; the subquery-side
    // conjunct (f.flagged) stays a frame filter; the delete rides
    // deletion vectors (zero data files rewritten)
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE EXISTS (SELECT 1 FROM corr_flags f
                                WHERE f.id = t.doc_id AND f.flagged)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 3L, 5L))
    assert(FileManifest.latest(fs, dir).get.cur.toSet === filesBefore,
      "correlated EXISTS delete lands as deletion vectors")
    // NOT EXISTS: the anti-join — shed rows the flag table does not
    // carry at all (ids 1 and 3; 5 is present with flagged = false)
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE NOT EXISTS (SELECT 1 FROM corr_flags f
                                    WHERE f.id = t.doc_id)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(5L))
  }

  test("correlated EXISTS UPDATE with a residual target conjunct " +
      "updates exactly the semi-joined rows") {
    import spark.implicits._
    val dir = lake()
    Seq((2L, 0), (4L, 0), (5L, 0)).toDF("id", "pad")
      .createOrReplaceTempView("corr_upd_flags")
    // EXISTS ∧ plain target-side conjunct: ids {2,4,5} ∩ lang='fr' = {5}
    spark.sql(s"""UPDATE lake.`$dir` t SET n_chars = n_chars + 1000
                  WHERE EXISTS (SELECT 1 FROM corr_upd_flags f
                                WHERE f.id = t.doc_id)
                    AND t.lang = 'fr'""")
    assert(spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 1050L)))
  }

  test("correlated IN UPDATE matches on the (correlation key, value) " +
      "pair frame") {
    import spark.implicits._
    val dir = lake()
    Seq((1L, "en"), (2L, "de"), (3L, "de")).toDF("id", "l")
      .createOrReplaceTempView("corr_pairs")
    // t.lang IN (SELECT l … WHERE p.id = t.doc_id) ⟺ (doc_id, lang)
    // semi-joins (id, l): row 1 (en∈{en}) and row 3 (de∈{de}) update;
    // row 2 (en∉{de}) and rows 4/5 (no pairs) survive
    spark.sql(s"""UPDATE lake.`$dir` t SET n_chars = 0
                  WHERE t.lang IN (SELECT p.l FROM corr_pairs p
                                   WHERE p.id = t.doc_id)""")
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === (0L + 20 + 0 + 40 + 50))
  }

  test("non-equality-correlated and nested subquery DML still " +
      "refuses loudly") {
    val dir = lake()
    // correlation through an EXPRESSION of the outer column (doc_id+1)
    // is not a keyed frame — refuse, never silently mis-join
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""UPDATE lake.`$dir` SET n_chars = 0
                    WHERE EXISTS (SELECT 1 FROM lake.`$dir` o
                                  WHERE o.doc_id = doc_id + 1)""")
    }
    assert(e.getMessage.contains("subquery"), e.getMessage)
    // a scalar subquery NESTED inside a larger value expression still
    // refuses (the bare-subquery SET is the supported shape)
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"""UPDATE lake.`$dir`
                    SET n_chars = 1 + (SELECT max(n_chars)
                                       FROM lake.`$dir`)
                    WHERE doc_id = 1""")
    }
    assert(e2.getMessage.contains("larger value expression"),
      e2.getMessage)
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 150L)
  }

  test("uncorrelated scalar-subquery SET materializes one value") {
    val dir = lake()
    // one row: the corpus max lands as a literal through the COW update
    spark.sql(s"""UPDATE lake.`$dir`
                  SET n_chars = (SELECT max(n_chars) FROM lake.`$dir`)
                  WHERE doc_id = 1""")
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 190L) // 50+20+30+40+50
    // zero rows: the standard scalar-subquery NULL
    spark.sql(s"""UPDATE lake.`$dir`
                  SET n_chars = (SELECT max(n_chars) FROM lake.`$dir`
                                 WHERE doc_id > 999 AND n_chars > 0)
                  WHERE doc_id = 2""")
    assert(spark.sql(
      s"SELECT n_chars FROM lake.`$dir` WHERE doc_id = 2")
      .collect()(0).isNullAt(0))
    // more than one row: the standard cardinality error, lake untouched
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""UPDATE lake.`$dir`
                    SET n_chars = (SELECT n_chars FROM lake.`$dir`
                                   WHERE doc_id >= 3 AND doc_id <= 4)
                    WHERE doc_id = 3""")
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  test("correlated scalar-subquery SET: per-key aggregate, empty-group " +
      "NULL, COUNT's zero") {
    import spark.implicits._
    val dir = lake()
    Seq(("en", 5L), ("en", 6L), ("de", 7L)).toDF("l", "w")
      .createOrReplaceTempView("scal_src")
    // per-lang sum: en=11, de=7; fr probes an EMPTY group → NULL (the
    // aggregate's over-empty-group result — a decorrelation that
    // dropped empty groups would leave fr at 50)
    spark.sql(s"""UPDATE lake.`$dir` t
                  SET n_chars = (SELECT sum(o.w) FROM scal_src o
                                 WHERE o.l = t.lang)""")
    assert(spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).sortBy(_._1).toSeq
      === Seq((1L, Some(11L)), (2L, Some(11L)), (3L, Some(7L)),
        (4L, Some(7L)), (5L, None)))
    // COUNT over an empty group is 0, not NULL — the classic
    // decorrelation "count bug"
    spark.sql(s"""UPDATE lake.`$dir` t
                  SET n_chars = (SELECT count(*) FROM scal_src o
                                 WHERE o.l = t.lang)""")
    assert(spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      === Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L), (5L, 0L)))
  }

  test("correlated projection-shaped scalar SET: keyed value join + " +
      "the one-row-per-key cardinality check") {
    import spark.implicits._
    val dir = lake()
    Seq(("en", 100L), ("fr", 200L)).toDF("l", "w")
      .createOrReplaceTempView("proj_src")
    // plain assignments ride the same rewrite; the WHERE gates rows
    spark.sql(s"""UPDATE lake.`$dir` t
                  SET n_chars = (SELECT o.w FROM proj_src o
                                 WHERE o.l = t.lang),
                      doc_id = doc_id + 100
                  WHERE t.doc_id <= 2""")
    assert(spark.sql(s"SELECT doc_id, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      === Seq((3L, 30L), (4L, 40L), (5L, 50L),
        (101L, 100L), (102L, 100L)))
    // two source rows for one key: the standard scalar-subquery error
    Seq(("de", 1L), ("de", 2L)).toDF("l", "w")
      .createOrReplaceTempView("proj_dup")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""UPDATE lake.`$dir` t
                    SET n_chars = (SELECT o.w FROM proj_dup o
                                   WHERE o.l = t.lang)
                    WHERE t.doc_id = 3""")
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  /** Lake with a NULLABLE value column for the NOT IN three-valued
    * cases. */
  private def lakeNullable(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlcat-null").toString + "/lake"
    Seq((1L, "en", java.lang.Long.valueOf(10L)),
        (2L, "en", null.asInstanceOf[java.lang.Long]),
        (3L, "de", java.lang.Long.valueOf(30L)),
        (4L, "fr", java.lang.Long.valueOf(40L)),
        (5L, "it", null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "lang", "n_chars")
      .repartition(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  test("correlated NOT IN DELETE: exact three-valued semantics under " +
      "the non-null proof") {
    import spark.implicits._
    val dir = lakeNullable()
    Seq(("en", 10L), ("en", 99L), ("fr", 7L)).toDF("l", "w")
      .createOrReplaceTempView("notin_src")
    // row 1 (en,10): 10 ∈ {10,99} → FALSE, keep
    // row 2 (en,NULL): NULL probe vs non-empty set → NULL, keep
    // row 3 (de,30): EMPTY set → TRUE, delete
    // row 4 (fr,40): 40 ∉ {7} → TRUE, delete
    // row 5 (it,NULL): NULL probe vs EMPTY set → TRUE, delete
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.n_chars NOT IN (SELECT o.w FROM notin_src o
                                          WHERE o.l = t.lang
                                            AND o.w IS NOT NULL)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 2L))
  }

  test("correlated NOT IN UPDATE: the two disjoint arms compose; " +
      "probe/key assignment refuses; an actual NULL inner refuses at " +
      "runtime") {
    import spark.implicits._
    val dir = lakeNullable()
    Seq(("en", 10L)).toDF("l", "w").createOrReplaceTempView("notin_u")
    // row 1 (en,10): FALSE keep; row 2 (en,NULL): NULL keep;
    // rows 3/4 (de/fr, empty sets): TRUE update; row 5 (it,NULL +
    // empty set): TRUE update
    spark.sql(s"""UPDATE lake.`$dir` t SET doc_id = doc_id + 100
                  WHERE t.n_chars NOT IN (SELECT o.w FROM notin_u o
                                          WHERE o.l = t.lang
                                            AND o.w IS NOT NULL)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 103L, 104L, 105L))
    // assigning the probe column would change the statement's own
    // match between the two arms — refused
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""UPDATE lake.`$dir` t SET n_chars = 0
                    WHERE t.n_chars NOT IN (SELECT o.w FROM notin_u o
                                            WHERE o.l = t.lang
                                              AND o.w IS NOT NULL)""")
    }
    assert(e.getMessage.contains("probe"), e.getMessage)
    // notin_u's `w` came from a Scala Long — NON-NULLABLE, so a
    // filter-less NOT IN is already proven exact and legally runs
    // (rows 1/2 keep as above; nothing else matches the pair frame)
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.n_chars NOT IN (SELECT o.w FROM notin_u o
                                          WHERE o.l = t.lang)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 2L))
    // a NULLABLE inner with an ACTUAL NULL and no IS NOT NULL filter
    // has no exact translation (a NULL inner value makes NOT IN
    // never-TRUE) — the RUNTIME probe refuses, with the fix named,
    // before any commit lands
    Seq(("en", java.lang.Long.valueOf(10L)),
        ("de", null.asInstanceOf[java.lang.Long]))
      .toDF("l", "w").createOrReplaceTempView("notin_nullable")
    val before = ids(spark.sql(s"SELECT * FROM lake.`$dir`"))
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE t.n_chars NOT IN (SELECT o.w
                                            FROM notin_nullable o
                                            WHERE o.l = t.lang)""")
    }
    assert(e2.getMessage.contains("IS NOT NULL"), e2.getMessage)
    assert(e2.getMessage.contains("runtime"), e2.getMessage)
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === before,
      "the runtime refusal must land before any commit")
  }

  test("correlated NOT IN over a nullable-TYPED but null-FREE inner " +
      "runs exactly (runtime non-null proof)") {
    import spark.implicits._
    val dir = lakeNullable()
    // nullable java.lang.Long column, but no NULL value present — the
    // static proof fails, the runtime probe passes, semantics exact:
    // row 1 (en,10): 10 ∈ {10,99} → FALSE keep; row 2 (en,NULL): NULL
    // probe vs non-empty set → NULL keep; rows 3/4/5: empty sets or
    // unmatched → TRUE delete
    Seq(("en", java.lang.Long.valueOf(10L)),
        ("en", java.lang.Long.valueOf(99L)),
        ("fr", java.lang.Long.valueOf(7L)))
      .toDF("l", "w").createOrReplaceTempView("notin_nullfree")
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.n_chars NOT IN (SELECT o.w FROM notin_nullfree o
                                          WHERE o.l = t.lang)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 2L))
  }

  test("compound EXISTS conjuncts fold into one decorrelated frame") {
    import spark.implicits._
    val dir = lake()
    Seq(2L, 4L, 5L).toDF("id").createOrReplaceTempView("pair_a")
    Seq(4L).toDF("id").createOrReplaceTempView("pair_b")
    // EXISTS(a) AND NOT EXISTS(b): a's keys minus b's = {2, 5}
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE EXISTS (SELECT 1 FROM pair_a a
                                WHERE a.id = t.doc_id)
                    AND NOT EXISTS (SELECT 1 FROM pair_b b
                                    WHERE b.id = t.doc_id)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 4L))
    // EXISTS(c) AND EXISTS(d): intersection {3}
    Seq(1L, 3L).toDF("id").createOrReplaceTempView("pair_c")
    Seq(3L, 4L).toDF("id").createOrReplaceTempView("pair_d")
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE EXISTS (SELECT 1 FROM pair_c c
                                WHERE c.id = t.doc_id)
                    AND EXISTS (SELECT 1 FROM pair_d d
                                WHERE d.id = t.doc_id)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 4L))
    // NOT EXISTS(e) AND NOT EXISTS(f): anti the union — only 4 is in
    // neither
    Seq(1L).toDF("id").createOrReplaceTempView("pair_e")
    Seq(9L).toDF("id").createOrReplaceTempView("pair_f")
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE NOT EXISTS (SELECT 1 FROM pair_e e
                                    WHERE e.id = t.doc_id)
                    AND NOT EXISTS (SELECT 1 FROM pair_f f
                                    WHERE f.id = t.doc_id)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L))
    // arms correlated on DIFFERENT target columns have no single-frame
    // image — targeted refusal
    Seq("en").toDF("l").createOrReplaceTempView("pair_l")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE EXISTS (SELECT 1 FROM pair_e e
                                  WHERE e.id = t.doc_id)
                      AND EXISTS (SELECT 1 FROM pair_l x
                                  WHERE x.l = t.lang)""")
    }
    assert(e.getMessage.contains("different target column sets"),
      e.getMessage)
  }

  test("mixed IN arms in compound DML: IN/NOT IN fold with EXISTS on " +
      "the same key set; guards refuse the inexact shapes") {
    import spark.implicits._
    val dir = lake() // doc_ids 1..5
    // IN(a) AND NOT EXISTS(b): {2,4,5} minus {4} = {2,5}
    Seq(2L, 4L, 5L).toDF("id").createOrReplaceTempView("mix_a")
    Seq(4L).toDF("id").createOrReplaceTempView("mix_b")
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.doc_id IN (SELECT a.id FROM mix_a a)
                    AND NOT EXISTS (SELECT 1 FROM mix_b b
                                    WHERE b.id = t.doc_id)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 4L))
    // IN(c) AND NOT IN(d) — non-nullable Scala Long inners, one
    // positive and one negative arm → Except: {3,4} \ {4,9} = {3}
    Seq(3L, 4L).toDF("id").createOrReplaceTempView("mix_c")
    Seq(4L, 9L).toDF("id").createOrReplaceTempView("mix_d")
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.doc_id IN (SELECT c.id FROM mix_c c)
                    AND t.doc_id NOT IN (SELECT d.id FROM mix_d d)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 4L))
    // an IN arm keyed on a different column than the EXISTS arm —
    // targeted mismatched-key-set refusal
    Seq("en").toDF("l").createOrReplaceTempView("mix_l")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE t.lang IN (SELECT x.l FROM mix_l x)
                      AND NOT EXISTS (SELECT 1 FROM mix_b b
                                      WHERE b.id = t.doc_id)""")
    }
    assert(e.getMessage.contains("different target column sets"),
      e.getMessage)
    // a compound NOT IN arm with a NULLABLE inner and no IS NOT NULL
    // refuses with the fix named (no runtime-probe escape in compounds)
    Seq(java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long])
      .toDF("id").createOrReplaceTempView("mix_nullable")
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE t.doc_id IN (SELECT c.id FROM mix_c c)
                      AND t.doc_id NOT IN (SELECT n.id
                                           FROM mix_nullable n)""")
    }
    assert(e2.getMessage.contains("IS NOT NULL"), e2.getMessage)
    // ...and WITH the IS NOT NULL filter the same statement runs
    spark.sql(s"""DELETE FROM lake.`$dir` t
                  WHERE t.doc_id IN (SELECT c.id FROM mix_c c)
                    AND t.doc_id NOT IN (SELECT n.id FROM mix_nullable n
                                         WHERE n.id IS NOT NULL)""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L))
  }

  test("a non-deterministic UPDATE refuses loudly, lake untouched") {
    val dir = lake()
    // rand() could flip between the match scan and the rewrite —
    // updating a different row set than it scanned
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE lake.`$dir` SET n_chars = 0 WHERE rand() < 0.5")
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE lake.`$dir` SET n_chars = CAST(rand() AS BIGINT)")
    }
    assert(e2.getMessage.contains("deterministic"), e2.getMessage)
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 150L)
  }

  test("DML referencing current_timestamp/current_date refuses loudly") {
    val dir = lake()
    // Catalyst marks these deterministic but pins a FRESH instant per
    // query — and the COW DML runs its match scan and rewrite as two
    // queries, so a time-window boundary could differ between them
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"""UPDATE lake.`$dir` SET n_chars = 0
                    WHERE doc_id > unix_timestamp(current_timestamp())""")
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir`
                    WHERE doc_id % 2 = 0
                      AND current_date() > DATE'1970-01-01'""")
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 150L)
  }

  test("a DELETE denser than the DV cap falls back to copy-on-write") {
    val dir = lake()
    val fs = fsOf(dir)
    spark.conf.set("spark.graft.dml.dvMaxPositions", "1")
    try {
      // expression route: 3 victims > cap 1 → the COW path, no vectors
      spark.sql(s"DELETE FROM lake.`$dir` WHERE n_chars <= 30")
      val m = FileManifest.latest(fs, dir).get
      assert(m.dvs.isEmpty, "dense delete must land copy-on-write")
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(4L, 5L))
      // keyed route: the key-list over the cap falls back the same way
      spark.sql(s"DELETE FROM lake.`$dir` WHERE doc_id IN (4, 5, 6)")
      assert(FileManifest.latest(fs, dir).get.dvs.isEmpty)
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq.empty)
    } finally spark.conf.unset("spark.graft.dml.dvMaxPositions")
  }

  test("dense frame-keyed DELETEs (correlated EXISTS / NOT IN) fall " +
      "back to copy-on-write like every other route") {
    import spark.implicits._
    val dir = lakeNullable()
    val fs = fsOf(dir)
    Seq(("en", 10L), ("en", 99L), ("fr", 7L)).toDF("l", "w")
      .createOrReplaceTempView("notin_cow")
    spark.conf.set("spark.graft.dml.dvMaxPositions", "1")
    try {
      // correlated NOT IN, 3 victims total: the non-null arm (rows
      // 3, 4 > cap 1) must fall back to COW instead of failing; the
      // null arm (row 5 alone) legally stays under the cap and lands
      // a vector — each arm picks its own shape, the result is exact
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE t.n_chars NOT IN (SELECT o.w FROM notin_cow o
                                            WHERE o.l = t.lang
                                              AND o.w IS NOT NULL)""")
      val m1 = FileManifest.latest(fs, dir).get
      assert(m1.dvs.size <= 1,
        s"the dense arm must land copy-on-write, not vectors: ${m1.dvs}")
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(1L, 2L))
      // correlated EXISTS (semi arm): both remaining rows are en →
      // 2 victims > cap → the COW matched route
      spark.sql(s"""DELETE FROM lake.`$dir` t
                    WHERE EXISTS (SELECT 1 FROM notin_cow o
                                  WHERE o.l = t.lang)""")
      // no NEW vector landed for the 2-victim semi arm (the surviving
      // d2-p1 vector belongs to the earlier null arm, whose file this
      // delete never touched)
      assert(FileManifest.latest(fs, dir).get.dvs.size <= 1)
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq.empty)
    } finally spark.conf.unset("spark.graft.dml.dvMaxPositions")
  }

  test("INSERT OVERWRITE restates the whole lake in one flip") {
    val dir = lake()
    val fs = fsOf(dir)
    val vBefore = FileManifest.latest(fs, dir).get.version
    // table column order: data cols then the partition col (lang)
    spark.sql(s"""INSERT OVERWRITE lake.`$dir`
                  VALUES (7, 70, 'it'), (8, 80, 'it')""")
    val m = FileManifest.latest(fs, dir).get
    assert(m.version === vBefore + 1,
      "one commit — never a delete+insert pair")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(7L, 8L))
    // the restated rows landed in the lake's directory layout
    assert(m.cur.forall(_.startsWith("lang=")), m.cur.mkString(","))
    // pre-restatement time travel still answers
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF $vBefore")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // a constraint-violating restatement bounces whole
    History.declareSchema(spark, dir): Unit
    graft.sources.Constraints.add(spark, dir, "chars_pos",
      "n_chars > 0"): Unit
    intercept[IllegalArgumentException] {
      spark.sql(s"INSERT OVERWRITE lake.`$dir` VALUES (9, -1, 'de')")
    }
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(7L, 8L))
  }

  test("INSERT OVERWRITE PARTITION restates exactly the named partition") {
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    val untouched = before.cur.filterNot(_.startsWith("lang=en"))
    // static partition overwrite: replace lang=en (ids 1,2) with id 10
    spark.sql(s"""INSERT OVERWRITE lake.`$dir` PARTITION (lang = 'en')
                  VALUES (10, 100)""")
    val m = FileManifest.latest(fs, dir).get
    assert(m.version === before.version + 1, "one flip, one commit")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(3L, 4L, 5L, 10L))
    // untouched partitions' files are byte-identical (same rel paths)
    assert(untouched.forall(m.cur.contains),
      s"non-en files must survive untouched: ${m.cur.mkString(",")}")
    // pre-overwrite time travel still answers
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${before.version}")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // overwriting a partition with a DISJOINT filter clears it: an
    // empty source restates lang=de to nothing
    spark.sql(s"""INSERT OVERWRITE lake.`$dir` PARTITION (lang = 'de')
                  SELECT doc_id, n_chars FROM lake.`$dir` WHERE false""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(5L, 10L))
    // DYNAMIC-mode overwrite routes through the extension rule to
    // History.overwritePartitions — the full behavior is pinned in
    // its own test below; here just confirm the verb no longer goes
    // dark mid-lifecycle
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql(s"""INSERT OVERWRITE lake.`$dir` PARTITION (lang)
                    SELECT doc_id, n_chars, lang FROM lake.`$dir`
                    WHERE doc_id = 5""")
    finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(5L, 10L))
  }

  test("layout memory: a truncated lake's next writes still land " +
      "partitioned (retired files donate the scheme)") {
    import spark.implicits._
    val dir = lake()
    val fs = fsOf(dir)
    // full truncate: current file set empty, layout only in retired
    spark.sql(s"DELETE FROM lake.`$dir`")
    assert(FileManifest.latest(fs, dir).get.cur.isEmpty)
    // MERGE-insert into the empty lake (the round-16 deep-fuzz seed-509
    // shape): the staged write must land in the k=v layout, or every
    // dir-pruned read would go blind to the rows
    Seq((7L, "de", 70L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("mem_src")
    spark.sql(s"""MERGE INTO lake.`$dir` t USING mem_src s
                  ON t.doc_id = s.doc_id
                  WHEN NOT MATCHED THEN INSERT *""")
    // SQL INSERT too
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (8, 80, 'fr')")
    val m = FileManifest.latest(fs, dir).get
    assert(m.cur.nonEmpty && m.cur.forall(_.startsWith("lang=")),
      s"post-truncate writes must keep the layout: ${m.cur.mkString(",")}")
    // the dir-pruned read sees the rows
    assert(History.readPinnedPartitions(spark, dir, _ == "lang=de")
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) === Seq(7L, 8L))
  }

  test("dynamic-mode INSERT OVERWRITE restates exactly the partitions " +
      "the query produced") {
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    val untouched = before.cur.filterNot(_.startsWith("lang=en"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the query produces rows for lang=en ONLY → exactly that
      // partition restates; de and fr survive byte-identical
      spark.sql(s"""INSERT OVERWRITE lake.`$dir`
                    VALUES (11, 110, 'en'), (12, 120, 'en')""")
      val m = FileManifest.latest(fs, dir).get
      assert(m.version === before.version + 1, "one flip, one commit")
      assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
        Seq(3L, 4L, 5L, 11L, 12L))
      assert(untouched.forall(m.cur.contains),
        s"unproduced partitions must survive untouched: " +
          m.cur.mkString(","))
      // pre-overwrite time travel still answers
      assert(ids(spark.sql(
        s"SELECT * FROM lake.`$dir` VERSION AS OF ${before.version}")) ===
        Seq(1L, 2L, 3L, 4L, 5L))
      // an UNPARTITIONED lake under dynamic mode: Spark itself plans
      // the truncate path (no partition columns to be dynamic over) —
      // the whole-lake restatement, standard semantics
      import spark.implicits._
      val flat = java.nio.file.Files
        .createTempDirectory("graft-sqlcat-dynflat").toString + "/lake"
      Seq((1L, 10L)).toDF("doc_id", "n_chars").write.parquet(flat)
      History.enableManifests(spark, flat): Unit
      spark.sql(s"INSERT OVERWRITE lake.`$flat` VALUES (2, 20)")
      assert(ids(spark.sql(s"SELECT * FROM lake.`$flat`")) === Seq(2L))
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("overwriteWhere refuses rows outside the overwritten region " +
      "and undecidable filters") {
    import spark.implicits._
    val dir = lake()
    // a batch holding lang=de rows cannot land under a lang='en'
    // restatement — the row would survive in a directory the
    // statement did not restate
    val e = intercept[IllegalArgumentException] {
      History.overwriteWhere(spark, dir,
        Seq((10L, "de", 100L)).toDF("doc_id", "lang", "n_chars"),
        Seq(org.apache.spark.sql.sources.EqualTo("lang", "en")))
    }
    assert(e.getMessage.contains("OUTSIDE"), e.getMessage)
    // a non-partition-column filter is not decidable per file
    val e2 = intercept[UnsupportedOperationException] {
      History.overwriteWhere(spark, dir,
        Seq((10L, "en", 100L)).toDF("doc_id", "lang", "n_chars"),
        Seq(org.apache.spark.sql.sources.EqualTo("doc_id", 1L)))
    }
    assert(e2.getMessage.contains("partition-decidable"), e2.getMessage)
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("SQL MERGE INTO upserts through the keyed engine merge") {
    import spark.implicits._
    val dir = lake()
    val fs = fsOf(dir)
    val before = FileManifest.latest(fs, dir).get
    // source: corrections for 2 and 3, plus a brand-new row 9 — column
    // order deliberately differs from the target (SET * maps by name)
    Seq(("en", 2L, 222L), ("de", 3L, 333L), ("xx", 9L, 999L))
      .toDF("lang", "doc_id", "n_chars")
      .createOrReplaceTempView("merge_src")
    val receipt = spark.sql(
      s"""MERGE INTO lake.`$dir` t USING merge_src s
          ON t.doc_id = s.doc_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(receipt.map(_._2) === Seq(2L), "two lake rows replaced")
    val got = spark.sql(
      s"SELECT doc_id, lang, n_chars FROM lake.`$dir`")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "en", 10L), (2L, "en", 222L),
      (3L, "de", 333L), (4L, "de", 40L), (5L, "fr", 50L),
      (9L, "xx", 999L)))
    // file-granular: the fr file held no matched key and survives
    val after = FileManifest.latest(fs, dir).get
    assert(before.cur.filter(_.startsWith("lang=fr"))
      .forall(after.cur.contains), after.cur.mkString(","))
    // pre-merge time travel still answers
    assert(ids(spark.sql(
      s"SELECT * FROM lake.`$dir` VERSION AS OF ${before.version}")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("non-upsert MERGE shapes refuse loudly, lake untouched") {
    import spark.implicits._
    val dir = lake()
    Seq((2L, "en", 222L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("merge_src2")
    def refuses(sql: String): Unit = {
      val e = intercept[UnsupportedOperationException] {
        spark.sql(sql)
      }
      assert(e.getMessage.contains("use the engine operator"),
        e.getMessage)
    }
    // (matched DELETE, conditional arms, and partial SET lists are
    // now SUPPORTED — MergeCdcSpec covers them; these stay refused:)
    // SET value over a TARGET column (values replay on the source)
    refuses(s"""MERGE INTO lake.`$dir` t USING merge_src2 s
                ON t.doc_id = s.doc_id
                WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + 1
                WHEN NOT MATCHED THEN INSERT *""")
    // key-column reassignment (row identity under the keyed merge)
    refuses(s"""MERGE INTO lake.`$dir` t USING merge_src2 s
                ON t.doc_id = s.doc_id
                WHEN MATCHED THEN UPDATE SET doc_id = s.doc_id * 10""")
    // non-equality ON
    refuses(s"""MERGE INTO lake.`$dir` t USING merge_src2 s
                ON t.doc_id >= s.doc_id
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("MERGE with duplicate source keys refuses (ambiguous upsert)") {
    import spark.implicits._
    val dir = lake()
    Seq((2L, "en", 1L), (2L, "en", 2L)).toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("merge_dup")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO lake.`$dir` t USING merge_dup s
                    ON t.doc_id = s.doc_id
                    WHEN MATCHED THEN UPDATE SET *
                    WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
    assert(spark.sql(s"SELECT n_chars FROM lake.`$dir` WHERE doc_id = 2")
      .collect().map(_.getLong(0)).toSeq === Seq(20L))
  }

  test("DELETE carries full expression power under the extension") {
    val dir = lake()
    val fs = fsOf(dir)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    // `%` has no source-filter image — the capability path
    // (extension-less sessions) refuses it exactly; the extension
    // rule routes it straight to the engine's DV takedown, returning
    // the engine receipt
    val receipt = spark.sql(
      s"DELETE FROM lake.`$dir` WHERE doc_id % 2 = 0")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(receipt.map(_._2) === Seq(2L))
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 5L))
    assert(FileManifest.latest(fs, dir).get.cur.toSet === filesBefore,
      "merge-on-read: zero data files rewritten")
    // non-determinism and non-materializable subqueries (a bare
    // uncorrelated IN is now materialized — see the IN-subquery test)
    // still refuse loudly
    intercept[UnsupportedOperationException] {
      spark.sql(s"DELETE FROM lake.`$dir` WHERE rand() < 0.5")
    }
    intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM lake.`$dir`
                    WHERE n_chars > (SELECT avg(n_chars)
                                     FROM lake.`$dir`)""")
    }
    assert(ids(spark.sql(s"SELECT * FROM lake.`$dir`")) ===
      Seq(1L, 3L, 5L))
  }
}
