package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.History

/** Lake schema evolution: a record column added mid-life must survive
  * every read AND — critically — every compaction rewrite. The default
  * single-footer parquet inference silently omits late columns; a
  * compaction reading that way would DROP the column from rewritten
  * rows (data loss), which is why compactLatest merges footers. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def seedEvolvedLake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // era 1: (siteId, ts) — before the schema gained `quality`
    Seq(("ROZ", "2019-10-03", "2087", 100L), ("ROZ", "2019-10-03", "8", 100L))
      .toDF("region", "dt", "siteId", "ts")
      .write.partitionBy("region", "dt").mode("append").parquet(dir)
    // era 2: same partition grows a `quality` column (newer ts for 2087),
    // plus a fresh partition written entirely post-evolution
    Seq(("ROZ", "2019-10-03", "2087", 200L, 0.9),
        ("ROZ", "2019-10-04", "2087", 300L, 0.7))
      .toDF("region", "dt", "siteId", "ts", "quality")
      .write.partitionBy("region", "dt").mode("append").parquet(dir)
    dir
  }

  test("readEvolved surfaces late columns; plain read may miss them") {
    val dir = seedEvolvedLake()
    val ev = History.readEvolved(spark, dir)
    assert(ev.columns.toSet ===
      Set("region", "dt", "siteId", "ts", "quality"))
    // era-1 rows are null-filled, era-2 rows carry their values
    val q = ev.select("siteId", "ts", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(q === Set(("2087", 100L, None), ("8", 100L, None),
      ("2087", 200L, Some(0.9)), ("2087", 300L, Some(0.7))))
  }

  test("compaction preserves a column added mid-life (no rewrite loss)") {
    val dir = seedEvolvedLake()
    // compact the MIXED-schema partition: latest-wins on (siteId)
    History.compactLatest(spark, dir, Seq("siteId"), "ts",
      col("dt") === "2019-10-03")
    val after = History.readEvolved(spark, dir)
    assert(after.columns.toSet ===
      Set("region", "dt", "siteId", "ts", "quality"),
      "compaction rewrite lost a late-added column")
    val rows = after // partition inference types dt as DATE; compare as string
      .select(col("dt").cast("string"), col("siteId"), col("ts"),
        col("quality")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    // 2087 kept its NEWEST era-2 record with quality intact; site 8's
    // era-1 record survives null-filled; day 2 untouched
    assert(rows === Set(
      ("2019-10-03", "2087", 200L, Some(0.9)),
      ("2019-10-03", "8", 100L, None),
      ("2019-10-04", "2087", 300L, Some(0.7))), rows.mkString(";"))
    // the compacted partition now has ONE unified-schema file set: a
    // plain (non-merged) read of that partition sees the full schema
    val plain = spark.read.parquet(s"$dir/region=ROZ/dt=2019-10-03")
    assert(plain.columns.toSet === Set("siteId", "ts", "quality"))
  }

  // ---------------------------------------------------------------
  // Declared-schema mode (SchemaLog): committed table schema, type
  // WIDENING (which footer-merge cannot do), write validation.
  // ---------------------------------------------------------------

  import org.apache.spark.sql.types._
  import graft.sources.SchemaLog

  /** Manifest lake seeded with a narrow era-1 batch (id INT, v FLOAT),
    * schema declared, then evolved to (id LONG, v DOUBLE, + score
    * DOUBLE) with an era-2 batch appended through the validated path. */
  private def declaredLake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-declared").toString + "/lake"
    Seq((1, 1.5f, "a"), (2, 2.5f, "b"))
      .toDF("id", "v", "tag").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    assert(History.declareSchema(spark, dir) === 1L)
    val next = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType), StructField("score", DoubleType)))
    assert(History.evolveSchema(spark, dir, next) === 2L)
    History.append(spark, dir,
      Seq((3L, 3.5d, "c", 0.9), (4L, 4.5d, "d", 0.7))
        .toDF("id", "v", "tag", "score"),
      key = "era2"): Unit
    dir
  }

  test("declared schema: widening + added column across file eras") {
    val dir = declaredLake()
    val df = History.readPinned(spark, dir)
    // every file — INT32/FLOAT era-1, LONG/DOUBLE era-2 — reads back as
    // the ONE declared shape: ids promoted, score null-backfilled.
    // footer-merge would have FAILED here (IntegerType vs LongType).
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("id", LongType), ("v", DoubleType),
      ("tag", StringType), ("score", DoubleType)))
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(rows === Set(
      (1L, 1.5d, "a", None), (2L, 2.5d, "b", None),
      (3L, 3.5d, "c", Some(0.9)), (4L, 4.5d, "d", Some(0.7))))
    // readEvolved resolves to the same declared-schema plan
    assert(History.readEvolved(spark, dir).collect().length === 4)
  }

  test("declared schema: time travel projects old snapshots to it") {
    val dir = declaredLake()
    val vs = History.versions(spark, dir)
    val v1 = History.readPinned(spark, dir, vs.head)
    // vs.head predates the DECLARATION itself (its manifest carries no
    // schema stamp), so the era resolution falls back to the CURRENT
    // declared shape — the pre-stamp contract, still the right one
    // when no era record exists
    assert(v1.schema.fieldNames.toSeq === Seq("id", "v", "tag", "score"))
    val rows = v1.collect().map(r => (r.getLong(0),
      Option(r.get(3)))).toSet
    assert(rows === Set((1L, None), (2L, None)))
  }

  // ---------------------------------------------------------------
  // SNAPSHOT-ERA schema: a pinned read resolves the declaration AS OF
  // the pinned commit (the manifest's schema stamp), so history keeps
  // its shape across drops, renames, and widenings.
  // ---------------------------------------------------------------

  test("era schema: a pre-drop pin still shows the dropped column") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-drop").toString + "/lake"
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "n", "tag")
      .write.parquet(dir)
    History.enableManifests(spark, dir): Unit                 // v1, no stamp
    History.declareSchema(spark, dir): Unit                   // schema 1
    History.append(spark, dir,
      Seq((3L, 30L, "c")).toDF("id", "n", "tag"), key = "e1"): Unit // v2 @s1
    val vPre = History.versions(spark, dir).last
    SchemaLog.dropColumn(spark, dir, "tag"): Unit             // schema 2
    History.append(spark, dir,
      Seq((4L, 40L)).toDF("id", "n"), key = "e2"): Unit       // v3 @s2
    // LATEST: the drop applies — tag is gone
    assert(History.readPinned(spark, dir).schema.fieldNames.toSeq ===
      Seq("id", "n"))
    // PRE-DROP PIN: the era schema still carries tag, with its values
    val pre = History.readPinned(spark, dir, vPre)
    assert(pre.schema.fieldNames.toSeq === Seq("id", "n", "tag"))
    assert(pre.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // POST-DROP PIN: era schema 2 — no tag, and the era-3 row included
    val post = History.readPinned(spark, dir,
      History.versions(spark, dir).last)
    assert(post.schema.fieldNames.toSeq === Seq("id", "n"))
    assert(post.count() === 4)
  }

  test("era schema: a pre-rename pin shows the old column name") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-ren").toString + "/lake"
    Seq((1L, "x"), (2L, "y")).toDF("id", "label").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit                   // schema 1
    History.append(spark, dir,
      Seq((3L, "z")).toDF("id", "label"), key = "e1"): Unit   // v2 @s1
    val vPre = History.versions(spark, dir).last
    SchemaLog.renameColumn(spark, dir, "label", "name"): Unit // schema 2
    History.append(spark, dir,
      Seq((4L, "w")).toDF("id", "name"), key = "e2"): Unit    // v3 @s2
    // LATEST: the rename applies across all eras (alias coalesce)
    val latest = History.readPinned(spark, dir)
    assert(latest.schema.fieldNames.toSeq === Seq("id", "name"))
    assert(latest.select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")))
    // PRE-RENAME PIN: the era declaration still names it `label`
    val pre = History.readPinned(spark, dir, vPre)
    assert(pre.schema.fieldNames.toSeq === Seq("id", "label"))
    assert(pre.select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("era schema: a pre-widening pin keeps the narrow type") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-wide").toString + "/lake"
    Seq((1, 1.5f), (2, 2.5f)).toDF("id", "v").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit                   // schema 1
    History.append(spark, dir,
      Seq((3, 3.5f)).toDF("id", "v"), key = "e1"): Unit       // v2 @s1
    val vPre = History.versions(spark, dir).last
    val declared = History.declaredSchema(spark, dir).get
    History.evolveSchema(spark, dir, StructType(declared.fields.map {
      case f if f.name == "id" => f.copy(dataType = LongType)
      case f if f.name == "v" => f.copy(dataType = DoubleType)
      case f => f
    })): Unit                                                  // schema 2
    History.append(spark, dir,
      Seq((4L, 4.5d)).toDF("id", "v"), key = "e2"): Unit      // v3 @s2
    // LATEST: widened — every era promotes
    assert(History.readPinned(spark, dir).schema.fields
      .map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("v", DoubleType)))
    // PRE-WIDENING PIN: the era declaration is still (INT, FLOAT) —
    // exact because every file that manifest references was validated
    // against a declaration no wider than the stamp
    val pre = History.readPinned(spark, dir, vPre)
    assert(pre.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", IntegerType), ("v", FloatType)))
    assert(pre.collect().map(r => (r.getInt(0), r.getFloat(1))).toSet ===
      Set((1, 1.5f), (2, 2.5f), (3, 3.5f)))
  }

  test("era schema composes with deletion vectors and the SQL pin") {
    import spark.implicits._
    val s = spark
    s.conf.set("spark.sql.catalog.lake",
      classOf[graft.sources.LakeCatalog].getName)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-dv").toString + "/lake"
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "n", "tag").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit                   // schema 1
    // a DV takedown UNDER the pre-drop schema (no files rewritten)
    History.deleteWhereDV(spark, dir, col("id") === 2L, 1000L): Unit
    val vPre = History.versions(spark, dir).last
    SchemaLog.dropColumn(spark, dir, "tag"): Unit             // schema 2
    History.append(spark, dir, Seq((4L, 40L)).toDF("id", "n"),
      key = "e2"): Unit
    // the engine pin: era schema (tag present) AND the vectors applied
    val pre = History.readPinned(spark, dir, vPre)
    assert(pre.schema.fieldNames.toSeq === Seq("id", "n", "tag"))
    assert(pre.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (3L, "c")))
    // the SQL pin routes the DV-bearing era snapshot through the
    // engine read (PinnedLakeTable) — same schema, same row set
    val viaSql = s.sql(
      s"SELECT id, tag FROM lake.`$dir` VERSION AS OF $vPre")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql === Set((1L, "a"), (3L, "c")))
    // the pinned table advertises the ERA schema version it resolves
    val cat = s.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val pinned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir), vPre.toString)
    assert(pinned.properties().get("graft.schema.version") === "1")
    assert(pinned.schema().fieldNames.toSeq === Seq("id", "n", "tag"))
    // latest keeps the present declaration
    assert(History.readPinned(spark, dir).schema.fieldNames.toSeq ===
      Seq("id", "n"))
  }

  test("DDL is a commit: a tag taken right after a rename pins the " +
      "post-rename declaration; #history audits the stamps") {
    import spark.implicits._
    val s = spark
    s.conf.set("spark.sql.catalog.lake",
      classOf[graft.sources.LakeCatalog].getName)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-gran").toString + "/lake"
    Seq((1L, "x")).toDF("id", "label").write.parquet(dir)
    History.enableManifests(spark, dir): Unit                 // v1 no stamp
    History.declareSchema(spark, dir): Unit            // schema 1 → v2 @s1
    History.append(spark, dir, Seq((2L, "y")).toDF("id", "label"),
      key = "e1"): Unit                                        // v3 @s1
    val vPre = History.versions(spark, dir).last
    SchemaLog.renameColumn(spark, dir, "label", "name"): Unit
    // the rename ITSELF published a data-identical manifest version
    // stamped with schema 2 (DDL-as-commit, the round-18 closing-sweep
    // lag closed): a TAG taken between the rename and the next data
    // commit pins the POST-rename declaration — no one-commit lag
    val vDdl = History.versions(spark, dir).last
    assert(vDdl === vPre + 1, "the rename must publish a version")
    History.tag(spark, dir, "between"): Unit
    assert(History.readTag(spark, dir, "between")
      .schema.fieldNames.toSeq === Seq("id", "name"))
    // the DDL version is data-identical to its predecessor
    assert(History.readTag(spark, dir, "between")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L))
    assert(History.readPinned(spark, dir).schema.fieldNames.toSeq ===
      Seq("id", "name"))
    // pre-rename pins still answer under the OLD name (era schema)
    assert(History.readPinned(spark, dir, vPre)
      .schema.fieldNames.toSeq === Seq("id", "label"))
    History.append(spark, dir, Seq((3L, "z")).toDF("id", "name"),
      key = "e2"): Unit
    val vPost = History.versions(spark, dir).last
    assert(History.readPinned(spark, dir, vPost)
      .schema.fieldNames.toSeq === Seq("id", "name"))
    // #history audits exactly which stamp each version's pins resolve
    val stamps = s.sql(
      s"SELECT version, schema_version FROM lake.`$dir#history`")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(stamps(1L) === None)        // pre-declaration commit
    assert(stamps(vPre) === Some(1L))  // pre-rename era
    assert(stamps(vDdl) === Some(2L))  // the rename's own version
    assert(stamps(vPost) === Some(2L)) // post-rename era
  }

  test("era schema: a pinned export carries the as-of declaration") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-era-exp").toString + "/lake"
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "n", "tag")
      .write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit                   // schema 1
    History.append(spark, dir,
      Seq((3L, 30L, "c")).toDF("id", "n", "tag"), key = "e1"): Unit
    val vPre = History.versions(spark, dir).last
    SchemaLog.dropColumn(spark, dir, "tag"): Unit             // schema 2
    History.append(spark, dir,
      Seq((4L, 40L)).toDF("id", "n"), key = "e2"): Unit
    // PRE-DROP EXPORT: the clone declares the ERA schema, so it reads
    // back with tag — identical to readPinned(src, vPre) — and its own
    // tombstones still block re-adding a retired name
    val dest = java.nio.file.Files
      .createTempDirectory("graft-era-exp-dst").toString + "/clone"
    History.exportSnapshot(spark, dir, dest, version = Some(vPre)): Unit
    val clone = History.readPinned(spark, dest)
    assert(clone.schema.fieldNames.toSeq === Seq("id", "n", "tag"))
    assert(clone.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // LATEST EXPORT keeps carrying the present declaration
    val dest2 = java.nio.file.Files
      .createTempDirectory("graft-era-exp-dst2").toString + "/clone"
    History.exportSnapshot(spark, dir, dest2): Unit
    assert(History.readPinned(spark, dest2).schema.fieldNames.toSeq ===
      Seq("id", "n"))
  }

  test("undrop: the tombstone-releasing undo resurrects original " +
      "values exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-undrop").toString + "/lake"
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "n", "tag")
      .write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit                   // s1
    SchemaLog.dropColumn(spark, dir, "tag"): Unit             // s2
    // the dropped window: writes carry no tag bytes
    History.append(spark, dir, Seq((3L, 30L)).toDF("id", "n"),
      key = "win"): Unit
    // re-adding under a NEW identity still refuses (the hazard)
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir, StructType(
        History.declaredSchema(spark, dir).get.fields :+
          StructField("tag", StringType)))
    }
    // the EXPLICIT undo: field returns as last declared
    SchemaLog.undropColumn(spark, dir, "tag"): Unit           // s3
    History.append(spark, dir,
      Seq((4L, 40L, "d")).toDF("id", "n", "tag"), key = "e3"): Unit
    val rows = History.readPinned(spark, dir)
      .select("id", "tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows === Set((1L, Some("a")), (2L, Some("b")),
      (3L, None), (4L, Some("d"))))
    // the tombstone is RELEASED — but the live column blocks re-add
    // through the exists check, and undropping a live column refuses
    intercept[IllegalArgumentException] {
      SchemaLog.undropColumn(spark, dir, "tag")
    }
    intercept[IllegalArgumentException] {
      SchemaLog.undropColumn(spark, dir, "never_existed")
    }
  }

  test("undrop: a dropped RENAMED column returns with its lineage; " +
      "rename aliases alone refuse") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-undrop-ren").toString + "/lake"
    Seq((1L, "x")).toDF("id", "v").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit
    SchemaLog.renameColumn(spark, dir, "v", "w"): Unit
    // un-dropping the retired ALIAS of a live column refuses (that is
    // a rename, not a drop — the live column owns those files)
    val e = intercept[IllegalArgumentException] {
      SchemaLog.undropColumn(spark, dir, "v")
    }
    assert(e.getMessage.contains("renamed"), e.getMessage)
    SchemaLog.dropColumn(spark, dir, "w"): Unit
    SchemaLog.undropColumn(spark, dir, "w"): Unit
    // the lineage came back with the field: pre-rename files still
    // resolve their `v` bytes under `w`
    assert(History.readPinned(spark, dir).select("id", "w").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "x")))
  }

  test("undrop: a TOMBSTONED rename alias refuses, naming the final " +
      "name (no pre-rename resurrection)") {
    import spark.implicits._
    // rename a→b, drop b: BOTH names tombstone. Undropping 'a' must
    // refuse — resurrecting the pre-rename declaration would revive a
    // field without b's lineage, and a later UNDROP b would then
    // declare two live columns over the same physical bytes (ADVICE
    // r18). The refusal names the drop-time FINAL name to undrop.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-undrop-lin").toString + "/lake"
    Seq((1L, "x")).toDF("id", "a").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit
    SchemaLog.renameColumn(spark, dir, "a", "b"): Unit
    SchemaLog.dropColumn(spark, dir, "b"): Unit
    val e = intercept[IllegalArgumentException] {
      SchemaLog.undropColumn(spark, dir, "a")
    }
    assert(e.getMessage.contains("rename lineage") &&
      e.getMessage.contains("'b'"), e.getMessage)
    // the sanctioned undo still works and brings the lineage back
    SchemaLog.undropColumn(spark, dir, "b"): Unit
    assert(History.readPinned(spark, dir).select("id", "b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "x")))
    // and 'a' is re-covered as b's live alias — still not undroppable
    val e2 = intercept[IllegalArgumentException] {
      SchemaLog.undropColumn(spark, dir, "a")
    }
    assert(e2.getMessage.contains("renamed"), e2.getMessage)
  }

  test("two drops on one lake compose (tombstone file rewrite, not " +
      "no-overwrite collision)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-2drop").toString + "/lake"
    Seq((1L, 10L, "a", 1.5d)).toDF("id", "n", "tag", "score")
      .write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.declareSchema(spark, dir): Unit
    SchemaLog.dropColumn(spark, dir, "tag"): Unit
    // the SECOND drop re-publishes the retired list over the first's
    // file — the no-overwrite primitive would collide here
    SchemaLog.dropColumn(spark, dir, "score"): Unit
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(SchemaLog.retiredNames(fs, dir).toSet === Set("tag", "score"))
    assert(History.readPinned(spark, dir).columns.toSeq === Seq("id", "n"))
  }

  test("illegal evolutions are rejected") {
    val dir = declaredLake()
    val declared = History.declaredSchema(spark, dir).get
    def evolved(f: Seq[StructField] => Seq[StructField]) =
      StructType(f(declared.fields.toSeq))
    // drop a column
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir, evolved(_.filterNot(_.name == "v")))
    }
    // rename (drop + add reads as a drop of the old name)
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir,
        evolved(_.map(f => if (f.name == "v") f.copy(name = "value") else f)))
    }
    // narrow long -> int
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir,
        evolved(_.map(f =>
          if (f.name == "id") f.copy(dataType = IntegerType) else f)))
    }
    // add a REQUIRED column (old files cannot supply it)
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir,
        evolved(_ :+ StructField("req", StringType, nullable = false)))
    }
    // tighten nullability on an existing column
    intercept[IllegalArgumentException] {
      History.evolveSchema(spark, dir,
        evolved(_.map(f =>
          if (f.name == "tag") f.copy(nullable = false) else f)))
    }
    // string re-typing is not a widening
    assert(!SchemaLog.widensTo(StringType, LongType))
    assert(!SchemaLog.widensTo(DoubleType, FloatType))
    assert(SchemaLog.widensTo(ByteType, LongType))
  }

  test("writes are validated against the declared schema") {
    import spark.implicits._
    val dir = declaredLake()
    // unknown column: evolve first
    val extra = intercept[IllegalArgumentException] {
      History.append(spark, dir,
        Seq((9L, 9.5d, "x", 0.1, "oops"))
          .toDF("id", "v", "tag", "score", "extra"), key = "bad1")
    }
    assert(extra.getMessage.contains("extra"))
    // wider than declared (declared tag STRING, write... declared id is
    // LONG — a DECIMAL id is not narrower, must be rejected)
    val wide = intercept[IllegalArgumentException] {
      History.append(spark, dir,
        Seq(("9", 9.5d, "x")).toDF("id", "v", "tag"), key = "bad2")
    }
    assert(wide.getMessage.contains("id"))
    // NARROWER batch stays legal (an old writer mid-evolution): id INT,
    // v FLOAT, no score — reads backfill and widen
    import org.apache.spark.sql.functions.{col => c}
    History.append(spark, dir,
      Seq((5, 5.5f, "e")).toDF("id", "v", "tag"), key = "era1-late"): Unit
    val row = History.readPinned(spark, dir).where(c("id") === 5L).collect()
    assert(row.map(r => (r.getLong(0), r.getDouble(1),
      Option(r.get(3)))).toSeq === Seq((5L, 5.5d, None)))
    // a failed append stages nothing into the manifest
    assert(History.readPinned(spark, dir).count() === 5)
  }

  test("copy-on-write rewrites converge files onto the declared schema") {
    import org.apache.spark.sql.functions.{col => c, lit => l}
    val dir = declaredLake()
    // delete one era-1 row: the rewrite reads era-1 files through the
    // declared schema, so the survivor file comes back LONG/DOUBLE with
    // a physical score column
    History.deleteWhere(spark, dir, c("id") === l(1L)): Unit
    val rows = History.readPinned(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toSet
    assert(rows === Set((2L, None), (3L, Some(0.9)), (4L, Some(0.7))))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rewritten = graft.sources.FileManifest.latest(fs, dir).get
      .cur.filter(_.startsWith("d")) // delete-tagged rewrite output
    assert(rewritten.nonEmpty)
    val plain = spark.read.parquet(
      rewritten.map(rel => s"$dir/$rel"): _*)
    assert(plain.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("id", LongType), ("v", DoubleType),
      ("tag", StringType), ("score", DoubleType)),
      "rewrite did not converge the file onto the declared schema")
  }

  test("an evolution is metadata-only: the DDL version is data-" +
      "identical and the change feed stays empty") {
    val dir = declaredLake()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val before = graft.sources.FileManifest.latest(fs, dir).get
    import org.apache.spark.sql.types._
    val declared = History.declaredSchema(spark, dir).get
    History.evolveSchema(spark, dir, StructType(
      declared.fields :+ StructField("extra2", StringType))): Unit
    // DDL-as-commit: one data-IDENTICAL manifest version (same files,
    // same dvs) carrying the new stamp — so the change is pin-visible
    // immediately, while zero data bytes moved
    val after = graft.sources.FileManifest.latest(fs, dir).get
    assert(after.version === before.version + 1)
    assert(after.cur === before.cur && after.dvs === before.dvs)
    // and the feed across the DDL version diffs to empty
    val feed = History.changesBetween(spark, dir,
      after.version, after.version)
    assert(feed.count() === 0)
    // reads now surface the second added column, null everywhere
    val df = History.readPinned(spark, dir)
    assert(df.schema.fieldNames.last === "extra2")
    assert(df.filter(org.apache.spark.sql.functions.col("extra2")
      .isNotNull).count() === 0)
  }

  test("declare on a legacy (non-manifest) lake fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-legacy-declare").toString + "/lake"
    Seq((1L, "a")).toDF("id", "tag").write.parquet(dir)
    intercept[IllegalArgumentException] {
      History.declareSchema(spark, dir)
    }
  }

  test("a fully-deleted declared lake keeps its schema") {
    import org.apache.spark.sql.functions.{lit => l}
    val dir = declaredLake()
    History.deleteWhere(spark, dir, l(true)): Unit
    val df = History.readPinned(spark, dir)
    assert(df.schema.fieldNames.toSeq === Seq("id", "v", "tag", "score"))
    assert(df.count() === 0)
  }
}
