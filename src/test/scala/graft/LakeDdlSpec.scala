package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FileManifest, History, LakeCatalog, SchemaLog}

/** SQL DDL on the lake catalog ([[LakeCatalog.createTable]] /
  * `dropTable`): CREATE TABLE provisions a sharded manifest lake with
  * a declared schema + declared partitioning + property-carried CHECK
  * constraints, CTAS populates through the staged validated append,
  * and DROP TABLE is allowed only for lakes that never held data —
  * closing the last Scala dependency in the SQL-only lifecycle. */
class LakeDdlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    s
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def tmpPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/lake"

  test("SQL-only lifecycle: CREATE TABLE, INSERT, constraint, SELECT") {
    val dir = tmpPath("graft-ddl")
    spark.sql(s"""CREATE TABLE lake.`$dir` (
                    doc_id BIGINT, n_chars BIGINT, lang STRING)
                  USING parquet PARTITIONED BY (lang)
                  TBLPROPERTIES (
                    'graft.constraint.chars_pos' = 'n_chars >= 0')""")
    val fs = fsOf(dir)
    assert(FileManifest.enabled(fs, dir))
    assert(SchemaLog.latest(fs, dir).map(_.fieldNames.toSet) ===
      Some(Set("doc_id", "n_chars", "lang")))
    assert(FileManifest.declaredPartitioning(fs, dir) === Some(Seq("lang")))
    // an empty declared lake still presents its schema to SQL
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").columns.sorted.toSeq ===
      Seq("doc_id", "lang", "n_chars"))
    // the first INSERT lands PARTITIONED by the declaration (no files
    // existed to derive the scheme from)
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (1, 10, 'en'), (2, 20, 'de')")
    val m = FileManifest.latest(fs, dir).get
    assert(m.cur.nonEmpty && m.cur.forall(_.startsWith("lang=")),
      m.cur.mkString(","))
    // the property-declared CHECK bounces a violating batch whole
    intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, -5, 'en')")
    }
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 30L)
    // static partition overwrite works against the DECLARED layout
    spark.sql(s"""INSERT OVERWRITE lake.`$dir` PARTITION (lang = 'en')
                  VALUES (7, 70)""")
    assert(spark.sql(s"SELECT doc_id FROM lake.`$dir` ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 7L))
    // DML rides the same lake
    spark.sql(s"UPDATE lake.`$dir` SET n_chars = 99 WHERE doc_id = 2")
    spark.sql(s"DELETE FROM lake.`$dir` WHERE doc_id = 7")
    assert(spark.sql(
        s"SELECT doc_id, n_chars FROM lake.`$dir` ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 99L)))
  }

  test("CREATE TABLE stamps its declaration: a tag taken right after " +
      "CREATE pins the CREATE-time schema under later renames") {
    // the review-found gap: CREATE TABLE declares AFTER its manifests
    // exist, so without declareAs's DDL commit the freshest version
    // stayed stamp-less and a tag on it resolved the PRESENT
    // declaration — showing the post-rename name for a pre-rename pin
    val dir = tmpPath("graft-ddl-stamp")
    spark.sql(s"""CREATE TABLE lake.`$dir` (
                    doc_id BIGINT, a STRING) USING parquet""")
    val fs = fsOf(dir)
    val m = FileManifest.latest(fs, dir).get
    assert(m.schemaV === Some(1L),
      s"CREATE's freshest version must carry the declaration stamp, " +
        s"got ${m.schemaV}")
    History.tag(spark, dir, "at_create"): Unit
    SchemaLog.renameColumn(spark, dir, "a", "b"): Unit
    assert(History.readTag(spark, dir, "at_create")
      .schema.fieldNames.toSeq === Seq("doc_id", "a"))
    assert(History.readPinned(spark, dir).schema.fieldNames.toSeq ===
      Seq("doc_id", "b"))
  }

  test("repartition_lake with a bad column leaves the lake untouched " +
      "(no implicit declaration, no version)") {
    import spark.implicits._
    val dir = tmpPath("graft-ddl-regrain")
    Seq((1L, "en")).toDF("doc_id", "lang").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    val fs = fsOf(dir)
    val vBefore = FileManifest.latest(fs, dir).get.version
    intercept[IllegalArgumentException] {
      History.repartitionLake(spark, dir, Seq("doc_idd")) // typo
    }
    assert(SchemaLog.latest(fs, dir).isEmpty,
      "a refused re-grain must not implicitly declare a schema")
    assert(FileManifest.latest(fs, dir).get.version === vBefore,
      "a refused re-grain must not publish a version")
  }

  test("CREATE TABLE on an existing lake refuses; bad shapes refuse") {
    val dir = tmpPath("graft-ddl-dup")
    spark.sql(s"CREATE TABLE lake.`$dir` (id BIGINT) USING parquet")
    intercept[org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE lake.`$dir` (id BIGINT) USING parquet")
    }
    // non-identity partition transforms refuse
    val dir2 = tmpPath("graft-ddl-bucket")
    intercept[UnsupportedOperationException] {
      spark.sql(s"""CREATE TABLE lake.`$dir2` (id BIGINT, ts TIMESTAMP)
                    USING parquet PARTITIONED BY (days(ts))""")
    }
    assert(!FileManifest.enabled(fsOf(dir2), dir2))
  }

  test("CTAS creates and populates in one statement") {
    import spark.implicits._
    val dir = tmpPath("graft-ctas")
    Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"""CREATE TABLE lake.`$dir` USING parquet
                  PARTITIONED BY (lang)
                  AS SELECT doc_id, n_chars, lang FROM ctas_src""")
    val fs = fsOf(dir)
    assert(FileManifest.declaredPartitioning(fs, dir) === Some(Seq("lang")))
    assert(FileManifest.latest(fs, dir).get.cur
      .forall(_.startsWith("lang=")))
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect()(0).getLong(0) === 60L)
    // time travel exists from birth: version history answers
    assert(History.versions(spark, dir).nonEmpty)
  }

  test("CTAS with the partition column mid-schema reads back by name") {
    import spark.implicits._
    val dir = tmpPath("graft-ctas-mid")
    Seq((1L, "en", 10L), (2L, "de", 20L))
      .toDF("doc_id", "lang", "n_chars")
      .createOrReplaceTempView("ctas_mid_src")
    // lang (the partition col) sits mid-query; Spark's CTAS analysis
    // normalizes partition columns to the END of the table schema
    // (standard Hive-style layout) — dirs carry lang's values, files
    // the rest, and the declared projection merges them by NAME
    spark.sql(s"""CREATE TABLE lake.`$dir` USING parquet
                  PARTITIONED BY (lang)
                  AS SELECT doc_id, lang, n_chars FROM ctas_mid_src""")
    val df = spark.sql(s"SELECT * FROM lake.`$dir`")
    assert(df.columns.toSeq === Seq("doc_id", "n_chars", "lang"))
    assert(df.select("doc_id", "lang", "n_chars").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
      === Seq((1L, "en", 10L), (2L, "de", 20L)))
    // INSERT follows the normalized order (data cols, then partition)
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, 30, 'fr')")
    assert(spark.sql(
        s"SELECT n_chars FROM lake.`$dir` WHERE lang = 'fr'")
      .collect().head.getLong(0) === 30L)
    // ADD COLUMNS FIRST/AFTER refuses (position would be misplaced)
    val e = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE lake.`$dir` ADD COLUMNS (x BIGINT FIRST)")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString(" | ")
      .contains("FIRST/AFTER"))
  }

  test("a constraint-violating CTAS bounces whole and drops the shell") {
    import spark.implicits._
    val dir = tmpPath("graft-ctas-bounce")
    Seq((1L, -10L)).toDF("doc_id", "n_chars")
      .createOrReplaceTempView("ctas_bad_src")
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE lake.`$dir` USING parquet
                    TBLPROPERTIES (
                      'graft.constraint.chars_pos' = 'n_chars >= 0')
                    AS SELECT doc_id, n_chars FROM ctas_bad_src""")
    }
    // Spark's CTAS cleanup dropped the just-created empty shell
    assert(!FileManifest.enabled(fsOf(dir), dir),
      "the failed CTAS must not leave a half-created lake")
  }

  test("ALTER TABLE: add nullable columns and widen types, SQL-only") {
    val dir = tmpPath("graft-ddl-alter")
    spark.sql(s"""CREATE TABLE lake.`$dir` (id INT, n_chars BIGINT)
                  USING parquet""")
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (1, 10), (2, 20)")
    // add a nullable column: metadata-only, old rows read back null
    spark.sql(s"ALTER TABLE lake.`$dir` ADD COLUMNS (score DOUBLE)")
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").columns.toSeq ===
      Seq("id", "n_chars", "score"))
    assert(spark.sql(
        s"SELECT count(*) AS n FROM lake.`$dir` WHERE score IS NULL")
      .collect().head.getLong(0) === 2L)
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, 30, 0.5)")
    // widen INT -> BIGINT: old INT32 files promote at the read edge
    spark.sql(s"ALTER TABLE lake.`$dir` ALTER COLUMN id TYPE BIGINT")
    val ids = spark.sql(s"SELECT id FROM lake.`$dir` ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 3L))
    // narrowing shapes refuse loudly
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` ALTER COLUMN n_chars TYPE INT")
    }
    assert(chain(e2).nonEmpty)
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").columns.length === 3)
  }

  test("DROP COLUMN is metadata-only projection; the name is " +
      "tombstoned forever") {
    val dir = tmpPath("graft-ddl-drop-col")
    spark.sql(s"""CREATE TABLE lake.`$dir`
                  (doc_id BIGINT, n_chars BIGINT, score DOUBLE)
                  USING parquet""")
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (1, 10, 0.5), (2, 20, 0.7)")
    val fs = fsOf(dir)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    spark.sql(s"ALTER TABLE lake.`$dir` DROP COLUMN score")
    // zero data files touched; the column is projection-gone
    assert(FileManifest.latest(fs, dir).get.cur.toSet === filesBefore)
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").columns.toSeq ===
      Seq("doc_id", "n_chars"))
    // writers sending the dropped column refuse (not declared)
    intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, 30, 0.9)")
    }
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, 30)")
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM lake.`$dir`")
      .collect().head.getLong(0) === 60L)
    // the tombstone: re-adding the name would resurrect the old
    // files' stale values into the "new" column — refuses forever
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` ADD COLUMNS (score DOUBLE)")
    }
    assert(chain(e).contains("retired"), chain(e))
    // renaming another column ONTO the tombstoned name refuses too
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN n_chars TO score")
    }
    assert(chain(e2).contains("retired"), chain(e2))
    // guarded drops: partition columns, the last column, constrained
    // columns
    val dir2 = tmpPath("graft-ddl-drop-col2")
    spark.sql(s"""CREATE TABLE lake.`$dir2` (doc_id BIGINT, lang STRING)
                  USING parquet PARTITIONED BY (lang)""")
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir2` DROP COLUMN lang")
    }
    assert(chain(e3).contains("partition column"), chain(e3))
    spark.sql(s"ALTER TABLE lake.`$dir2` DROP COLUMN doc_id")
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir2` DROP COLUMN lang")
    }
    assert(chain(e4).contains("only column"), chain(e4))
    // the #retired inspection table lists every reserved name
    assert(spark.sql(s"SELECT name FROM lake.`$dir#retired`")
      .collect().map(_.getString(0)).sorted.toSeq === Seq("score"))
  }

  test("RENAME COLUMN is metadata-only: old files read back under the " +
      "new name across eras, DML and maintenance converge") {
    val dir = tmpPath("graft-ddl-rename")
    spark.sql(s"""CREATE TABLE lake.`$dir` (doc_id BIGINT, txt STRING)
                  USING parquet""")
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (1, 'a'), (2, 'b')")
    val fs = fsOf(dir)
    val filesBefore = FileManifest.latest(fs, dir).get.cur.toSet
    spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN txt TO body")
    // zero data files touched — the rename is one schema-log commit
    assert(FileManifest.latest(fs, dir).get.cur.toSet === filesBefore)
    assert(spark.sql(s"SELECT * FROM lake.`$dir`").columns.toSeq ===
      Seq("doc_id", "body"))
    // era 1 (pre-rename physical 'txt') reads back under 'body'
    def all(): Seq[(Long, String)] =
      spark.sql(s"SELECT doc_id, body FROM lake.`$dir` ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(all() === Seq((1L, "a"), (2L, "b")))
    // era 2 writes the NEW physical name; both eras in one scan
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (3, 'c')")
    assert(all() === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a writer still sending the OLD name refuses loudly
    intercept[Exception] {
      import spark.implicits._
      History.append(spark, dir,
        Seq((4L, "d")).toDF("doc_id", "txt"), key = "old-writer")
    }
    // filters/DML resolve the new name; predicates push into both eras
    assert(spark.sql(s"SELECT doc_id FROM lake.`$dir` WHERE body = 'a'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    spark.sql(s"UPDATE lake.`$dir` SET body = 'z' WHERE doc_id = 2")
    spark.sql(s"DELETE FROM lake.`$dir` WHERE body = 'c'")
    assert(all() === Seq((1L, "a"), (2L, "z")))
    // the COW update REWROTE era-1 rows under the new physical name —
    // maintenance converges files as a side effect
    // second rename CHAINS: body -> content, all three eras answer
    spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN body TO content")
    assert(spark.sql(
        s"SELECT doc_id, content FROM lake.`$dir` ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "z")))
    // time travel projects history to the CURRENT declared shape
    assert(spark.sql(s"SELECT * FROM lake.`$dir` VERSION AS OF 1")
      .columns.toSeq === Seq("doc_id", "content"))
    // the bloom key index builds on the RENAMED column across eras
    // (pre-rename files resolve through the alias projection) and the
    // keyed read answers through it
    assert(History.refreshKeyIndex(spark, dir, "content") > 0)
    val keyed = History.readPinnedKeyed(spark, dir, "content", Seq("z"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(keyed === Seq(2L))
  }

  test("RENAME COLUMN refusals: partition columns, collisions, retired " +
      "names, constraint references") {
    val dir = tmpPath("graft-ddl-rename-ref")
    spark.sql(s"""CREATE TABLE lake.`$dir`
                  (doc_id BIGINT, n_chars BIGINT, lang STRING)
                  USING parquet PARTITIONED BY (lang)
                  TBLPROPERTIES (
                    'graft.constraint.chars_pos' = 'n_chars >= 0')""")
    spark.sql(s"INSERT INTO lake.`$dir` VALUES (1, 10, 'en')")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    // partition column: the k=v dirs are physical
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN lang TO language")
    }
    assert(chain(e1).contains("partition column"), chain(e1))
    // target collides with an existing column
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN doc_id TO n_chars")
    }
    assert(chain(e2).contains("already exists"), chain(e2))
    // a CHECK constraint referencing the column blocks the rename
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN n_chars TO sz")
    }
    assert(chain(e3).contains("chars_pos"), chain(e3))
    // after dropping the constraint the rename lands, and the RETIRED
    // name cannot come back as a new column
    graft.sources.Constraints.drop(spark, dir, "chars_pos"): Unit
    spark.sql(s"ALTER TABLE lake.`$dir` RENAME COLUMN n_chars TO sz")
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$dir` ADD COLUMNS (n_chars BIGINT)")
    }
    assert(chain(e4).contains("retired"), chain(e4))
    assert(spark.sql(s"SELECT sz FROM lake.`$dir`")
      .collect().head.getLong(0) === 10L)
  }

  test("DROP TABLE: empty lakes drop, data-bearing lakes refuse") {
    val dir = tmpPath("graft-ddl-drop")
    spark.sql(s"CREATE TABLE lake.`$dir` (id BIGINT) USING parquet")
    assert(FileManifest.enabled(fsOf(dir), dir))
    spark.sql(s"DROP TABLE lake.`$dir`")
    assert(!FileManifest.enabled(fsOf(dir), dir))
    val dir2 = tmpPath("graft-ddl-drop2")
    spark.sql(s"CREATE TABLE lake.`$dir2` (id BIGINT) USING parquet")
    spark.sql(s"INSERT INTO lake.`$dir2` VALUES (1)")
    val e = intercept[Exception] {
      spark.sql(s"DROP TABLE lake.`$dir2`")
    }
    assert(e.getMessage.contains("data-bearing"), e.getMessage)
    assert(spark.sql(s"SELECT count(*) AS n FROM lake.`$dir2`")
      .collect()(0).getLong(0) === 1L)
  }
}
