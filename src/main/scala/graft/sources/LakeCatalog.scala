package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL surface for manifest lakes: a DSv2 `TableCatalog` whose table
  * identifiers ARE lake paths, with time travel by version, by tag
  * name, and by timestamp.
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
  *   spark.sql("SELECT * FROM lake.`/data/corpus`")                    // pinned latest
  *   spark.sql("SELECT * FROM lake.`/data/corpus` VERSION AS OF 7")    // time travel
  *   spark.sql("SELECT * FROM lake.`/data/corpus` VERSION AS OF 'training-v1'") // by tag
  *   spark.sql("SELECT * FROM lake.`/data/corpus` TIMESTAMP AS OF '2026-08-01 00:00:00'")
  * }}}
  *
  * Every load resolves the manifest exactly like [[History.readPinned]]
  * — the planned file set is the committed version's CURRENT files, so
  * a SQL scan survives concurrent compaction/delete commits for the
  * whole vacuum grace, and a declared table schema ([[SchemaLog]])
  * projects every file era to one shape. The returned table IS the
  * stock DSv2 parquet table over that file list
  * (`ParquetTableBridge`), so SQL reads inherit the production scan
  * stack wholesale: vectorized reader, filter pushdown, column
  * pruning, partition-directory pruning against the lake root.
  *
  * Writes — the full DML surface:
  *  - `INSERT INTO lake.\`/path\`` routes through the engine's staged,
  *    validated, exactly-once append ([[History.append]] via
  *    [[LakeSqlWrite]]) — declared-schema validation and staged-bytes
  *    CHECK-constraint enforcement apply to SQL-landed batches exactly
  *    as to engine-landed ones, and the batch partitions into the
  *    lake's existing directory layout.
  *  - `DELETE FROM … WHERE …` lands as merge-on-read deletion vectors
  *    ([[History.deleteWhereDV]] via [[LakeSqlDelete]]); unconditional
  *    DELETE/TRUNCATE retires every file copy-on-write.
  *  - `UPDATE … SET … WHERE …` and upsert-shaped `MERGE INTO` route to
  *    the copy-on-write file-granular [[History.updateWhere]] /
  *    [[History.mergeInto]] through the [[LakeDmlRule]] extension rule
  *    (`--conf spark.sql.extensions=graft.GraftExtensions` — the one
  *    line the UPDATE/MERGE statements need, because Spark has no
  *    capability trait for them short of the V2-only ReplaceData
  *    machinery).
  * Time-travel pins are read targets only. DDL
  * (`createTable`/`alterTable`/`dropTable`) still fails loudly: lake
  * lifecycle belongs to [[History.enableManifests]] and friends, not
  * to a SQL session.
  *
  * Merge-on-read snapshots: a DV-bearing version serves through
  * [[PinnedLakeTable]] (the engine's pinned-read plan, deletion
  * vectors applied by the codegen `dv_deleted` predicate); DV-free
  * versions keep the stock vectorized parquet table.
  *
  * Scale: a load costs one (cached) manifest resolution — O(lake
  * metadata), never a data-file listing; `listTables` is empty because
  * lake paths are not enumerable from nothing.
  */
class LakeCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "lake"
  /** Friendly-name aliases from catalog options:
    * `spark.sql.catalog.<cat>.<alias> = <lake path>` lets users write
    * `SELECT … FROM <cat>.<alias>` and makes the aliases enumerable
    * via `SHOW TABLES IN <cat>`. */
  private var aliases: Map[String, String] = Map.empty

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    import scala.jdk.CollectionConverters._
    aliases = options.asCaseSensitiveMap().asScala.toMap
      .filter { case (_, v) => v.contains("/") } // path-shaped values only
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** The identifier is the lake path (`lake.`/abs/path``: name is the
    * whole backticked path, namespace empty; a namespaced spelling
    * joins back with '/') — unless it matches a configured alias. */
  private def pathOf(ident: Identifier): String = {
    val raw = (ident.namespace() :+ ident.name()).mkString("/")
    aliases.getOrElse(raw.toLowerCase(java.util.Locale.ROOT), raw)
  }

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableAt(ident: Identifier,
                      version: Option[Long]): Table = {
    val path = pathOf(ident)
    val fs = fsOf(path)
    val m = version match {
      case Some(v) => FileManifest.at(fs, path, v).getOrElse(
        throw new IllegalArgumentException(
          s"version $v not retained at $path (vacuumed or never " +
            s"published); retained: " +
            FileManifest.versions(fs, path).mkString(", ")))
      case None => FileManifest.latest(fs, path).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident))
    }
    val qRoot = fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    val files = m.cur.sorted.map(rel =>
      new org.apache.hadoop.fs.Path(qRoot, rel).toString)
    // the declared schema (projection + widening — exactly readPinned's
    // contract): the SNAPSHOT-ERA declaration for an explicit
    // `VERSION AS OF` pin (the manifest's schema stamp — a pre-drop pin
    // shows the dropped column), the PRESENT declaration for the latest
    // table; otherwise the pinned read's inferred schema so an EMPTY
    // version still presents the lake shape
    val schema: StructType = (version match {
      case Some(_) => m.schemaV.map(SchemaLog.at(fs, path, _))
        .orElse(SchemaLog.latest(fs, path))
      case None => SchemaLog.latest(fs, path)
    }).getOrElse {
      version.map(History.readPinned(spark, path, _))
        .getOrElse(History.readPinned(spark, path)).schema
    }
    // the lake's declared contract rides the table properties —
    // SQL-visible provenance (SHOW TBLPROPERTIES): pinned manifest
    // version, declared-schema version, and the active CHECK set
    // a time-travel pin reports its manifest version and its ERA
    // schema version (the stamp its snapshot resolves) — but never the
    // CHECK set: constraints are properties of the lake's PRESENT, and
    // advertising today's constraints on yesterday's (possibly
    // pre-constraint) data would misstate the provenance the
    // properties exist to surface
    // exact row count when the metadata can answer it (footer
    // row-count sidecar fresh for every current file — see
    // History.fastCount); absent otherwise, never a guess. Pinned
    // to the ALREADY-RESOLVED manifest — re-resolving latest here
    // could race a concurrent commit and report v(n+1)'s count
    // against v(n)'s file list. Doubles as the COUNT(*) aggregate
    // pushdown answer: `SELECT count(*)` over a fresh-stats lake
    // plans a LocalTableScan, zero file scans.
    val fastCnt = History.fastCount(spark, path, Some(m.version))
    val props: Map[String, String] =
      Map("graft.version" -> m.version.toString) ++
        FileManifest.declaredPartitioning(fs, path)
          .map(cs => "graft.partitioning" -> cs.mkString(",")) ++
        fastCnt.map(n => "graft.rowcount" -> n.toString) ++
        (if (version.isEmpty)
          SchemaLog.latestVersion(fs, path)
            .map(v => "graft.schema.version" -> v.toString).toMap ++
            Constraints.current(fs, path)
              .map { case (n, e) => s"graft.constraint.$n" -> e }
         else m.schemaV
           .map(v => "graft.schema.version" -> v.toString).toMap)
    val tableName =
      s"$catalogName.$path${version.fold("")(v => s"@v$v")}"
    // SQL writes land through the staged, validated, exactly-once
    // append — latest-version tables only (a time-travel pin is a
    // read of history, not a write target). A DECLARED partitioning
    // (CREATE TABLE … PARTITIONED BY) is authoritative — an empty
    // lake has no files to derive the scheme from
    val partCols = FileManifest.declaredPartitioning(fs, path)
      .getOrElse(uniformPartCols(m))
    val writable = version.isEmpty
    val curSet = m.curSet
    val liveDvs = m.dvs.filter { case (rel, _) => curSet(rel) }
    // whole-aggregate metadata answers: COUNT(*) from the row-count
    // sidecar (DV cardinalities netted), MIN/MAX of BIGINT / INT /
    // DATE / STRING columns from footer extrema (refused under live
    // DVs on the selected subset — a vector may have deleted the
    // extreme row). Pushed filters select a FILE SUBSET when they are
    // partition-decidable from the `k=v` dirs ([[PartitionPredicate]])
    // — the `count(*) WHERE dt = …` dashboard query at metadata cost;
    // any undecidable filter refuses the whole answer. Resolved lazily
    // per pushed aggregate; manifest and sidecars are cached.
    val colTypes = schema.fields
      .map(f => f.name -> f.dataType).toMap
    val typedMinMax: (Seq[String], String) => Option[
        (org.apache.spark.sql.types.DataType, Any, Any)] = (sel, c) =>
      colTypes.get(c).flatMap {
        // a PARTITION column's extrema come from the k=v directory
        // names themselves (zero footer stats) — guarded by fresh
        // nonzero row counts so an empty file's dir value never
        // answers; catalystValue decodes type-exactly
        case dt if partCols.contains(c) =>
          History.fastMinMaxPartFiles(fs, path, m, sel, c, dt)
            .map { case (mn, mx) => (dt, mn, mx) }
        case dt @ org.apache.spark.sql.types.LongType =>
          History.fastMinMaxFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn, mx) }
        case dt @ org.apache.spark.sql.types.IntegerType =>
          // INT32 footer stats widen to long in the sidecar; the
          // catalyst value narrows back (always fits by construction)
          History.fastMinMaxFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn.toInt, mx.toInt) }
        case dt @ org.apache.spark.sql.types.DateType =>
          // DATE is physically INT32 days-since-epoch — the sidecar
          // long IS the catalyst date value
          History.fastMinMaxFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn.toInt, mx.toInt) }
        case dt @ org.apache.spark.sql.types.TimestampType =>
          // INT64-micros timestamps stat like any long; legacy INT96
          // files yield no long footer stats and honestly refuse
          History.fastMinMaxFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn, mx) }
        case dt @ org.apache.spark.sql.types.StringType =>
          History.fastMinMaxStrFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt,
              org.apache.spark.unsafe.types.UTF8String.fromString(mn),
              org.apache.spark.unsafe.types.UTF8String.fromString(mx)) }
        case dt @ org.apache.spark.sql.types.DoubleType =>
          // NaN/±0.0-touching footer bounds were refused at stat time
          // (FileStats.DoubleRange) — what remains answers exactly
          History.fastMinMaxDblFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn, mx) }
        case dt @ org.apache.spark.sql.types.FloatType =>
          // FLOAT stats widened exactly to double; narrow back (exact
          // by construction — the bounds were float values)
          History.fastMinMaxDblFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt, mn.toFloat, mx.toFloat) }
        case dt: org.apache.spark.sql.types.DecimalType
            if dt.precision <= 18 =>
          // INT32/INT64-backed decimals: unscaled bounds reassemble at
          // the DECLARED (precision, scale) — files were written (or
          // validated) against the declaration, so scales agree;
          // FIXED_LEN_BYTE_ARRAY decimals (precision > 18) never
          // statted, honest fallback
          History.fastMinMaxDecFiles(fs, path, m, sel, c)
            .map { case (mn, mx) => (dt,
              org.apache.spark.sql.types.Decimal(mn, dt.precision,
                dt.scale),
              org.apache.spark.sql.types.Decimal(mx, dt.precision,
                dt.scale)) }
        case _ => None
      }
    val aggResolver: (org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation, Seq[org.apache.spark.sql.sources.Filter])
        => Option[MetaAggScan] = (agg, filters) =>
      MetaAggScan.resolveWithGrouping(agg, filters, m.cur, partCols,
        schema, sel => MetaAggScan.resolveFuncs(agg,
          count = if (sel.length == m.cur.length) fastCnt
            else History.fastCountFiles(fs, path, m, sel),
          minMax = c => typedMinMax(sel, c),
          countCol = c =>
            // a PARTITION column is never null within its k=v dirs
            // (the null dir is __HIVE_DEFAULT_PARTITION__, a distinct
            // directory this subset either includes or not) — but
            // deciding that per dir duplicates the grouped path, so
            // only DATA columns answer from the nulls sidecar here
            if (partCols.contains(c)) None
            else History.fastCountColFiles(fs, path, m, sel, c)))
    if (liveDvs.nonEmpty || SchemaLog.hasAliases(schema))
      // merge-on-read: the stock parquet table cannot apply deletion
      // vectors (it would resurrect deleted rows), so DV-bearing
      // snapshots serve through the engine's pinned-read plan — the
      // codegen dv_deleted predicate at the plan choke point — via the
      // V1Scan fallback table. DV is the takedown default; the SQL
      // surface must not go dark the moment one lands. RENAMED-column
      // lakes route the same way: only the engine read applies the
      // alias projection (the stock table would read pre-rename files'
      // column as NULL).
      new PinnedLakeTable(tableName, path, m.version, schema, props,
        aggResolver, writable, partCols, era = version.isDefined)
    else
      org.apache.spark.sql.graftbridge.ParquetTableBridge.table(
        tableName, spark, files, qRoot.toString, Some(schema), props,
        aggResolver,
        if (writable) Some((info: org.apache.spark.sql.connector.write
            .LogicalWriteInfo) => LakeSqlWrite.builder(path, partCols, info))
        else None,
        deleteTarget = if (writable) Some(path) else None)
  }

  /** Directory-encoded partition columns shared by EVERY current file
    * (`k=v` path segments) — or, when the CURRENT set is empty (a
    * truncated lake), by every RETIRED file still in the manifest:
    * layout memory, so the next SQL INSERT after a full restatement
    * still lands partitioned. Nil when the layout is mixed or
    * unpartitioned. */
  private def uniformPartCols(m: FileManifest.Manifest): Seq[String] = {
    def colsOf(rel: String): Seq[String] =
      rel.split('/').dropRight(1).filter(_.contains('='))
        .map(_.takeWhile(_ != '=')).toSeq
    val donors =
      if (m.cur.nonEmpty) m.cur else m.retired.map(_._2).distinct
    donors.headOption.map(colsOf)
      .filter(cs => donors.forall(colsOf(_) == cs))
      .getOrElse(Nil)
  }

  /** Metadata-table suffixes: ``lake.`/path#history` `` — retained
    * versions with commit times, file deltas, tags; ``#files`` — the
    * current snapshot's file inventory (DV pointers, sidecar row
    * counts); ``#tags`` — name → version pins; ``#constraints`` — the
    * active CHECK set. All driver-computed from cached manifests and
    * sidecars: zero data files touched, the standard `table$metadata`
    * surface of the log-structured formats. */
  private val metaTables: Map[String, (StructType,
      (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.types._
    def st(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, dt) => StructField(n, dt) })
    // schemas are STATIC (drift-guarded in LakeCatalogSpec): building
    // the frame just to read its shape would walk every retained
    // manifest at each table resolution
    Map(
      "history" -> ((st("version" -> LongType, "committed_at" -> LongType,
          "n_files" -> LongType, "n_retired" -> LongType,
          "n_added" -> LongType, "n_removed" -> LongType,
          "tags" -> StringType, "n_dv_files" -> LongType,
          "schema_version" -> LongType),
        (s: SparkSession, p: String) => History.describeHistory(s, p))),
      "files" -> ((st("file" -> StringType, "dv_file" -> StringType,
          "n_rows" -> LongType),
        (s: SparkSession, p: String) => History.describeFiles(s, p))),
      "tags" -> ((st("tag" -> StringType, "version" -> LongType),
        (s: SparkSession, p: String) => {
          val rows = FileManifest.tags(fsOf(p), p)
          import s.implicits._
          rows.sortBy(_._1).toDF("tag", "version")
        })),
      "constraints" -> ((st("name" -> StringType,
          "expression" -> StringType),
        (s: SparkSession, p: String) => {
          val rows = Constraints.current(fsOf(p), p)
          import s.implicits._
          rows.toDF("name", "expression")
        })),
      // the declared-schema HISTORY: every evolution step as DDL — the
      // "when did this column appear" audit (`#history` answers the
      // data side; this answers the shape side)
      "schema" -> ((st("version" -> LongType, "schema_ddl" -> StringType),
        (s: SparkSession, p: String) => {
          val f = fsOf(p)
          val rows = SchemaLog.versions(f, p)
            .map(v => (v, SchemaLog.at(f, p, v).toDDL))
          import s.implicits._
          rows.toDF("version", "schema_ddl")
        })),
      // RETIRED physical names (renamed-away aliases + dropped-column
      // tombstones): the "why can't I reuse this name" audit — every
      // listed name is permanently reserved because old files still
      // hold it
      "retired" -> ((st("name" -> StringType),
        (s: SparkSession, p: String) => {
          val rows = SchemaLog.retiredNames(fsOf(p), p).sorted
          import s.implicits._
          rows.toDF("name")
        })))
  }

  /** `#changes@<from>..<to>`: the row-level change feed across a
    * version window as a SQL table — CDC for SQL-only consumers
    * (inserts + deletes with the `_change` marker, computed from only
    * the files that changed; positional O(changed-vectors) under DV
    * commits). Window endpoints are manifest versions or TAG names
    * (``#changes@training-v1..training-v2`` — "what changed between
    * the two corpus snapshots my models trained on", resolved through
    * the same tag registry `VERSION AS OF` reads). Bare `#changes`
    * reads the LAST commit's window. */
  // lazy first-".." split: dotted tag names work; a tag containing a
  // literal ".." is unaddressable here (name tags without it)
  private val ChangesRange = "changes@(.+?)\\.\\.(.+)".r

  /** A window endpoint: a version number, else a tag name. */
  private def endpointVersion(p: String, e: String): Long =
    e.toLongOption.getOrElse(
      FileManifest.tagVersion(fsOf(p), p, e).getOrElse(
        throw new IllegalArgumentException(
          s"'$e' is neither a version nor a tag at $p; tags: " +
            FileManifest.tags(fsOf(p), p).map(_._1).mkString(", "))))

  override def loadTable(ident: Identifier): Table = {
    val raw = pathOf(ident)
    val hash = raw.lastIndexOf('#')
    val suffix = if (hash < 0) None else Some(raw.substring(hash + 1))
    def base: String = raw.substring(0, hash)
    def requireLake(p: String): Unit =
      if (!FileManifest.enabled(fsOf(p), p))
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident)
    def changesTable(p: String, from: Long, to: Long): Table = {
      // schema is data-dependent (lake columns + _change), so the
      // frame is captured ONCE at load — the scan executes the same
      // pinned plan, immune to a schema evolution landing between
      // analysis and execution. The frame stays DISTRIBUTED
      // (LakeMetaTable wraps the plan's RDD, it never collects), so a
      // big window is executor work.
      val feed = History.changesBetween(spark, p, from, to)
      new LakeMetaTable(s"$catalogName.$p#changes@$from..$to",
        feed.schema, () => feed)
    }
    suffix match {
      case Some(ChangesRange(a, b)) =>
        requireLake(base)
        changesTable(base, endpointVersion(base, a),
          endpointVersion(base, b))
      case Some("changes") =>
        requireLake(base)
        val vs = FileManifest.versions(fsOf(base), base)
        val to = vs.last
        changesTable(base, vs.filter(_ < to).lastOption.getOrElse(to), to)
      case Some(sfx) if metaTables.contains(sfx) =>
        val (schema, mk) = metaTables(sfx)
        requireLake(base)
        new LakeMetaTable(s"$catalogName.$base#$sfx", schema,
          () => mk(spark, base))
      case _ => tableAt(ident, None)
    }
  }

  /** `VERSION AS OF x`: a numeric literal is a manifest version; a
    * string literal is a TAG name ([[FileManifest.tagVersion]]). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = version.toLongOption.getOrElse {
      FileManifest.tagVersion(fsOf(path), path, version).getOrElse(
        throw new IllegalArgumentException(
          s"unknown tag '$version' at $path; have: " +
            FileManifest.tags(fsOf(path), path).map(_._1).mkString(", ")))
    }
    tableAt(ident, Some(v))
  }

  /** `TIMESTAMP AS OF t` (micros since epoch): the newest version
    * whose root was committed at or before `t`. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val fs = fsOf(path)
    val tsMs = timestamp / 1000L
    val candidates = FileManifest.versions(fs, path).filter { v =>
      FileManifest.versionMtime(fs, path, v).exists(_ <= tsMs)
    }
    if (candidates.isEmpty)
      throw new IllegalArgumentException(
        s"no version of $path existed at timestamp $timestamp " +
          "(or older versions were vacuumed)")
    tableAt(ident, Some(candidates.max))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val raw = pathOf(ident)
    val hash = raw.lastIndexOf('#')
    val p = // a known metadata suffix resolves against its base lake
      if (hash >= 0 && {
          val sfx = raw.substring(hash + 1)
          metaTables.contains(sfx) || sfx == "changes" ||
            ChangesRange.pattern.matcher(sfx).matches()
        })
        raw.substring(0, hash)
      else raw
    FileManifest.enabled(fsOf(p), p)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else aliases.keys.toArray.sorted
      .map(a => Identifier.of(Array.empty, a)) // configured aliases only —
      // bare lake paths are not enumerable from nothing

  /** SQL `CALL lake.vacuum('/path', …)` — the maintenance surface
    * ([[LakeProcedures]]): every lifecycle operator the daemon runs,
    * callable from a SQL-only session, one implementation. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LakeProcedures.load(ident).getOrElse(
      throw new RuntimeException(
        s"unknown lake procedure '${ident.name()}'; have: " +
          LakeProcedures.list(Array.empty).map(_.name()).mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LakeProcedures.list(namespace)

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName serves manifest lakes; $op must go through the " +
        "engine's lifecycle operators (CREATE TABLE / CTAS / INSERT / " +
        "DML / CALL are supported; this verb is not)")

  /** SQL `CREATE TABLE lake.\`/path\` (cols…) PARTITIONED BY (k)` —
    * the last Scala dependency in the SQL lifecycle: provisions a
    * fresh manifest lake at the path (SHARDED from birth — the 100 TB
    * manifest shape), declares the table schema ([[SchemaLog]] — every
    * later write validates against it), records the declared
    * partitioning (authoritative for every writer, since an empty lake
    * has no layout to derive), and applies any
    * `graft.constraint.<name>` table properties as CHECK constraints.
    * CTAS rides the same path: Spark creates the table then routes the
    * query through the staged validated append; a constraint-violating
    * CTAS bounces whole and the empty shell is dropped. Only identity
    * partition transforms are accepted (the lake's `k=v` directory
    * scheme IS identity partitioning). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = pathOf(ident)
    val fs = fsOf(path)
    if (FileManifest.enabled(fs, path))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        t.references()(0).fieldNames()(0)
      case other => throw new UnsupportedOperationException(
        s"PARTITIONED BY $other is not supported — the lake's k=v " +
          "directory scheme is identity partitioning on top-level " +
          "columns")
    }
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c is not a table column"))
    require(schema.nonEmpty, "CREATE TABLE needs at least one column")
    // CREATE means CREATE: a directory already holding files would be
    // silently ADOPTED by the manifest bootstrap (files the declared
    // schema may not even match) — adopting existing data is the
    // engine's explicit enableManifests call, never a side effect
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root) && fs.listStatus(root).nonEmpty)
      throw new UnsupportedOperationException(
        s"CREATE TABLE at non-empty $path — adopting existing files " +
          "is History.enableManifests (explicit), not a DDL side " +
          "effect; point CREATE TABLE at an empty or absent path")
    fs.mkdirs(root): Unit
    try {
      History.enableManifests(spark, path): Unit
      History.enableShardedManifests(spark, path): Unit
      SchemaLog.declareAs(fs, path, schema): Unit
      if (partCols.nonEmpty)
        FileManifest.declarePartitioning(fs, path, partCols)
      // CHECK constraints ride table properties (there is no portable
      // CONSTRAINT clause in Spark DDL); all other properties are
      // Spark-internal (provider, owner, …) and ignored
      import scala.jdk.CollectionConverters._
      properties.asScala.toSeq.sortBy(_._1).foreach { case (k, v) =>
        if (k.startsWith("graft.constraint."))
          Constraints.add(spark, path,
            k.stripPrefix("graft.constraint."), v): Unit
      }
    } catch { case e: Throwable =>
      // a half-provisioned shell (manifest without declaration, a
      // failing constraint expression) must not squat on the path —
      // the path was empty, so removing it loses nothing
      fs.delete(root, true): Unit
      throw e
    }
    tableAt(ident, None)
  }

  /** SQL `ALTER TABLE lake.\`/path\` ADD COLUMNS (…)`, widening
    * `ALTER COLUMN c TYPE BIGINT`, `RENAME COLUMN a TO b`, and
    * `DROP COLUMN c` → the engine's metadata-only schema EVOLUTION
    * ([[SchemaLog.evolve]] / [[SchemaLog.renameColumn]] /
    * [[SchemaLog.dropColumn]] — add nullable columns, widen int→long /
    * float→double, rename via declared-schema aliasing, drop via
    * projection + a permanent name tombstone; no data file rewritten).
    * Everything else (narrowing, nested edits, comments) refuses
    * loudly: those need a per-row cast that can fail, which a declared
    * schema must never smuggle into a scan. Requires a DECLARED schema
    * (CREATE TABLE declares one; pre-DDL lakes run
    * `CALL lake.declare_schema` first) — evolution validates against
    * the declaration, not a guess. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val path = pathOf(ident)
    val fs = fsOf(path)
    if (!FileManifest.enabled(fs, path))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val declared = SchemaLog.latest(fs, path).getOrElse(
      throw new UnsupportedOperationException(
        s"ALTER TABLE needs a declared schema at $path — run " +
          "CALL lake.declare_schema('" + path + "') once (CREATE " +
          "TABLE'd lakes are declared from birth)"))
    // RENAME/DROP COLUMN commit their own schema versions (alias- and
    // tombstone-carrying) — one verb per statement, exactly what the
    // SQL grammar parses to
    def flat(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1)
        throw new UnsupportedOperationException(
          s"$what of nested field ${fieldNames.mkString(".")} is not " +
            "supported — lake schemas are flat")
      fieldNames(0)
    }
    changes.toSeq match {
      case Seq(rn: TableChange.RenameColumn) =>
        SchemaLog.renameColumn(spark, path,
          flat(rn.fieldNames(), "RENAME COLUMN"), rn.newName()): Unit
        return tableAt(ident, None)
      case Seq(del: TableChange.DeleteColumn) =>
        SchemaLog.dropColumn(spark, path,
          flat(del.fieldNames(), "DROP COLUMN")): Unit
        return tableAt(ident, None)
      case cs if cs.exists(c => c.isInstanceOf[TableChange.RenameColumn]
          || c.isInstanceOf[TableChange.DeleteColumn]) =>
        throw new UnsupportedOperationException(
          "RENAME/DROP COLUMN cannot be combined with other ALTER " +
            "TABLE changes in one statement")
      case _ =>
    }
    def topLevel(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1)
        throw new UnsupportedOperationException(
          s"$what of nested field ${fieldNames.mkString(".")} is not " +
            "supported — lake schemas are flat")
      fieldNames(0)
    }
    val next = changes.foldLeft(declared) { (schema, change) =>
      change match {
        case add: TableChange.AddColumn =>
          val name = topLevel(add.fieldNames(), "ADD COLUMNS")
          if (!add.isNullable)
            throw new UnsupportedOperationException(
              s"ADD COLUMNS $name NOT NULL is not supported — existing " +
                "rows have no value for it; add it nullable")
          if (add.position() != null)
            throw new UnsupportedOperationException(
              s"ADD COLUMNS $name FIRST/AFTER is not supported — " +
                "evolved columns append at the end (silently ignoring " +
                "the position would misplace it)")
          // catalog-API callers can bypass the analyzer's own check; a
          // duplicate field would publish an ambiguous declared schema
          // that evolve can never repair (drops are refused)
          if (schema.fieldNames.exists(_.equalsIgnoreCase(name)))
            throw new IllegalArgumentException(
              s"ADD COLUMNS $name: the column already exists")
          StructType(schema.fields :+ org.apache.spark.sql.types
            .StructField(name, add.dataType(), nullable = true))
        case upd: TableChange.UpdateColumnType =>
          val name = topLevel(upd.fieldNames(), "ALTER COLUMN")
          if (!schema.fieldNames.contains(name))
            throw new IllegalArgumentException(
              s"ALTER COLUMN $name: no such column " +
                s"(have: ${schema.fieldNames.mkString(", ")})")
          StructType(schema.fields.map(f =>
            if (f.name == name) f.copy(dataType = upd.newDataType())
            else f))
        case other => throw new UnsupportedOperationException(
          s"ALTER TABLE $other is not supported — the lake evolves by " +
            "adding nullable columns, widening types, and RENAME " +
            "COLUMN (alias-mapped); drops/narrowing lose data")
      }
    }
    // metadata-only commit; validateEvolution rejects anything that
    // is not a pure widening of the declaration
    SchemaLog.evolve(spark, path, next): Unit
    tableAt(ident, None)
  }

  /** DROP TABLE only for lakes that never held committed data (every
    * retained version's file set is empty) — exactly the cleanup a
    * failed CTAS needs. A data-bearing lake refuses: SQL must not
    * delete 100 TB plus its whole time-travel history in one verb
    * (expire/vacuum are the governed paths). */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    val fs = fsOf(path)
    if (!FileManifest.enabled(fs, path)) return false
    val versions = FileManifest.versions(fs, path)
    val anyData = versions.exists(v =>
      FileManifest.at(fs, path, v).exists(_.cur.nonEmpty))
    if (anyData)
      throw new UnsupportedOperationException(
        s"DROP TABLE on a data-bearing lake ($path) is refused — " +
          "retire data through DELETE / expire_partitions / vacuum, " +
          "then remove the empty lake from the engine")
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    readOnly("renameTable (a lake's identity is its path)")
}
