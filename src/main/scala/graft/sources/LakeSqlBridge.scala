package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL-surface write path for manifest lakes: `INSERT INTO
  * lake.\`/path\`` routes through the SAME staged, validated,
  * exactly-once append every engine writer uses ([[History.append]] —
  * declared-schema validation, staged-bytes CHECK-constraint
  * enforcement, OCC manifest commit), so a SQL-landed batch is
  * indistinguishable from an engine-landed one. V1 write fallback by
  * design: the append protocol is a driver-coordinated
  * stage-then-publish, which is exactly what [[InsertableRelation]]
  * hands us — a distributed DSv2 `BatchWrite` would have to re-invent
  * the staging commit for zero gain (the stage write itself is a
  * distributed parquet job inside `History.append`).
  */
object LakeSqlWrite {

  /** One WriteBuilder per INSERT: the query id keys the staged batch,
    * so a retried/crashed INSERT converges to exactly one copy while
    * distinct INSERT statements land distinct batches.
    *
    * Overwrites ride `SupportsOverwrite`, the V1-fallback overwrite
    * protocol, split by the delete filter Spark hands over:
    *  - full-table `INSERT OVERWRITE` (filter = AlwaysTrue, routed
    *    through `truncate()`) → the atomic whole-lake restatement
    *    ([[History.overwriteAll]] — one flip, never a delete+insert
    *    pair with a visible in-between state);
    *  - static `INSERT OVERWRITE … PARTITION (k = v)` (filter = the
    *    partition equalities) → the partition-filtered restatement
    *    ([[History.overwriteWhere]] — retires exactly the files whose
    *    `k=v` dirs satisfy the filter, CAS commit, batch containment
    *    checked).
    * DYNAMIC-mode overwrite (`partitionOverwriteMode=dynamic`) has no
    * V1 image; with the [[graft.GraftExtensions]] rule installed the
    * resolved plan routes to [[History.overwritePartitions]]
    * ([[GraftDynamicOverwriteCommand]]); without the extension it
    * still refuses loudly at analysis (capability check). */
  def builder(path: String, partitionCols: Seq[String],
              info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var replaceAll = false
      private var byFilter: Option[Array[Filter]] = None
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        // Spark routes an all-AlwaysTrue filter set through truncate()
        // already; keep the equivalence here for direct callers
        if (filters.forall(_.isInstanceOf[sources.AlwaysTrue]))
          replaceAll = true
        else byFilter = Some(filters)
        this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              byFilter match {
                case Some(filters) =>
                  History.overwriteWhere(data.sparkSession, path, data,
                    filters.toIndexedSeq): Unit
                case None if replaceAll || overwrite =>
                  History.overwriteAll(data.sparkSession, path, data): Unit
                case None =>
                  History.append(data.sparkSession, path, data,
                    key = s"sql-insert-${info.queryId()}",
                    partitionCols = partitionCols): Unit
              }
          }
      }
    }
}

/** SQL row-level DELETE for manifest lakes: `DELETE FROM
  * lake.\`/path\` WHERE …` routes to the engine's MERGE-ON-READ
  * takedown ([[History.deleteWhereDV]] — per-file deletion-vector
  * sidecars + one OCC manifest commit, ZERO data bytes rewritten: the
  * k-rows-over-j-multi-GB-files takedown costs j few-KB sidecars at
  * 100 TB), the same operator every engine-side takedown uses, so a
  * SQL-issued delete is indistinguishable from an engine-issued one
  * (change feed emits it, readers apply it inline, materializeDeletes
  * folds it). An UNCONDITIONAL `DELETE FROM lake.\`/p\`` — and SQL
  * TRUNCATE, which Spark lowers to it — takes the COPY-ON-WRITE path
  * instead ([[History.deleteWhere]]): every file retires in one
  * manifest flip, zero sidecars written for zero surviving rows, and
  * time travel to the pre-truncate version still answers until vacuum.
  *
  * `canDeleteWhere` accepts only conditions whose every filter
  * converts EXACTLY back to a `Column` predicate
  * ([[LakeFilterSql.exact]]) — the read path's handled-filter
  * contract, for the inverse reason: a weaker image would delete too
  * little, a stricter one too much, and refusal here makes Spark fail
  * the DELETE loudly at analysis instead of running a wrong one. (A
  * condition Catalyst cannot translate to source filters at all —
  * `doc_id % 17 = 5` — never reaches us and fails the same way;
  * expression-level deletes go through the engine's `deleteWhereDV`
  * directly.) NULL-predicate rows survive, SQL DELETE semantics —
  * enforced inside the engine operator. Time-travel pins refuse: a
  * delete targets the lake's PRESENT. */
trait LakeSqlDelete extends org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** The lake root when this table is a deletable latest-version pin;
    * None for time-travel pins (read targets only). */
  protected def deleteTarget: Option[String]

  /** The lake root this SQL table can target with row-level DML
    * beyond DELETE (UPDATE / MERGE, via [[LakeDmlRule]]); None for
    * read-only time-travel pins. */
  final def sqlDmlTarget: Option[String] = deleteTarget
  /** Top-level column names the conversion may reference. */
  protected def deleteColumns: Set[String]

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    deleteTarget.isDefined &&
      filters.forall(LakeFilterSql.exact(_, deleteColumns).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val path = deleteTarget.getOrElse(throw new UnsupportedOperationException(
      "time-travel pins are read-only; DELETE targets the lake's " +
        "latest version"))
    val spark = org.apache.spark.sql.SparkSession.active
    val unconditional = filters.forall {
      case _: sources.AlwaysTrue => true
      case _ => false
    }
    if (unconditional)
      History.deleteWhere(spark, path, lit(true)): Unit
    else {
      val pred = filters.toIndexedSeq.map { f =>
        LakeFilterSql.exact(f, deleteColumns).getOrElse(
          throw new IllegalStateException(
            s"DELETE filter $f no longer converts against $path " +
              "(schema changed since analysis) — re-run the statement"))
      }.reduce(_ && _)
      // dense deletes (> the DV position cap) fall back to the
      // copy-on-write path — the SQL surface must run both shapes
      // (filters here are exactly convertible, hence deterministic)
      val cap = spark.conf
        .get("spark.graft.dml.dvMaxPositions", "10000000").toLong
      try History.deleteWhereDV(spark, path, pred, cap): Unit
      catch { case _: DvCapExceededException =>
        History.deleteWhere(spark, path, pred): Unit }
    }
  }
}

/** A fully-answered metadata aggregate: a [[LocalScan]] carrying the
  * one answer row. Planned when the WHOLE pushed Aggregation resolved
  * from lake metadata — `SELECT count(*), min(id), max(id) FROM
  * lake.\`/p\`` then executes as a LocalTableScan over this row: zero
  * file scans, zero tasks (COUNT from [[History.fastCount]]'s footer
  * row counts minus live DV cardinalities; MIN/MAX from
  * [[History.fastMinMax]]'s per-file footer extrema). */
final class MetaAggScan(schema: StructType, data: Array[Array[Any]])
    extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] =
    data.map(vs => InternalRow.fromSeq(vs.toIndexedSeq))
  override def description(): String =
    s"GraftMetaAgg(${data.length} rows)"
}

object MetaAggScan {

  /** Resolve an UNGROUPED pushed Aggregation from metadata, or None.
    * `count` answers COUNT(*); `minMax` answers MIN/MAX for a named
    * top-level column as (column type, min, max) in CATALYST-internal
    * values (Long / Int days-for-DATE / UTF8String), or None when the
    * column is unstatted / of an unstattable type / the selection
    * carries live deletion vectors (a vector may have deleted the
    * extreme row — unlike COUNT, extrema cannot be netted from
    * cardinalities). */
  def resolve(agg: Aggregation, count: => Option[Long],
              minMax: String => Option[(org.apache.spark.sql.types.DataType,
                Any, Any)],
              countCol: String => Option[Long] = _ => None)
      : Option[MetaAggScan] = {
    if (agg.groupByExpressions().nonEmpty) return None
    resolveFuncs(agg, count, minMax, countCol).map {
      case (fields, values) =>
        new MetaAggScan(StructType(fields), Array(values.toArray))
    }
  }

  /** The per-function half: ALL functions must answer (a half-answered
    * aggregate cannot be stitched onto a scan). `countCol` answers the
    * NON-NULL `COUNT(col)` from footer rows − footer nulls. */
  def resolveFuncs(agg: Aggregation, count: => Option[Long],
                   minMax: String => Option[
                     (org.apache.spark.sql.types.DataType, Any, Any)],
                   countCol: String => Option[Long] = _ => None)
      : Option[(Seq[StructField], Seq[Any])] = {
    val funcs = agg.aggregateExpressions()
    if (funcs.isEmpty) return None
    val resolved: Seq[Option[(StructField, Any)]] =
      funcs.toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          count.map(n =>
            (StructField(s"count_$i", LongType, nullable = false), n: Any))
        case (c: aggregate.Count, i) if !c.isDistinct =>
          colName(c.column()).flatMap(countCol).map(n =>
            (StructField(s"countcol_$i", LongType, nullable = false),
              n: Any))
        case (m: aggregate.Min, i) =>
          colName(m.column()).flatMap(minMax).map { case (dt, mn, _) =>
            (StructField(s"min_$i", dt, nullable = false), mn) }
        case (m: aggregate.Max, i) =>
          colName(m.column()).flatMap(minMax).map { case (dt, _, mx) =>
            (StructField(s"max_$i", dt, nullable = false), mx) }
        case _ => None // SUM/AVG/COUNT(DISTINCT): no metadata answer
      }
    if (resolved.exists(_.isEmpty)) None
    else Some((resolved.map(_.get._1), resolved.map(_.get._2)))
  }

  /** The single top-level column a connector expression names. */
  def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case n: org.apache.spark.sql.connector.expressions.NamedReference
        if n.fieldNames().length == 1 =>
      Some(n.fieldNames()(0))
    case _ => None
  }

  /** The COMPLETE metadata-aggregate resolution: pushed filters select
    * a file subset when partition-decidable ([[PartitionPredicate]]),
    * then either the ungrouped functions answer over that subset, or —
    * when every grouping key is a partition column — each group's
    * functions answer over ITS files (a file belongs wholesale to the
    * group its `k=v` dirs spell). `funcs` evaluates the aggregate
    * functions over a file subset (the caller binds it to the lake's
    * sidecar readers); group keys decode type-exactly to catalyst
    * values, `__HIVE_DEFAULT_PARTITION__` is the null group, and any
    * doubt anywhere returns None — the scan is always the fallback. */
  def resolveWithGrouping(agg: Aggregation,
      filters: Seq[sources.Filter], cur: Seq[String],
      partCols: Seq[String], schema: StructType,
      funcs: Seq[String] => Option[(Seq[StructField], Seq[Any])])
      : Option[MetaAggScan] =
    PartitionPredicate.select(cur, partCols, schema, filters)
      .flatMap { rels =>
        val groupRefs = agg.groupByExpressions().toSeq.map(colName)
        if (groupRefs.isEmpty)
          funcs(rels).map { case (fields, values) =>
            new MetaAggScan(StructType(fields), Array(values.toArray))
          }
        else if (groupRefs.exists(_.isEmpty) ||
            !groupRefs.flatten.forall(partCols.contains)) None
        else {
          val gcols = groupRefs.flatten
          val types = schema.fields.map(f => f.name -> f.dataType).toMap
          val decoded: Seq[Option[(Seq[Any], String)]] = rels.map { rel =>
            PartitionPredicate.partitionValues(rel).flatMap { vals =>
              val tup = gcols.map(c => vals.get(c).flatMap(raw =>
                types.get(c).flatMap(dt =>
                  PartitionPredicate.catalystValue(raw, dt))))
              if (tup.exists(_.isEmpty)) None
              else Some((tup.map(_.get), rel))
            }
          }
          if (decoded.exists(_.isEmpty)) None
          else {
            val gFields = gcols.map(c =>
              StructField(c, types(c), nullable = true))
            val groups = decoded.map(_.get)
              .groupBy(_._1).toSeq
              .sortBy(_._1.map(String.valueOf(_)).mkString("|"))
            if (groups.isEmpty)
              // zero selected files ⇒ zero groups (exactly the pruned
              // scan's answer); the schema still needs the function
              // fields — derive them over the empty subset
              funcs(Nil).map { case (fields, _) =>
                new MetaAggScan(StructType(gFields ++ fields),
                  Array.empty)
              }
            else {
              val rows = groups.map { case (tup, members) =>
                funcs(members.map(_._2)).map(fv => (fv._1, tup ++ fv._2))
              }
              if (rows.exists(_.isEmpty)) None
              else Some(new MetaAggScan(
                StructType(gFields ++ rows.head.get._1),
                rows.map(_.get._2.toArray).toArray))
            }
          }
        }
      }
}

/** Exact translations from DSv2 [[sources.Filter]]s back to `Column`
  * predicates — the inverse of Catalyst's `translateFilter` mapping,
  * used to push SQL WHERE clauses into the inner pinned-read plan of
  * [[PinnedLakeRelation]] (where the parquet scan can act on them).
  *
  * SAFETY CONTRACT: a conversion must be EXACTLY equivalent or absent
  * — never stricter. The scan builder reports every filter back to
  * Spark for post-scan re-evaluation, so a weaker pushed copy only
  * costs rows re-filtered above; a stricter one would silently drop
  * rows the query should return (re-evaluation cannot resurrect a row
  * the scan never produced). `And` may weaken to one convertible
  * conjunct at the TOP level only; under `Not`/`Or` every child must
  * convert exactly (a weakened child under Not flips into a stricter
  * predicate). */
private[sources] object LakeFilterSql {

  /** Top-level conversion: may drop unconvertible conjuncts. */
  def prune(f: Filter, columns: Set[String]): Option[Column] = f match {
    case sources.And(l, r) =>
      (prune(l, columns).toSeq ++ prune(r, columns).toSeq)
        .reduceOption(_ && _)
    case other => exact(other, columns)
  }

  private def ref(attr: String, columns: Set[String]): Option[Column] =
    // top-level columns only: a dotted name here is a nested-field
    // reference the inner plan would mis-parse, and a backtick cannot
    // be quoted back safely — skip, Spark re-evaluates above
    if (columns.contains(attr) && !attr.contains('`') &&
        !attr.contains('.')) Some(col(s"`$attr`"))
    else None

  /** Exactly-equivalent conversion or None. */
  def exact(f: Filter, columns: Set[String]): Option[Column] = f match {
    case sources.EqualTo(a, v) => ref(a, columns).map(_ === lit(v))
    case sources.EqualNullSafe(a, v) => ref(a, columns).map(_ <=> lit(v))
    case sources.GreaterThan(a, v) => ref(a, columns).map(_ > lit(v))
    case sources.GreaterThanOrEqual(a, v) => ref(a, columns).map(_ >= lit(v))
    case sources.LessThan(a, v) => ref(a, columns).map(_ < lit(v))
    case sources.LessThanOrEqual(a, v) => ref(a, columns).map(_ <= lit(v))
    case sources.In(a, vs) =>
      ref(a, columns).map(_.isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => ref(a, columns).map(_.isNull)
    case sources.IsNotNull(a) => ref(a, columns).map(_.isNotNull)
    case sources.StringStartsWith(a, v) =>
      ref(a, columns).map(_.startsWith(v))
    case sources.StringEndsWith(a, v) => ref(a, columns).map(_.endsWith(v))
    case sources.StringContains(a, v) => ref(a, columns).map(_.contains(v))
    case sources.And(l, r) =>
      for (lc <- exact(l, columns); rc <- exact(r, columns)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- exact(l, columns); rc <- exact(r, columns)) yield lc || rc
    case sources.Not(c) => exact(c, columns).map(!_)
    case _: sources.AlwaysTrue => Some(lit(true))
    case _: sources.AlwaysFalse => Some(lit(false))
    case _ => None
  }
}

/** A driver-computed METADATA table (`lake.\`/path#history\`` and
  * friends): rows come from a lake-metadata DataFrame built at scan
  * time — manifest/sidecar reads only, zero data files. V1Scan
  * fallback like [[PinnedLakeTable]]; no pushdown surface (these
  * tables are O(versions)/O(files) rows of metadata, not data). */
final class LakeMetaTable(tableName: String, tableSchema: StructType,
                          df: () => DataFrame)
  extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = tableSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = tableSchema
            override def needConversion: Boolean = false
            override def toString: String = tableName
            override def buildScan(): RDD[Row] =
              df().queryExecution.toRdd.asInstanceOf[RDD[Row]]
          }.asInstanceOf[T]
        override def description(): String = s"GraftLakeMeta($tableName)"
      }
    }
}

/** SQL table over a pinned manifest snapshot served through the
  * ENGINE's read plan ([[History.readPinned]]) instead of the stock
  * DSv2 parquet table — the path that can apply merge-on-read
  * deletion vectors (the codegen `!dv_deleted(file, row)` predicate at
  * the plan choke point), which the stock table cannot. The catalog
  * routes DV-bearing snapshots here, so a takedown no longer blacks
  * out the SQL surface; DV-free snapshots keep the stock vectorized
  * table.
  *
  * Pushdown: implemented at the DSv2 level and REPLAYED into the inner
  * plan — `pruneColumns` becomes a `select` (column pruning reaches
  * the parquet reader), convertible filters become `Column` predicates
  * on the inner frame (row-group/partition pruning reaches the scan),
  * and every filter is also reported back for post-scan re-evaluation
  * (the pushed copies only prune, so a conversion gap can never drop
  * rows). An ungrouped `COUNT(*)` short-circuits to a
  * [[MetaCountScan]] when [[History.fastCount]] can answer from
  * metadata — DV cardinalities already netted out.
  *
  * V1 read fallback (`V1Scan` → one inner DataFrame): rows flow
  * through the engine's whole-stage-codegen plan and surface as one
  * `RowDataSourceScanExec`; vs the stock path this costs one
  * InternalRow hand-off per row — the price of DV fidelity, paid only
  * by DV-bearing snapshots.
  */
final class PinnedLakeTable(
    tableName: String, path: String, version: Long,
    tableSchema: StructType, props: Map[String, String],
    aggResolver: (Aggregation, Seq[Filter]) => Option[MetaAggScan],
    writable: Boolean, partitionCols: Seq[String],
    era: Boolean = false)
  extends Table with SupportsRead with SupportsWrite with LakeSqlDelete {

  override protected def deleteTarget: Option[String] =
    if (writable) Some(path) else None
  override protected def deleteColumns: Set[String] =
    tableSchema.fieldNames.toSet

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    partitionCols.map(Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => m.put(k, v): Unit }
    m
  }
  override def capabilities(): java.util.Set[TableCapability] =
    if (writable)
      // TRUNCATE → whole-lake restatement; OVERWRITE_BY_FILTER → the
      // static PARTITION-clause restatement (History.overwriteWhere).
      // Dynamic-mode overwrite has no V1 image here — it routes
      // through the GraftExtensions rule (GraftDynamicOverwriteCommand)
      // and refuses at ANALYSIS in extension-less sessions
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PinnedLakeScanBuilder(path, version, tableSchema, aggResolver, era)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (!writable)
      throw new UnsupportedOperationException(
        s"time-travel pins of $path are read-only; INSERT targets the " +
          "lake's latest version")
    LakeSqlWrite.builder(path, partitionCols, info)
  }
}

/** @param era resolve the pinned version's SNAPSHOT-ERA declared
  *        schema (an explicit `VERSION AS OF` pin) instead of the
  *        lake's present declaration (the catalog's latest table,
  *        which pins a version only for snapshot stability). */
private final class PinnedLakeScanBuilder(
    path: String, version: Long, tableSchema: StructType,
    aggResolver: (Aggregation, Seq[Filter]) => Option[MetaAggScan],
    era: Boolean)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val columns = tableSchema.fieldNames.toSet
  private var required: StructType = tableSchema
  private var all: Array[Filter] = Array.empty
  private var metaAgg: Option[MetaAggScan] = None

  /** Filters split by EXACT convertibility: an exactly-convertible
    * filter is fully handled by the inner plan (its Column image has
    * identical semantics — the LakeFilterSql contract), so it is NOT
    * returned for post-scan re-evaluation; that absence is what makes
    * a filtered aggregate eligible for whole-aggregate pushdown (a
    * residual Filter node between Aggregate and relation blocks it).
    * Anything not exactly convertible stays post-scan (and may still
    * prune via the weaker `prune` image). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    all = filters
    filters.filterNot(LakeFilterSql.exact(_, columns).isDefined)
  }
  override def pushedFilters(): Array[Filter] =
    all.filter(LakeFilterSql.exact(_, columns).isDefined)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // the resolver sees the pushed filters: partition-decidable ones
  // select a file subset whose sidecar entries answer the aggregate;
  // anything else returns None and the scan runs. Memoized per
  // aggregate — Spark probes supportCompletePushDown then pushes, and
  // each resolution walks O(files) metadata.
  private var lastResolved: Option[(Aggregation, Option[MetaAggScan])] = None
  private def resolve(agg: Aggregation): Option[MetaAggScan] =
    lastResolved match {
      case Some((a, r)) if a == agg => r
      case _ =>
        val r = aggResolver(agg, all.toSeq)
        lastResolved = Some((agg, r))
        r
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    resolve(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    metaAgg = resolve(agg)
    metaAgg.isDefined
  }

  override def build(): Scan =
    metaAgg.getOrElse(new PinnedLakeScan(path, version, required,
      all.filter(LakeFilterSql.exact(_, columns).isDefined),
      all.filterNot(LakeFilterSql.exact(_, columns).isDefined), era))
}

private final class PinnedLakeScan(
    path: String, version: Long, required: StructType,
    handled: Array[Filter], residual: Array[Filter],
    era: Boolean) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new PinnedLakeRelation(context, path, version, required,
      handled, residual, era).asInstanceOf[T]

  override def description(): String = {
    val pushed = (handled ++ residual).mkString(", ")
    s"GraftPinnedLake $path@v$version PushedFilters: [$pushed], " +
      s"ReadSchema: ${required.catalogString}"
  }
}

private final class PinnedLakeRelation(
    context: SQLContext, path: String, version: Long,
    required: StructType, handled: Array[Filter],
    residual: Array[Filter], era: Boolean)
  extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context
  override def schema: StructType = required
  override def toString: String = s"GraftPinnedLake($path@v$version)"
  // buildScan hands back the inner plan's InternalRows directly —
  // declaring no conversion skips a per-row external-Row round trip
  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] = {
    val spark = context.sparkSession
    val base = History.readPinned(spark, path, version, eraSchema = era)
    val names = base.columns.toSet
    // HANDLED filters were reported fully consumed at analysis (Spark
    // re-evaluates nothing above) — a failed re-conversion here (the
    // lake's declared schema changed between analysis and execution)
    // must fail LOUDLY: silently dropping one would return unfiltered
    // rows as if they matched
    val handledCols = handled.map { f =>
      LakeFilterSql.exact(f, names).getOrElse(
        throw new IllegalStateException(
          s"pushed filter $f no longer converts against $path@v$version" +
            " (schema changed since analysis) — re-run the query"))
    }
    // residual filters re-evaluate above; their weaker images only prune
    val filtered = (handledCols ++ residual.flatMap(
        LakeFilterSql.prune(_, names)))
      .foldLeft(base)(_.filter(_))
    val pruned = filtered.select(
      required.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
