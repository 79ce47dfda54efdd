package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
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
    * distinct INSERT statements land distinct batches. */
  def builder(path: String, partitionCols: Seq[String],
              info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite)
                throw new UnsupportedOperationException(
                  s"INSERT OVERWRITE is not supported on lake $path — " +
                    "restate data through History.overwritePartitions / " +
                    "deleteWhere + INSERT, which commit atomically")
              History.append(data.sparkSession, path, data,
                key = s"sql-insert-${info.queryId()}",
                partitionCols = partitionCols): Unit
            }
          }
      }
    }
}

/** Metadata-only `COUNT(*)`: a [[LocalScan]] carrying the one answer
  * row. Planned when the whole aggregate was pushed down — the query
  * `SELECT count(*) FROM lake.\`/p\`` then executes as a
  * LocalTableScan over this row: zero file scans, zero tasks (the
  * count came from [[History.fastCount]]'s footer-stats sidecar minus
  * live deletion-vector cardinalities). */
final class MetaCountScan(n: Long) extends LocalScan {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def rows(): Array[InternalRow] =
    Array(InternalRow(n))
  override def description(): String = s"GraftMetaCount($n)"
}

object MetaCountScan {
  /** True iff `agg` is exactly an ungrouped COUNT(*) — the one shape
    * the stats sidecar can answer. */
  def answerable(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
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
    rowCount: Option[Long], writable: Boolean, partitionCols: Seq[String])
  extends Table with SupportsRead with SupportsWrite {

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
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PinnedLakeScanBuilder(path, version, tableSchema, rowCount)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (!writable)
      throw new UnsupportedOperationException(
        s"time-travel pins of $path are read-only; INSERT targets the " +
          "lake's latest version")
    LakeSqlWrite.builder(path, partitionCols, info)
  }
}

private final class PinnedLakeScanBuilder(
    path: String, version: Long, tableSchema: StructType,
    rowCount: Option[Long])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val columns = tableSchema.fieldNames.toSet
  private var required: StructType = tableSchema
  private var all: Array[Filter] = Array.empty
  private var countPushed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    all = filters
    filters // ALL re-evaluated post-scan: pushed copies only prune
  }
  override def pushedFilters(): Array[Filter] =
    all.filter(LakeFilterSql.prune(_, columns).isDefined)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canAnswer(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canAnswer(agg)) return false
    countPushed = true
    true
  }
  // a WHERE clause (even one fully pushed) changes the counted set, so
  // any filter at all disqualifies the metadata answer
  private def canAnswer(agg: Aggregation): Boolean =
    rowCount.isDefined && all.isEmpty && MetaCountScan.answerable(agg)

  override def build(): Scan =
    if (countPushed) new MetaCountScan(rowCount.get)
    else new PinnedLakeScan(path, version, required, all)
}

private final class PinnedLakeScan(
    path: String, version: Long, required: StructType,
    filters: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new PinnedLakeRelation(context, path, version, required, filters)
      .asInstanceOf[T]

  override def description(): String = {
    val pushed = filters.mkString(", ")
    s"GraftPinnedLake $path@v$version PushedFilters: [$pushed], " +
      s"ReadSchema: ${required.catalogString}"
  }
}

private final class PinnedLakeRelation(
    context: SQLContext, path: String, version: Long,
    required: StructType, filters: Array[Filter])
  extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context
  override def schema: StructType = required
  override def toString: String = s"GraftPinnedLake($path@v$version)"
  // buildScan hands back the inner plan's InternalRows directly —
  // declaring no conversion skips a per-row external-Row round trip
  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] = {
    val spark = context.sparkSession
    val base = History.readPinned(spark, path, version)
    val names = base.columns.toSet
    val filtered = filters
      .flatMap(LakeFilterSql.prune(_, names))
      .foldLeft(base)(_.filter(_))
    val pruned = filtered.select(
      required.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
