package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Private-API bridge: construct the stock DSv2 parquet [[Table]] over
  * an EXPLICIT file list — the building block for exposing the manifest
  * lake through a `TableCatalog` (`graft.sources.LakeCatalog`).
  *
  * Why the stock table and not a custom one: `ParquetTable`'s scan
  * builder carries the whole production read stack — vectorized
  * reader, filter pushdown, column pruning, partition-directory
  * inference against `basePath`, file-index listing parallelism —
  * and a pinned manifest read is exactly "the stock parquet scan over
  * this precise file set". One constructor call reuses all of it.
  *
  * Bridged members (all `private[sql]` or in `execution.*`):
  *  - `ParquetTable.apply(name, session, options, paths, schema,
  *    fallback)` — the case-class constructor.
  *  - `ParquetFileFormat` — the required v1 fallback class token.
  *  - `ParquetScanBuilder` / `SupportsPushDownCatalystFilters` — the
  *    scan-builder wrapper forwards the internal catalyst-filter
  *    pushdown surface so wrapping costs no pushdown fidelity.
  */
object ParquetTableBridge {

  /** A parquet table over exactly `paths`, with partition columns
    * inferred relative to `basePath` and (when the lake declares one)
    * the committed table schema applied — the same projection contract
    * as `History.readPinned`.
    *
    * Reads delegate wholesale to the stock scan stack, plus ONE
    * interception: an ungrouped `COUNT(*)` with no filters answers
    * from `metaCount` (the lake's footer-stats row count) as a
    * LocalScan — zero file scans — when the sidecar is fresh.
    *
    * Writes: absent `writeBuilder`, write capability is not declared
    * and a SQL INSERT fails at analysis — the stock `ParquetTable`'s
    * own `SupportsWrite` would land files OUTSIDE the manifest commit
    * protocol (invisible to pinned readers, reclaimed by vacuum:
    * silent data loss). With `writeBuilder` (the catalog passes the
    * staged-append path for latest-version tables), INSERT routes
    * through the engine's validated exactly-once append instead. */
  def table(name: String, spark: SparkSession, paths: Seq[String],
            basePath: String, schema: Option[StructType],
            extraProperties: Map[String, String] = Map.empty,
            aggResolver: (Aggregation, Seq[org.apache.spark.sql.sources.Filter])
              => Option[graft.sources.MetaAggScan] = (_, _) => None,
            writeBuilder: Option[LogicalWriteInfo => WriteBuilder] = None,
            deleteTarget: Option[String] = None)
      : Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("basePath", basePath): Unit
    new LakeBridgeTable(ParquetTable(name, spark,
      new CaseInsensitiveStringMap(opts),
      paths.toList, schema, classOf[ParquetFileFormat]),
      extraProperties, aggResolver, writeBuilder, deleteTarget)
  }

  private final class LakeBridgeTable(
      delegate: ParquetTable,
      extraProperties: Map[String, String],
      aggResolver: (Aggregation, Seq[org.apache.spark.sql.sources.Filter])
        => Option[graft.sources.MetaAggScan],
      writeBuilder: Option[LogicalWriteInfo => WriteBuilder],
      target: Option[String])
      extends Table
      with org.apache.spark.sql.connector.catalog.SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsWrite
      with graft.sources.LakeSqlDelete {
    override protected def deleteTarget: Option[String] = target
    override protected def deleteColumns: Set[String] =
      delegate.schema.fieldNames.toSet
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def partitioning() = delegate.partitioning()
    override def properties() = {
      // surface the lake's commit metadata (version, declared schema,
      // CHECK constraints) through SHOW TBLPROPERTIES / DESCRIBE
      val merged = new java.util.HashMap[String, String](
        delegate.properties())
      extraProperties.foreach { case (k, v) => merged.put(k, v): Unit }
      merged
    }
    override def columns() = delegate.columns()
    override def capabilities()
        : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
      val caps = java.util.EnumSet.of(
        org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
      if (writeBuilder.isDefined) {
        caps.add(org.apache.spark.sql.connector.catalog
          .TableCapability.V1_BATCH_WRITE): Unit
        // full-table INSERT OVERWRITE (see LakeSqlWrite.builder)
        caps.add(org.apache.spark.sql.connector.catalog
          .TableCapability.TRUNCATE): Unit
        // static PARTITION-clause INSERT OVERWRITE (overwriteWhere)
        caps.add(org.apache.spark.sql.connector.catalog
          .TableCapability.OVERWRITE_BY_FILTER): Unit
      }
      caps
    }
    override def newScanBuilder(options: CaseInsensitiveStringMap) =
      new LakeBridgeScanBuilder(
        delegate.newScanBuilder(options), aggResolver)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      writeBuilder.getOrElse(throw new UnsupportedOperationException(
        s"${delegate.name} is read-only at this version — INSERT " +
          "targets the lake's latest version"))(info)
  }

  /** Forwards the stock builder's pushdown surface untouched; adds one
    * aggregate rule — an ungrouped Aggregation that the lake's
    * metadata can answer WHOLE (COUNT(*) from the row-count sidecar,
    * MIN/MAX of BIGINT columns from footer extrema) → a
    * [[graft.sources.MetaAggScan]]. Pushed filters translate back to
    * source filters and ride along: PARTITION-decidable predicates
    * select the file subset whose sidecar entries answer the aggregate
    * (Spark only attempts aggregate pushdown when no post-scan filter
    * remains, and the stock builder fully consumes exactly the
    * partition filters — so what reaches the resolver is decidable or
    * nothing). A stale sidecar, an untranslatable filter, or a
    * data-column predicate makes the resolver return None — stats are
    * an optimization, never a guess. */
  private final class LakeBridgeScanBuilder(
      delegate: ParquetScanBuilder,
      aggResolver: (Aggregation, Seq[org.apache.spark.sql.sources.Filter])
        => Option[graft.sources.MetaAggScan])
      extends ScanBuilder with SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

    private var pushed: Seq[Expression] = Nil
    private var metaAgg: Option[graft.sources.MetaAggScan] = None

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
      pushed = pushed ++ filters
      delegate.pushFilters(filters)
    }
    override def pushedFilters: Array[Predicate] = delegate.pushedFilters

    override def pruneColumns(requiredSchema: StructType): Unit =
      delegate.pruneColumns(requiredSchema)

    // memoized per aggregate: Spark probes supportCompletePushDown
    // then pushes, and each resolution re-translates the pushed
    // filters and walks O(files) metadata
    private var lastResolved: Option[(Aggregation,
      Option[graft.sources.MetaAggScan])] = None
    private def resolve(agg: Aggregation)
        : Option[graft.sources.MetaAggScan] =
      lastResolved match {
        case Some((a, r)) if a == agg => r
        case _ =>
          val translated = pushed.map(
            org.apache.spark.sql.execution.datasources.DataSourceStrategy
              .translateFilter(_, supportNestedPredicatePushdown = true))
          val r =
            if (translated.exists(_.isEmpty)) None
            else aggResolver(agg, translated.map(_.get))
          lastResolved = Some((agg, r))
          r
      }

    override def supportCompletePushDown(agg: Aggregation): Boolean =
      resolve(agg).isDefined || delegate.supportCompletePushDown(agg)
    override def pushAggregation(agg: Aggregation): Boolean = {
      metaAgg = resolve(agg)
      // fall back to the stock builder's own aggregate pushdown (the
      // parquet footer-stats path, config-gated inside the delegate) —
      // a lake with a stale sidecar should not lose the capability the
      // unwrapped table had
      metaAgg.isDefined || delegate.pushAggregation(agg)
    }

    override def build(): Scan =
      metaAgg.getOrElse(delegate.build())
  }
}
