package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
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
  */
object ParquetTableBridge {

  /** A read-only parquet table over exactly `paths`, with partition
    * columns inferred relative to `basePath` and (when the lake
    * declares one) the committed table schema applied — the same
    * projection contract as `History.readPinned`.
    *
    * READ-ONLY enforced at the capability level: the stock
    * `ParquetTable` also implements `SupportsWrite`, and a SQL INSERT
    * through it would land parquet files in the lake dir OUTSIDE the
    * manifest commit protocol — invisible to pinned readers and
    * reclaimed by the next vacuum, i.e. silent data loss. The wrapper
    * exposes only the scan side, so writes fail at analysis with
    * "table does not support append". */
  def table(name: String, spark: SparkSession, paths: Seq[String],
            basePath: String, schema: Option[StructType],
            extraProperties: Map[String, String] = Map.empty): Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("basePath", basePath): Unit
    new ReadOnlyTable(ParquetTable(name, spark,
      new CaseInsensitiveStringMap(opts),
      paths.toList, schema, classOf[ParquetFileFormat]), extraProperties)
  }

  private final class ReadOnlyTable(delegate: ParquetTable,
                                    extraProperties: Map[String, String])
      extends Table
      with org.apache.spark.sql.connector.catalog.SupportsRead {
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
        : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
      java.util.EnumSet.of(
        org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap) =
      delegate.newScanBuilder(options)
  }
}
