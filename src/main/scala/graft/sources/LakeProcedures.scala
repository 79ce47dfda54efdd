package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for lake maintenance — the last admin gap
  * between a SQL-only consumer and the engine API: every lifecycle
  * operator a deployment schedules (vacuum, compaction, DV folding,
  * stats/index refreshes, tags, restore, schema declaration, CHECK
  * constraints) is callable as
  * {{{
  *   CALL lake.vacuum('/data/corpus', 3600000)
  *   CALL lake.bin_pack('/data/corpus', 268435456, 2)
  *   CALL lake.add_constraint('/data/corpus', 'chars_nonneg', 'n_chars >= 0')
  * }}}
  * (also spelled `lake.system.<name>`, the table-format convention).
  * Each call routes to the SAME [[History]]/[[Constraints]] operator
  * the maintenance daemon runs — one implementation, two surfaces —
  * and returns the operator's result counters as a one-row table.
  *
  * All parameters are REQUIRED (no silent defaults on destructive
  * admin ops: a vacuum grace or a compaction target must be said out
  * loud in the statement that runs it). */
object LakeProcedures {

  /** One procedure definition: parameters and the action. */
  private final case class Proc(
      name: String, description: String,
      params: Seq[(String, DataType, String)],
      out: Seq[(String, DataType)],
      run: (SparkSession, InternalRow) => Seq[Any]) {

    def unbound: UnboundProcedure = new UnboundProcedure {
      override def name(): String = Proc.this.name
      override def description(): String = Proc.this.description
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = Proc.this.name
          override def description(): String = Proc.this.description
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, dt, c) =>
              ProcedureParameter.in(n, dt).comment(c).build()
            }.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val values = run(spark, input)
            val schema = StructType(out.map { case (n, dt) =>
              StructField(n, dt, nullable = false) })
            java.util.Collections.singletonList(
              new MetaAggScan(schema, Array(values.toArray)): Scan)
              .iterator()
          }
        }
    }
  }

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  private val procs: Map[String, Proc] = Seq(
    Proc("vacuum",
      "reclaim unreferenced files/manifests past the grace window",
      Seq(("path", StringType, "lake root"),
        ("grace_ms", LongType, "retention grace in milliseconds")),
      Seq(("files_reclaimed", IntegerType),
        ("versions_reclaimed", IntegerType)),
      (s, in) => {
        val (f, v) = History.vacuum(s, str(in, 0), in.getLong(1))
        Seq[Any](f, v)
      }),
    Proc("bin_pack",
      "compact small files up to target_bytes per output file",
      Seq(("path", StringType, "lake root"),
        ("target_bytes", LongType, "target output file size"),
        ("min_files", IntegerType, "minimum files per dir to pack")),
      Seq(("dirs_packed", IntegerType), ("files_removed", IntegerType)),
      (s, in) => {
        val (d, f) = History.binPack(s, str(in, 0), in.getLong(1),
          in.getInt(2))
        Seq[Any](d, f)
      }),
    Proc("materialize_deletes",
      "fold deletion vectors into rewritten files (copy-on-write)",
      Seq(("path", StringType, "lake root"),
        ("min_deleted_rows", LongType,
          "only fold files with at least this many deleted rows")),
      Seq(("files_rewritten", IntegerType), ("rows_dropped", LongType)),
      (s, in) => {
        val (f, r) = History.materializeDeletes(s, str(in, 0),
          in.getLong(1))
        Seq[Any](f, r)
      }),
    Proc("refresh_stats",
      "refresh the per-file min/max stats sidecar for a column",
      Seq(("path", StringType, "lake root"),
        ("column", StringType, "INT64 column to stat")),
      Seq(("files_statted", IntegerType)),
      (s, in) => Seq(History.refreshStats(s, str(in, 0), str(in, 1)))),
    Proc("refresh_row_counts",
      "refresh the per-file row-count sidecar (metadata COUNT(*))",
      Seq(("path", StringType, "lake root")),
      Seq(("files_counted", IntegerType)),
      (s, in) => Seq(History.refreshRowCounts(s, str(in, 0)))),
    Proc("refresh_key_index",
      "refresh the per-file bloom key index for a column",
      Seq(("path", StringType, "lake root"),
        ("column", StringType, "key column to index")),
      Seq(("files_indexed", IntegerType)),
      (s, in) => Seq(History.refreshKeyIndex(s, str(in, 0), str(in, 1)))),
    Proc("tag",
      "pin the lake's latest version under a snapshot tag",
      Seq(("path", StringType, "lake root"),
        ("name", StringType, "tag name")),
      Seq(("version", LongType)),
      (s, in) => Seq(History.tag(s, str(in, 0), str(in, 1)))),
    Proc("restore",
      "metadata-only rollback to a retained version",
      Seq(("path", StringType, "lake root"),
        ("version", LongType, "retained version to restore")),
      Seq(("new_version", LongType)),
      (s, in) => Seq(History.restore(s, str(in, 0), in.getLong(1)))),
    Proc("declare_schema",
      "commit the current read schema as the declared table schema",
      Seq(("path", StringType, "lake root")),
      Seq(("schema_version", LongType)),
      (s, in) => Seq(History.declareSchema(s, str(in, 0)))),
    Proc("add_constraint",
      "declare a CHECK constraint (validated against existing data)",
      Seq(("path", StringType, "lake root"),
        ("name", StringType, "constraint name"),
        ("expression", StringType, "boolean SQL expression")),
      Seq(("constraint_version", LongType)),
      (s, in) =>
        Seq(Constraints.add(s, str(in, 0), str(in, 1), str(in, 2)))),
    Proc("drop_constraint",
      "drop a declared CHECK constraint by name",
      Seq(("path", StringType, "lake root"),
        ("name", StringType, "constraint name")),
      Seq(("constraint_version", LongType)),
      (s, in) => Seq(Constraints.drop(s, str(in, 0), str(in, 1)))),
    Proc("cluster",
      "cluster-rewrite current files sorted on a column (tight stats)",
      Seq(("path", StringType, "lake root"),
        ("column", StringType, "sort column (INT64 for stats pruning)"),
        ("num_files", IntegerType,
          "target output file count; <= 0 keeps the current count")),
      Seq(("files_retired", IntegerType), ("files_statted", IntegerType)),
      (s, in) => {
        val (r, w) = History.clusterBy(s, str(in, 0), str(in, 1),
          in.getInt(2))
        Seq[Any](r, w)
      }),
    Proc("cluster_z",
      "Z-ORDER cluster-rewrite on >=2 integral columns (multi-dim prune)",
      Seq(("path", StringType, "lake root"),
        ("columns", StringType, "comma-separated integral columns"),
        ("num_files", IntegerType,
          "target output file count; <= 0 keeps the current count")),
      Seq(("files_retired", IntegerType), ("files_statted", IntegerType)),
      (s, in) => {
        val cols = str(in, 1).split(",").map(_.trim).filter(_.nonEmpty)
        val (r, w) = History.clusterByZ(s, str(in, 0), cols.toSeq,
          in.getInt(2))
        Seq[Any](r, w)
      }),
    Proc("repartition_lake",
      "re-grain the lake under a new partition scheme (whole-lake " +
        "restatement, one CAS flip, time travel intact)",
      Seq(("path", StringType, "lake root"),
        ("columns", StringType,
          "comma-separated new partition columns; empty = unpartitioned")),
      Seq(("files_staged", IntegerType), ("files_retired", IntegerType)),
      (s, in) => {
        val (st, rt) = History.repartitionLake(s, str(in, 0),
          csv(str(in, 1)))
        Seq[Any](st, rt)
      }),
    Proc("expire_partitions",
      "retire whole partitions matching a partition-column predicate",
      Seq(("path", StringType, "lake root"),
        ("predicate", StringType,
          "boolean SQL over partition columns, e.g. dt < '2026-01-01'")),
      Seq(("partitions_expired", IntegerType)),
      (s, in) => Seq(History.expirePartitionsWhere(s, str(in, 0),
        org.apache.spark.sql.functions.expr(str(in, 1))).size)),
    Proc("undrop_column",
      "undo a metadata-only DROP COLUMN: re-declare the field as last " +
        "declared and release its tombstone (exact — the tombstone " +
        "guaranteed the name was never recycled)",
      Seq(("path", StringType, "lake root"),
        ("column", StringType, "dropped column name")),
      Seq(("schema_version", LongType)),
      (s, in) => Seq(SchemaLog.undropColumn(s, str(in, 0), str(in, 1)))),
    Proc("export_snapshot",
      "clone one retained version's exact row set to a fresh lake root",
      Seq(("path", StringType, "lake root"),
        ("dest", StringType, "destination root (must not hold a lake)"),
        ("version", LongType, "retained version to export")),
      Seq(("dest_version", LongType)),
      (s, in) => Seq(History.exportSnapshot(s, str(in, 0), str(in, 1),
        Some(in.getLong(2))))),
    Proc("tick_feed",
      "deliver the change feed's (high-water, latest] diff to out_dir",
      Seq(("path", StringType, "lake root"),
        ("out_dir", StringType, "change-feed delivery directory")),
      // (-1, -1) = nothing to deliver (the lake has no new version);
      // a delivered (or replay-converged) range reports its endpoints
      Seq(("from_version", LongType), ("to_version", LongType)),
      (s, in) => {
        val range = graft.stream.LakeChangeFeed.tick(
          s, str(in, 0), str(in, 1))
        Seq[Any](range.map(_._1).getOrElse(-1L),
          range.map(_._2).getOrElse(-1L))
      }),
    Proc("expire_feed",
      "prune delivered change-feed ranges beyond the retention tail",
      Seq(("out_dir", StringType, "change-feed delivery directory"),
        ("keep_ranges", IntegerType, "delivered ranges to retain")),
      Seq(("ranges_removed", IntegerType)),
      (s, in) => Seq(graft.stream.LakeChangeFeed.expire(
        s, str(in, 0), in.getInt(1)))),
    Proc("bootstrap_rollup",
      "bootstrap a maintained keyed-sum rollup (one full pinned scan)",
      Seq(("path", StringType, "lake root"),
        ("rollup_dir", StringType, "rollup state directory"),
        ("key_cols", StringType, "comma-separated grouping columns"),
        ("sum_cols", StringType, "comma-separated summed columns")),
      Seq(("at_version", LongType)),
      (s, in) => Seq(IncrementalRollup.bootstrap(s, str(in, 0),
        str(in, 1), csv(str(in, 2)), csv(str(in, 3))))),
    Proc("tick_rollup",
      "advance a rollup to the lake's latest version via the change feed",
      Seq(("path", StringType, "lake root"),
        ("rollup_dir", StringType, "rollup state directory"),
        ("key_cols", StringType, "comma-separated grouping columns"),
        ("sum_cols", StringType, "comma-separated summed columns")),
      // (-1, -1) = already current
      Seq(("from_version", LongType), ("to_version", LongType)),
      (s, in) => {
        val range = IncrementalRollup.tick(s, str(in, 0), str(in, 1),
          csv(str(in, 2)), csv(str(in, 3)))
        Seq[Any](range.map(_._1).getOrElse(-1L),
          range.map(_._2).getOrElse(-1L))
      })
  ).map(p => p.name -> p).toMap

  private def csv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** Resolve an identifier (`vacuum` or `system.vacuum`). */
  def load(ident: Identifier): Option[UnboundProcedure] = {
    val nsOk = ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system"))
    if (!nsOk) None else procs.get(ident.name()).map(_.unbound)
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty && !namespace.sameElements(Array("system")))
      Array.empty
    else procs.keys.toArray.sorted.map(Identifier.of(namespace, _))

  /** Echo a string result value in catalyst form (helper for tests). */
  private[sources] def utf8(s: String): UTF8String = UTF8String.fromString(s)
}
