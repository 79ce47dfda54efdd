package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset,
  SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.sources.{DataSourceRegister,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `spark.readStream.format("graft-lake").load("/lake")` — the SQL/
  * Python-only way to TAIL a manifest lake's row-level change feed as
  * a Structured Streaming source, no Scala and no delivery agent
  * required.
  *
  * The design keys the stream directly off the lake's own commit
  * sequence: OFFSETS ARE MANIFEST VERSIONS. Each micro-batch (from,
  * to] is exactly [[History.changesBetween]] — insert/delete row
  * images computed from only the files those commits touched
  * (positional O(changed-vectors) under DV commits), tagged `_change`
  * ('insert' | 'delete'). That gives exactly-once replay for free:
  * the checkpoint stores the delivered version range, a restarted
  * query re-asks for the same (from, to] window, and the diff of two
  * immutable snapshots is deterministic — no publication directory,
  * no high-water file, nothing to drift ([[graft.stream
  * .LakeChangeFeed]] remains the push-style alternative that
  * MATERIALIZES ranges for many consumers; this source computes them
  * per consumer).
  *
  * V1 `Source` by design, same reasoning as the lake's V1Scan/V1Write
  * fallbacks: `getBatch` hands back the engine's existing diff PLAN
  * as a DataFrame — the one API where that plan can be reused
  * wholesale; a DSv2 `MicroBatchStream` would have to re-implement
  * the manifest diff, DV decoding, and declared-schema projection as
  * custom partition readers for zero gain.
  *
  * Options:
  *  - `startingVersion` — baseline: `latest` (default; deliver
  *    changes from stream start on) or a version number N, INCLUSIVE:
  *    deliveries start WITH version N's changes. `1` (or any N that
  *    is the oldest retained version) is initial-snapshot-then-follow
  *    — version N's full snapshot replays as inserts (a diff against
  *    a synthetic empty manifest: N's own commit published the
  *    pre-existing files, and those rows must be reachable), then the
  *    follow continues. An N below the oldest retained version fails
  *    loudly — part of the requested history was vacuumed, and a
  *    silent net-state replay could double-deliver on a resumed
  *    checkpoint;
  *  - `startingTimestamp` — baseline by wall clock (`yyyy-MM-dd
  *    HH:mm:ss` or epoch millis): the newest version committed at or
  *    before the instant, resolved through the same commit-mtime
  *    registry `TIMESTAMP AS OF` reads ("tail everything since
  *    yesterday's snapshot"). Mutually exclusive with
  *    `startingVersion`.
  *
  * Contracts: the schema is pinned at stream start (the lake's
  * declared schema + `_change`); columns added by later evolution
  * join on restart, standard streaming behavior. Vacuum grace must
  * cover the consumer's checkpoint lag — a batch whose `from` version
  * was vacuumed fails LOUDLY (never silently re-baselines; same rule
  * as the change-feed agent). At 100 TB a micro-batch costs
  * O(files the window's commits touched), never a lake scan. */
class GraftLakeStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  /** `df.writeStream.format("graft-lake").option("checkpointLocation",
    * ck).start("/lake")` — the SQL/Python-only way to stream INTO a
    * manifest lake with the same ledger-keyed exactly-once output the
    * Scala archive path uses ([[graft.stream.Pipeline.archiveBatch]]):
    * every micro-batch stages under a batch-tagged name and publishes
    * idempotently, a [[graft.stream.Pipeline.FileBatchLedger]] inside
    * the lake records the high-water batch id, and batch ids are
    * namespaced by a checkpoint-derived stream tag — so a crash at ANY
    * point (mid-write, between publish and ledger mark, between ledger
    * and checkpoint commit) replays into exactly one copy, and a fresh
    * checkpoint dir gets a fresh tag + ledger scope instead of
    * colliding with a previous incarnation's batches. Append mode only
    * (a lake append sink has no update/complete image); partitioning
    * comes from the LAKE's own layout, so `partitionBy` here refuses. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    if (outputMode != OutputMode.Append())
      throw new IllegalArgumentException(
        s"graft-lake sink supports Append output mode only, got " +
          s"$outputMode — the lake append sink has no update/complete " +
          "image (aggregate with a watermark and append, or land the " +
          "raw stream and aggregate at read time)")
    if (partitionColumns.nonEmpty)
      throw new IllegalArgumentException(
        "graft-lake sink derives partitioning from the lake's own " +
          s"layout — drop partitionBy(${partitionColumns.mkString(",")})")
    val path = pathOf(parameters)
    // the checkpoint dir IS the batch-id namespace (ids restart at 0
    // with a fresh checkpoint), so the stream tag and the ledger scope
    // both derive from it — required, never defaulted silently
    val ckpt = parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException(
        "graft-lake sink needs an explicit checkpointLocation option: " +
          "the batch-tagged publish names and the exactly-once ledger " +
          "are scoped by it"))
    new LakeStreamSink(sqlContext.sparkSession, path, ckpt)
  }

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake needs a lake path: readStream.format(\"graft-lake\")" +
        ".load(\"/lake\")"))

  private def checkOptions(parameters: Map[String, String]): Unit =
    if (parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp"))
      throw new IllegalArgumentException(
        "graft-lake takes startingVersion OR startingTimestamp, not both")

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    schema.foreach(_ => throw new IllegalArgumentException(
      "graft-lake derives its schema from the lake's declared schema " +
        "— do not pass one"))
    checkOptions(parameters)
    (shortName(),
      LakeStreamSource.streamSchema(sqlContext.sparkSession,
        pathOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    checkOptions(parameters)
    new LakeStreamSource(sqlContext.sparkSession, pathOf(parameters),
      parameters.get("startingVersion"),
      parameters.get("startingTimestamp"))
  }
}

private[sources] object LakeStreamSource {
  /** The stream's shape: the lake's columns (declared schema when
    * committed, else the pinned read's) plus the `_change` tag. */
  def streamSchema(spark: SparkSession, path: String): StructType =
    StructType(History.readPinned(spark, path).schema.fields :+
      StructField("_change", StringType, nullable = false))
}

private[sources] class LakeStreamSource(spark: SparkSession, path: String,
    startingVersion: Option[String],
    startingTimestamp: Option[String] = None) extends Source {

  private val fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Baseline version, resolved ONCE at source creation: deliveries
    * start from the first commit after it. A numeric `startingVersion`
    * N stores N−1 here — the option is INCLUSIVE of version N (its
    * snapshot/changes must be deliverable), while the offset protocol
    * is exclusive-of-from. (A restarted query never re-resolves this —
    * its checkpointed offsets take precedence via `getBatch`'s
    * `start`.) */
  private val baseline: Long = (startingVersion, startingTimestamp) match {
    case (None, None) => latestVersion()
    case (Some("latest"), _) => latestVersion()
    case (Some(v), _) =>
      val n = v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be 'latest' or a version number, got '$v'"))
      if (n < 1L) throw new IllegalArgumentException(
        s"startingVersion must be >= 1 (manifests start at v1), got $n")
      n - 1L
    case (None, Some(t)) =>
      // epoch millis or a local-session timestamp string — the same
      // commit-mtime resolution `TIMESTAMP AS OF` uses
      val tsMs = t.toLongOption.getOrElse {
        scala.util.Try(java.sql.Timestamp.valueOf(t).getTime).getOrElse(
          throw new IllegalArgumentException(
            "startingTimestamp must be epoch millis or " +
              s"'yyyy-MM-dd HH:mm:ss', got '$t'"))
      }
      val candidates = FileManifest.versions(fs, path).filter(v =>
        FileManifest.versionMtime(fs, path, v).exists(_ <= tsMs))
      candidates.sorted.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no version of $path existed at startingTimestamp $t " +
            "(or older versions were vacuumed)"))
  }

  private def latestVersion(): Long =
    FileManifest.latestVersion(fs, path).getOrElse(
      throw new IllegalStateException(
        s"graft-lake needs a manifest-mode lake (enableManifests): $path"))

  override val schema: StructType =
    LakeStreamSource.streamSchema(spark, path)

  override def getOffset: Option[Offset] =
    Some(LongOffset(math.max(latestVersion(), baseline)))

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(
      s"graft-lake cannot read offset $other")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(baseline)
    val to = versionOf(end)
    val batch =
      if (from >= to)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else {
        val oldest = FileManifest.versions(fs, path).minOption
          .getOrElse(throw new IllegalStateException(
            s"graft-lake: no manifest versions retained at $path"))
        if (from >= oldest) History.changesBetween(spark, path, from, to)
        else if (from == 0L && oldest == 1L) {
          // diff from a SYNTHETIC EMPTY manifest: from = 0 names the
          // (never-published) version before v1, which is EXACTLY the
          // empty lake — so the window opens with v1's full snapshot
          // replayed as inserts (this is how startingVersion=1
          // bootstraps the initial snapshot; v1's own commit published
          // the pre-existing files, so its rows live nowhere else),
          // then the regular file-granular diff covers the rest. Only
          // from=0 qualifies: any retained-then-vacuumed `from` >= 1
          // means deliveries may already have happened against it, and
          // replaying a net snapshot could double-deliver — that case
          // fails loudly below, same rule as time travel.
          val snap = History.readPinned(spark, path, 1L,
            eraSchema = false)
            .withColumn("_change",
              org.apache.spark.sql.functions.lit("insert"))
          if (to == 1L) snap
          else snap.unionByName(
            History.changesBetween(spark, path, 1L, to))
        } else throw new IllegalStateException(
          s"graft-lake batch ($from, $to] at $path: version $from is " +
            s"not retained (oldest retained: $oldest) — the window was " +
            "vacuumed past the checkpoint; replaying the net state " +
            "could double-deliver, so re-baseline explicitly with a " +
            "fresh checkpoint")
      }
    // pin the stream's start-time shape: a column added by evolution
    // mid-stream is dropped until restart (standard streaming
    // semantics); a renamed/lost column fails resolution loudly
    val aligned = batch.select(
      schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    // Source contract: getBatch must return a STREAMING frame — wrap
    // the engine plan's rows ([[DatasetBridge.streamingDf]])
    DatasetBridge.streamingDf(spark, aligned.queryExecution.toRdd, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftLakeStream($path)"
}

/** The `graft-lake` streaming SINK (see
  * [[GraftLakeStreamProvider.createSink]]): a thin V1 `Sink` over the
  * engine's validated exactly-once append. V1 by design, mirroring the
  * source: `addBatch` re-wraps the incremental plan's rows as a batch
  * frame ([[DatasetBridge.internalDf]] — the V1 sink contract hands a
  * streaming-planned DataFrame that must not be re-planned as-is) and
  * runs the SAME stage/publish/ledger discipline the Scala archive
  * sink uses ([[graft.stream.Pipeline.archiveBatch]]), through the
  * same primitives:
  *
  *  1. a batch at-or-below the ledger's high-water mark is a restart
  *     replay — skipped whole;
  *  2. a batch whose tagged files the manifest already references
  *     crashed between manifest add and ledger mark — the replay must
  *     NOT re-publish ([[LakeCommit.batchCommitted]]: re-publishing
  *     would sweep committed files from under pinned readers), it
  *     falls through to the ledger mark;
  *  3. otherwise [[History.append]] — declared-schema validation,
  *     staged CHECK constraints, batch-keyed idempotent publish, one
  *     manifest flip — so a crash MID-append replays into the same
  *     batch-tagged names and converges to one copy.
  *
  * Requires a MANIFEST lake (CREATE TABLE / enableManifests first):
  * the already-committed replay guard and the atomic visibility flip
  * both live in the manifest — a bare-directory sink would be
  * at-least-once across one crash window, which this surface refuses
  * to ship silently. */
private[sources] class LakeStreamSink(spark: SparkSession, path: String,
    checkpointDir: String) extends Sink {

  private val streamTag = graft.stream.Pipeline.streamTagOf(checkpointDir)
  // ledger dir scoped BY STREAM TAG inside the lake: the ledger is
  // keyed by bare batch id, so a fresh checkpoint (fresh id namespace)
  // must get a fresh ledger scope — deriving both from the checkpoint
  // keeps replay detection exact across incarnations
  private val ledger =
    new graft.stream.Pipeline.FileBatchLedger(s"$path/_ledger/$streamTag")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (ledger.lastCommitted >= batchId) return // restart replay
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!FileManifest.enabled(fs, path))
      throw new IllegalStateException(
        s"graft-lake sink needs a manifest-mode lake at $path — " +
          "CREATE TABLE lake.`" + path + "` (…) first (or " +
          "History.enableManifests): the exactly-once replay guard " +
          "and the atomic batch flip live in the manifest")
    val key = s"$streamTag-$batchId"
    if (!LakeCommit.batchCommitted(fs, path, key)) {
      val batch = DatasetBridge.internalDf(spark,
        data.queryExecution.toRdd, data.schema)
      History.append(spark, path, batch, key): Unit
    }
    ledger.markCommitted(batchId)
  }

  override def toString: String = s"GraftLakeSink($path)"
}
