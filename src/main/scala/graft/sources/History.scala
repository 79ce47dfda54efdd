package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date/type-parameterized history access (S4–S8 semantics, SURVEY.md §2.1):
  * the reference pushes `startDate`/`types` filters into URL params
  * (`transis_consumer.py:157-225`); at rest the same pushdown is achieved by
  * partition layout + partition pruning and parquet predicate pushdown.
  *
  * 100 TB design: history is laid out `region=<r>/dt=<yyyy-MM-dd>/…`, so a
  * date- or region-bounded read touches only matching directories (static
  * partition pruning; dynamic pruning kicks in for join-driven predicates).
  * Within files, min/max row-group stats serve the residual predicates.
  */
object History {

  /** Land canonical records partitioned by region and collection date.
    *
    * The repartition on the partition columns is the small-files guard:
    * without it every task holding rows of a (region, dt) writes its own
    * file into that directory — tasks × live partitions files per batch,
    * the classic lake-rot shape at scale. Hashing rows to their output
    * directory first gives ~one file per directory; `maxRecordsPerFile`
    * re-splits a pathologically hot partition so a single writer task
    * can't produce one monster file either.
    *
    * @param mode "overwrite" for batch loads; "append" for the streaming
    *   archive path (each foreachBatch lands its micro-batch into the
    *   same layout — exactly-once when guarded by the Pipeline
    *   BatchLedger). */
  def writePartitioned(records: DataFrame, path: String,
                       mode: String = "overwrite"): Unit =
    records
      .withColumn("dt", date_format(
        timestamp_seconds(col("collectionendtimestamp_plus_3_mins")),
        "yyyy-MM-dd"))
      .repartition(col("region"), col("dt"))
      // sorted within files → tight parquet row-group min/max stats on
      // (siteId, ts), so site- or time-bounded residual predicates skip
      // row groups inside the pruned partitions too
      .sortWithinPartitions(col("siteId"),
        col("collectionendtimestamp_plus_3_mins"))
      .write.mode(mode)
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("region", "dt")
      .parquet(path)

  /** Latest-wins compaction of a lake slice — the "current state"
    * materialization (the same shape the VMS reader computes on read,
    * done once at rest). Keeps the newest record per key within every
    * partition the predicate touches and rewrites ONLY those partitions,
    * so compacting one day of one region never rewrites (or even lists)
    * the rest of a 100 TB lake. The window sort is per (partition, key)
    * — bounded by a partition's update count, never global.
    *
    * The predicate may reference ONLY the partition columns (region, dt):
    * a row-level predicate (say `siteId = 8`) would select a subset of a
    * partition's rows and then replace the whole partition with that
    * subset — silently deleting every other row. Enforced, not just
    * documented.
    *
    * Commit protocol (a crash leaves every partition OLD or NEW, never
    * neither — the manifest-commit a table format would provide, done
    * directly on the directory layout):
    *
    *  1. stage the compacted partitions under `_staging/compact` (reads
    *     the live dirs, writes elsewhere — the job never deletes its own
    *     input, so no eager materialization is needed);
    *  2. atomically publish a manifest (write-then-rename) listing the
    *     partitions to swap — the manifest IS the commit point: absent,
    *     the lake is untouched and stale staging is garbage; present,
    *     the swap is in flight and [[recoverCompaction]] can finish it
    *     from any crash state;
    *  3. per partition: rename live aside (`_old-dt=…`, hidden from
    *     readers), promote staged, drop the aside — directory renames,
    *     each atomic on HDFS/local;
    *  4. drop the manifest, then the staging root.
    *
    * [[compactLatest]] auto-runs recovery first, so a re-run after any
    * crash completes the interrupted compaction before starting the new
    * one.
    *
    * '''Single writer per lake.''' Compaction assumes no OTHER writer
    * mutates the lake between the staging read and the swap. The one
    * sequenced-writer case is still protected: the manifest records, per
    * partition, the exact data files the staging read consumed, and the
    * swap merges any file that appeared afterwards (e.g. the streaming
    * archive's batch-tagged publishes) into the promoted directory
    * instead of deleting it with the aside — committed batch rows are
    * never dropped even when a compaction manifest sat unrecovered
    * across archive batches. What is NOT supported is a writer racing
    * the swap's renames themselves (two processes mutating one partition
    * dir concurrently): run compaction from the archive's driver between
    * batches, or pause the archive — one writer at a time per lake.
    *
    * @param keyCols identity columns within a partition (e.g. siteId)
    * @param tsCol   recency column; ties keep the lexicographically
    *                largest remaining row deterministically */
  def compactLatest(spark: SparkSession, path: String,
                    keyCols: Seq[String], tsCol: String,
                    predicate: org.apache.spark.sql.Column): Unit = {
    // finish any interrupted swap BEFORE the read below lists files —
    // recovery renames directories out from under an already-planned scan
    recoverCompaction(spark, path): Unit
    val conf = spark.sparkContext.hadoopConfiguration
    val rawStage = new org.apache.hadoop.fs.Path(compactStagingDir(path))
    val fs = rawStage.getFileSystem(conf)
    val stage = fs.makeQualified(rawStage)
    fs.delete(stage, true): Unit // pre-manifest leftovers are garbage
    // Resolve the predicate to its partition DIRECTORIES first (evaluate
    // it against the region=/dt= directory values on the driver), and
    // build the slice read from ONLY those dirs: schema inference —
    // including the mergeSchema pass below — runs at read construction,
    // BEFORE Catalyst partition pruning, so a root-anchored read would
    // list the whole lake and merge every footer in it to compact one
    // partition. Values are taken raw from the dir names (region codes
    // and ISO dates are never path-escaped); `dt` is typed DATE exactly
    // as Spark's partition inference types it, so date predicates with
    // non-canonical literals (e.g. dt > '2019-6-15') keep their typed
    // semantics instead of silently degrading to string comparison.
    val qRoot = fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    val partVals = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(qRoot, "*/*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(s => qRoot.toUri.relativize(s.getPath.toUri).getPath)
      .flatMap(_.split('/') match {
        case Array(r, d) if r.startsWith("region=") && d.startsWith("dt=") =>
          Some((r.stripPrefix("region="), d.stripPrefix("dt="), s"$r/$d"))
        case _ => None
      }).toSeq
    val matching = {
      import spark.implicits._
      // dt is typed DATE only when EVERY value is canonical ISO (the
      // consensus rule partition inference applies); otherwise it stays
      // a raw string, so non-ISO layouts keep exact string matching and
      // nothing ever nulls out silently (or throws under ANSI to_date).
      // The evaluation frame carries ONLY the two partition columns —
      // analyzing the predicate against it IS the "partition columns
      // only" validation (a row-level or internal-column reference
      // fails right here, before anything is staged), and the matched
      // (region, dt) values map back to their directories on the driver.
      val allIso = partVals.forall(_._2.matches("\\d{4}-\\d{2}-\\d{2}"))
      val vals =
        if (allIso)
          partVals.map(v => (v._1, java.sql.Date.valueOf(v._2)))
            .toDF("region", "dt")
        else partVals.map(v => (v._1, v._2)).toDF("region", "dt")
      val filtered = try vals.filter(predicate)
        .select(col("region"), col("dt").cast("string")).collect()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            "compactLatest predicate may only reference partition " +
              "columns (region, dt) — a row-level predicate would " +
              s"overwrite whole partitions with a row subset " +
              s"(analysis said: ${e.getMessage})")
      }
      val byVals = partVals.map(v => (v._1, v._2) -> v._3).toMap
      filtered.map(r => byVals((r.getString(0), r.getString(1))))
        .sorted.toSeq // partition-count-sized
    }
    if (matching.isEmpty) return // zero partitions match: nothing to do
    // mergeSchema: a compaction REWRITES data, so it must see the union
    // of every file's columns in the slice — the default single-footer
    // inference would silently drop a record column added to the lake
    // mid-life from every rewritten row (reads merely miss it; a
    // rewrite loses it). The merge pass is bounded to the matched dirs.
    val slice = spark.read.option("mergeSchema", "true")
      .option("basePath", qRoot.toString)
      .parquet(matching.map(rel =>
        new org.apache.hadoop.fs.Path(qRoot, rel).toString): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((Seq("region", "dt") ++ keyCols).map(col): _*)
      .orderBy(col(tsCol).desc)
    slice.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .repartition(col("region"), col("dt"))
      .sortWithinPartitions(col("siteId"), col(tsCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("region", "dt")
      .parquet(compactStagingDir(path))
    // the staged partition set = the directories to swap; globStatus
    // returns null (not empty) for a nonexistent glob parent on some
    // filesystems — e.g. a predicate matching zero partitions, where the
    // empty write creates no directories
    val parts = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(stage, "*/*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(s => stage.toUri.relativize(s.getPath.toUri).getPath)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .sorted.toSeq
    // staging-read snapshot, per partition: the data files `slice`'s file
    // index actually consumed. At swap time, any data file in a live dir
    // that is NOT in its snapshot arrived after the read (a sequenced
    // archive batch) — its rows are absent from the staged output, so the
    // swap must merge it into the promoted dir, not drop it with the aside.
    val rootUri = fs.makeQualified(new org.apache.hadoop.fs.Path(path)).toUri
    val snapshot: Map[String, Seq[String]] = slice.inputFiles.toSeq
      .map { f =>
        val rel = rootUri.relativize(
          fs.makeQualified(new org.apache.hadoop.fs.Path(f)).toUri).getPath
        val cut = rel.lastIndexOf('/')
        (rel.take(math.max(cut, 0)), rel.drop(cut + 1))
      }
      .filterNot { case (dir, _) => dir.startsWith("/") } // outside root
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val manifest = new org.apache.hadoop.fs.Path(compactManifestPath(path))
    val tmp = new org.apache.hadoop.fs.Path(manifest.getParent,
      manifest.getName + ".tmp")
    val lines = parts.map(rel =>
      rel + "\t" + snapshot.getOrElse(rel, Seq.empty).mkString(","))
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(s"manifest publish failed: $manifest")
    swapStaged(fs, path, parts.map(rel =>
      rel -> snapshot.getOrElse(rel, Seq.empty).toSet))
    fs.delete(manifest, false): Unit
    fs.delete(stage, true): Unit
  }

  def compactStagingDir(path: String): String = s"$path/_staging/compact"
  def compactManifestPath(path: String): String =
    s"$path/_staging/compact.manifest"

  /** Parse one manifest line: `rel[TAB]file1,file2,…` — the partition to
    * swap plus the staging-read snapshot of its data files. Legacy lines
    * without the snapshot field parse to an empty snapshot (no merge —
    * the pre-round-6 wholesale-delete behavior). */
  private def parseManifestLine(line: String): (String, Set[String]) =
    line.split('\t') match {
      case Array(rel) => (rel, Set.empty[String])
      case Array(rel, files) =>
        (rel, files.split(',').filter(_.nonEmpty).toSet)
      case other => (other.head, Set.empty[String])
    }

  /** Finish (roll FORWARD) an interrupted [[compactLatest]] swap. No-op
    * without a manifest — pre-manifest crashes left the lake untouched.
    * Returns true when a manifest was found and completed. Safe to run
    * any number of times, from any crash point, including crashes of a
    * previous recovery. */
  def recoverCompaction(spark: SparkSession, path: String): Boolean = {
    val manifest = new org.apache.hadoop.fs.Path(compactManifestPath(path))
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) return false
    val in = fs.open(manifest)
    val entries = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map(parseManifestLine).toList
    finally in.close()
    swapStaged(fs, path, entries)
    fs.delete(manifest, false): Unit
    fs.delete(new org.apache.hadoop.fs.Path(compactStagingDir(path)),
      true): Unit
    true
  }

  /** Idempotent per-partition directory swap. Reachable states for a
    * partition (S=staged, L=live, A=aside) and the action taken:
    * S∧L∧¬A → full swap; S∧¬L∧A → promote staged, drop aside;
    * ¬S∧L∧A → drop aside; ¬S∧L∧¬A → done. The aside dir is
    * underscore-prefixed, so a reader racing the swap never double-counts
    * a partition; between the two renames the data lives in A and S.
    *
    * Before an aside is dropped, data files NOT in the partition's
    * staging-read snapshot are merged into the promoted dir: they were
    * published after the compaction read (a sequenced archive batch), so
    * their rows are absent from the staged output and deleting them
    * would silently drop committed rows (see the single-writer note on
    * [[compactLatest]]). A merge collision (same file name already
    * promoted) means a replayed batch re-published it — the aside copy
    * is the duplicate and is dropped. Partitions swap in parallel on a
    * bounded pool: each is independent and every step idempotent, so
    * parallelism changes neither the state machine nor recovery. */
  private def swapStaged(fs: org.apache.hadoop.fs.FileSystem, path: String,
                         entries: Seq[(String, Set[String])]): Unit =
    LakeCommit.foreachPar(entries) { case (rel, snapshot) =>
      val live = new org.apache.hadoop.fs.Path(path, rel)
      val staged = new org.apache.hadoop.fs.Path(compactStagingDir(path), rel)
      // the aside name must carry NO '=': Spark's listing filter skips
      // underscore-prefixed names ONLY when they contain no '=' (Hive
      // allows `_col=v` partition dirs), so an aside named
      // `_old-dt=2019-10-03` would surface in partition inference and
      // fail every concurrent plain read with conflicting partition
      // columns — found by the readSnapshot spec, fixed by `=` → `~`
      val aside = new org.apache.hadoop.fs.Path(live.getParent,
        "_old-" + live.getName.replace('=', '~'))
      if (fs.exists(staged)) {
        if (fs.exists(live) && fs.exists(aside))
          fs.delete(aside, true): Unit // stale aside from an older crash
        if (fs.exists(live) && !fs.rename(live, aside))
          throw new java.io.IOException(s"aside rename failed: $live")
        if (!fs.rename(staged, live))
          throw new java.io.IOException(s"promote failed: $staged -> $live")
      }
      if (fs.exists(aside)) {
        if (snapshot.nonEmpty) fs.listStatus(aside).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".") && !snapshot(n)) {
            val dest = new org.apache.hadoop.fs.Path(live, n)
            if (fs.exists(dest)) fs.delete(st.getPath, false): Unit
            else if (!fs.rename(st.getPath, dest))
              throw new java.io.IOException(
                s"late-file merge failed: ${st.getPath} -> $dest")
          }
        }
        fs.delete(aside, true): Unit
      }
    }

  /** Swap-tolerant lake read: resolves the partition listing against the
    * compaction manifest so a read planned WHILE a compaction swap is in
    * flight sees every partition in its committed state — never the
    * absent-partition window between the swap's two renames that a plain
    * `spark.read.parquet(path)` can hit.
    *
    * Resolution per partition: not in the manifest → live dir (the swap
    * never touches it). In the manifest → the manifest is the commit
    * point, so the NEW state is the truth: pin to the staged dir while it
    * exists (pre-swap and mid-swap states), else the promoted live dir.
    * Every reachable swap state (S∧L, S∧A, L∧A, L) resolves to exactly
    * one complete copy.
    *
    * Isolation is at LISTING time: the returned frame pins concrete
    * directories, so a swap that completes while a long scan is still
    * running can move files under it (retry the read; full MVCC reads
    * need a table format). Without a manifest this is exactly
    * `spark.read.parquet(path)`. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame = {
    val manifest = new org.apache.hadoop.fs.Path(compactManifestPath(path))
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) return spark.read.parquet(path)
    val in = fs.open(manifest)
    val swapped = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map(parseManifestLine(_)._1).toSet
    finally in.close()
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    val stageRoot = fs.makeQualified(
      new org.apache.hadoop.fs.Path(compactStagingDir(path)))
    val liveParts = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, "*/*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(s => root.toUri.relativize(s.getPath.toUri).getPath)
      .filterNot(_.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith(".")))
      .toSeq
    val (stagedPins, promotedPins) = swapped.toSeq.sorted.partition(rel =>
      fs.exists(new org.apache.hadoop.fs.Path(stageRoot, rel)))
    val livePins = (liveParts.filterNot(swapped) ++
        promotedPins.filter(rel =>
          fs.exists(new org.apache.hadoop.fs.Path(root, rel))))
      .sorted.map(rel => new org.apache.hadoop.fs.Path(root, rel).toString)
    val sides = Seq(
      Option.when(livePins.nonEmpty)(
        spark.read.option("basePath", root.toString)
          .parquet(livePins: _*)),
      Option.when(stagedPins.nonEmpty)(
        spark.read.option("basePath", stageRoot.toString)
          .parquet(stagedPins.map(rel =>
            new org.apache.hadoop.fs.Path(stageRoot, rel).toString): _*))
    ).flatten
    sides.reduceOption(_.unionByName(_)).getOrElse(spark.emptyDataFrame)
  }

  /** Lake file-layout stats: one row per partition directory with its
    * data-file count, total bytes, and smallest/largest file — the
    * small-files monitor that tells an operator when a partition needs
    * compaction (pairs with `Pipeline.archive(compactEvery = …)`; a
    * partition whose `n_files` grows with batch count while
    * `max_bytes` stays small is accumulating micro-batch files).
    *
    * Pure driver-side metadata: partition dirs are listed on the bounded
    * rename pool (one listing RTT per partition, ~ceil(P/16) rounds on an
    * object store), no data file is opened, and the result is one row
    * per PARTITION — thousands of rows for a 100 TB lake, never row- or
    * file-proportional. */
  def lakeStats(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qRoot = fs.makeQualified(root)
    val parts = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(qRoot, "*/*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(s => qRoot.toUri.relativize(s.getPath.toUri).getPath)
      .filterNot(_.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith(".")))
      .sorted.toSeq
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, Long)]()
    LakeCommit.foreachPar(parts) { rel =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(qRoot, rel))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      if (files.nonEmpty) {
        val sizes = files.map(_.getLen)
        rows.add((rel, files.length.toLong, sizes.sum,
          sizes.min, sizes.max)): Unit
      }
    }
    import scala.jdk.CollectionConverters._
    val spark2 = spark
    import spark2.implicits._
    rows.asScala.toSeq.sortBy(_._1)
      .toDF("partition", "n_files", "total_bytes", "min_bytes", "max_bytes")
  }

  /** Schema-evolution read: merge parquet footers across the whole lake
    * so columns added to the record schema mid-life appear in the scan
    * (null-filled for partitions written before the change). The default
    * `spark.read.parquet` infers from one footer and would silently omit
    * late columns; compaction gradually converges old partitions onto
    * the unioned schema (compactLatest rewrites with mergeSchema). */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** S4: `get_data_from` — date-bounded scan; the `dt >= …` predicate is a
    * partition filter (no data files outside the range are opened). */
  def readFrom(spark: SparkSession, path: String, fromDate: String): DataFrame =
    spark.read.parquet(path).filter(col("dt") >= fromDate)

  /** S5-flavored: region + date bounded scan (both partition columns). */
  def readRegionFrom(spark: SparkSession, path: String, region: String,
                     fromDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("region") === region && col("dt") >= fromDate)
}
