package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized rollup over a manifest lake —
  * the "don't rescan 100 TB to refresh a dashboard aggregate" piece.
  *
  * State is a per-key (count, sum) table materialized at a lake version:
  * `rollupDir/state-v<version>/` (parquet). [[bootstrap]] computes it
  * once with a full pinned scan; every subsequent [[tick]] advances it
  * to the lake's latest version by applying ONLY the row-level change
  * feed of the commits in between ([[History.changesBetween]] — which
  * diffs just the files those commits touched, O(rewritten bytes),
  * never O(lake)): inserts add (+1, +value), deletes subtract, and a
  * copy-on-write rewrite is a delete+insert pair whose untouched rows
  * cancel. So maintenance cost follows the CHANGE RATE — an appended
  * batch costs one scan of the batch, a takedown costs the rewritten
  * files — while readers always get a tiny pre-aggregated table.
  *
  * Only group-invertible aggregates qualify: count and sum form an
  * abelian group under row insert/delete, so the delta applies without
  * revisiting old data. min/max do NOT (retracting the current min
  * needs the group's full multiset) — maintaining those incrementally
  * requires per-group recompute of affected groups, which is a
  * different machine (and at 100 TB usually a stats-sidecar question,
  * see [[FileStats]]). Averages derive as sum/count at read time.
  *
  * Publish protocol (same recipe as [[graft.stream.LakeChangeFeed]]):
  * stage under a nonce'd temp dir, rename to the versioned final name;
  * a replayed tick that finds the final dir already present discards
  * its stage and converges — safe under crash-replay at any point.
  * Keys whose count reaches zero are dropped from the state (a key's
  * absence and a zero count are indistinguishable to readers, and the
  * state table never accretes dead keys). Old state dirs beyond
  * [[keepStates]] are pruned on publish — each is a complete rollup,
  * so only the latest matters for liveness; the tail exists to let a
  * concurrent reader finish on the version it already resolved.
  */
object IncrementalRollup {

  private val StateDir = "state-v(\\d+)".r
  private[graft] val keepStates = 3

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stateVersions(fs: FileSystem, rollupDir: String): Seq[Long] = {
    val root = new Path(rollupDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case StateDir(v) => Some(v.toLong)
        case _ => None
      }
      case _ => None
    }.flatten.sorted
  }

  /** The lake version the rollup currently reflects (None before
    * [[bootstrap]]). */
  def currentVersion(spark: SparkSession, rollupDir: String): Option[Long] =
    stateVersions(fsOf(spark, rollupDir), rollupDir).lastOption

  private def statePath(rollupDir: String, v: Long): Path =
    new Path(rollupDir, s"state-v$v")

  /** The state/delta schemas derive names from the user's columns
    * (n_rows, sum_<c>, hll_<c>, d_rows, d_<c>, dh_<c>) — a colliding
    * user name would make the merge's column references ambiguous, so
    * fail loudly. */
  private def validateCols(keyCols: Seq[String], sumCols: Seq[String],
                           distinctCols: Seq[String]): Unit = {
    val all = keyCols ++ sumCols ++ distinctCols
    require(all.distinct.size == all.size,
      s"rollup columns must be distinct: ${all.mkString(", ")}")
    val reserved = Set("n_rows", "d_rows") ++
      sumCols.flatMap(c => Seq("sum_" + c, "d_" + c)) ++
      distinctCols.flatMap(c => Seq("hll_" + c, "dh_" + c))
    val clash = all.filter(reserved)
    require(clash.isEmpty,
      s"rollup column name(s) collide with derived state columns: " +
        s"${clash.mkString(", ")} (reserved: n_rows, d_rows, sum_<c>, " +
        "d_<c>, hll_<c>, dh_<c>)")
  }

  private def aggregate(rows: DataFrame, keyCols: Seq[String],
                        sumCols: Seq[String],
                        distinctCols: Seq[String]): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c).cast("long")).as("sum_" + c)) ++
          distinctCols.map(c => graft.functions.HyperLogLog
            .hll_sketch(col(c)).as("hll_" + c)): _*)

  /** Publish `state` as the rollup at lake version `v` (idempotent:
    * loses gracefully to an already-published identical version). */
  private def publish(spark: SparkSession, rollupDir: String, v: Long,
                      state: DataFrame): Unit = {
    val fs = fsOf(spark, rollupDir)
    val dest = statePath(rollupDir, v)
    // deterministic stage name (the LakeChangeFeed recipe): a crashed
    // prior attempt's leftover is overwritten by the retry instead of
    // leaking one orphaned full state copy per crash
    val stage = new Path(rollupDir, s"_staging/state-v$v")
    fs.delete(stage, true): Unit
    state.write.mode("overwrite").parquet(stage.toString)
    fs.mkdirs(dest.getParent): Unit
    if (fs.exists(dest)) { // replayed tick: the other attempt won — converge
      fs.delete(stage, true): Unit
    } else if (!fs.rename(stage, dest))
      throw new java.io.IOException(s"rollup publish failed: $dest")
    // prune states beyond the retention tail (each state is complete)
    stateVersions(fs, rollupDir).dropRight(keepStates)
      .foreach(old => fs.delete(statePath(rollupDir, old), true): Unit)
  }

  /** One full pinned scan at `atVersion` (default: the lake's latest) —
    * the only O(lake) step in the rollup's lifetime. Idempotent: a
    * rollup that already has any state is left untouched. */
  def bootstrap(spark: SparkSession, lakePath: String, rollupDir: String,
                keyCols: Seq[String], sumCols: Seq[String],
                atVersion: Option[Long] = None,
                distinctCols: Seq[String] = Nil): Long = {
    validateCols(keyCols, sumCols, distinctCols)
    val existing = currentVersion(spark, rollupDir)
    existing.getOrElse {
      val v = atVersion.getOrElse(History.versions(spark, lakePath).last)
      publish(spark, rollupDir, v,
        aggregate(History.readPinned(spark, lakePath, v,
          eraSchema = false), keyCols, sumCols,
          distinctCols))
      v
    }
  }

  def bootstrap(spark: SparkSession, lakePath: String, rollupDir: String,
                keyCols: Seq[String], sumCol: String): Long =
    bootstrap(spark, lakePath, rollupDir, keyCols, Seq(sumCol), None)

  def bootstrap(spark: SparkSession, lakePath: String, rollupDir: String,
                keyCols: Seq[String], sumCol: String,
                atVersion: Option[Long]): Long =
    bootstrap(spark, lakePath, rollupDir, keyCols, Seq(sumCol), atVersion)

  /** Advance the rollup to the lake's latest version by applying the
    * change feed of (current, latest]. No-op (None) when already
    * current; otherwise returns the (from, to] range applied. The
    * keyCols/sumCols MUST match the bootstrap's (the state schema is
    * the contract; a mismatch fails loudly on the join). */
  def tick(spark: SparkSession, lakePath: String, rollupDir: String,
           keyCols: Seq[String], sumCol: String): Option[(Long, Long)] =
    tick(spark, lakePath, rollupDir, keyCols, Seq(sumCol))

  def tick(spark: SparkSession, lakePath: String, rollupDir: String,
           keyCols: Seq[String],
           sumCols: Seq[String],
           distinctCols: Seq[String] = Nil): Option[(Long, Long)] = {
    validateCols(keyCols, sumCols, distinctCols)
    val from = currentVersion(spark, rollupDir).getOrElse(
      throw new IllegalStateException(
        s"rollup at $rollupDir has no state — run bootstrap first"))
    val latest = History.versions(spark, lakePath).last
    if (latest <= from) None
    else {
      val sumNames = sumCols.map("sum_" + _)
      val changesRaw = History.changesBetween(spark, lakePath, from, latest)
      // the diff is the tick's dominant cost — when the HLL delete
      // probe needs a second look at it, persist ONE materialization
      // across probe + delta instead of recomputing the row-hash diff
      val changes =
        if (distinctCols.nonEmpty) changesRaw.persist() else changesRaw
      try {
      // HLL measures are union-only: a sketch cannot retract a member,
      // so a range containing ANY delete/rewrite would silently
      // overcount forever. Fail loudly; recovery is a re-bootstrap
      // (one full scan) — the honest contract for approx-distinct on
      // anything but an append-only lake.
      if (distinctCols.nonEmpty &&
          changes.filter(col("_change") === "delete").limit(1).count() > 0)
        throw new IllegalStateException(
          s"rollup at $rollupDir maintains hll measures " +
            s"(${distinctCols.mkString(", ")}) but commits " +
            s"($from, $latest] contain deletes — HLL cannot retract; " +
            "re-bootstrap the rollup at the current version")
      val sign = when(col("_change") === "insert", 1L).otherwise(-1L)
      val delta = changes
        .groupBy(keyCols.map(col): _*)
        .agg(sum(sign).as("d_rows"),
          (sumCols.map(c =>
            sum(sign * col(c).cast("long")).as("d_" + c)) ++
            distinctCols.map(c => graft.functions.HyperLogLog
              .hll_sketch(col(c)).as("dh_" + c))): _*)
      mergeAndPublish(spark, rollupDir, from, latest, delta,
        keyCols, sumCols, distinctCols)
      Some((from, latest))
      } finally {
        if (distinctCols.nonEmpty) changes.unpersist(): Unit
      }
    }
  }

  /** Merge a signed delta into the state at `from` and publish it as
    * the state at `latest` (shared by [[tick]] and [[tickDerived]]). */
  private def mergeAndPublish(spark: SparkSession, rollupDir: String,
                              from: Long, latest: Long, delta: DataFrame,
                              keyCols: Seq[String], sumCols: Seq[String],
                              distinctCols: Seq[String]): Unit = {
    val sumNames = sumCols.map("sum_" + _)
    // the merge base is pinned to the state AT `from` — re-resolving
    // currentVersion here would race a concurrent/replayed tick that
    // published a newer state between our two reads and double-apply
    // the overlap (permanently, since later ticks build on the result)
    val prev = spark.read.parquet(statePath(rollupDir, from).toString)
    // null-SAFE key join: a null group key is a legal groupBy output
    // on both sides, and an equi-join would never match it — the one
    // group would fork into two state rows (one never retractable)
    val joinCond = keyCols.map(k => prev(k) <=> delta(k)).reduce(_ && _)
    val merged = prev.join(delta, joinCond, "full_outer")
      .select(keyCols.map(k => coalesce(prev(k), delta(k)).as(k)) ++
        Seq((coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_rows"), lit(0L))).as("n_rows")) ++
        sumCols.zip(sumNames).map { case (c, sn) =>
          (coalesce(col(sn), lit(0L)) +
            coalesce(col("d_" + c), lit(0L))).as(sn)
        } ++
        distinctCols.map { c =>
          val sn = "hll_" + c
          // union when both sides exist, else whichever is present
          coalesce(graft.functions.HyperLogLog
            .hll_union(col(sn), col("dh_" + c)),
            col(sn), col("dh_" + c)).as(sn)
        }: _*)
      .filter(col("n_rows") > 0)
    publish(spark, rollupDir, latest, merged)
  }

  /** DERIVED rollup: maintain keyed COUNTS over a row-local transform
    * of the lake — each corpus row maps (independently of every other
    * row) to zero or more derived rows, and the state is the per-key
    * count of derived rows. The transform's row-locality is what makes
    * the rollup invertible: a deleted corpus row retracts exactly the
    * derived rows it contributed, so the change feed advances the
    * state without revisiting old data — the machinery behind
    * MAINTAINED n-gram / language-model count tables ([[graft.ext
    * .LmRollup]]): a takedown retracts its documents' grams, an append
    * adds its own, and the model table never rescans the corpus.
    *
    * `derive` MUST be deterministic and row-local (explode/filter/
    * project only — no joins, windows, or aggregates across corpus
    * rows), and must emit exactly `keyCols`. Violating row-locality
    * breaks retraction silently; keep transforms to per-row
    * expressions. */
  def bootstrapDerived(spark: SparkSession, lakePath: String,
                       rollupDir: String, keyCols: Seq[String],
                       derive: DataFrame => DataFrame,
                       atVersion: Option[Long] = None): Long = {
    validateCols(keyCols, Nil, Nil)
    currentVersion(spark, rollupDir).getOrElse {
      val v = atVersion.getOrElse(History.versions(spark, lakePath).last)
      publish(spark, rollupDir, v,
        aggregate(derive(History.readPinned(spark, lakePath, v,
          eraSchema = false)),
          keyCols, Nil, Nil))
      v
    }
  }

  /** Advance a derived rollup to the lake's latest version: the change
    * feed's inserts and deletes each pass through `derive` (which must
    * match the bootstrap's), then merge as a signed count delta. */
  def tickDerived(spark: SparkSession, lakePath: String,
                  rollupDir: String, keyCols: Seq[String],
                  derive: DataFrame => DataFrame): Option[(Long, Long)] = {
    validateCols(keyCols, Nil, Nil)
    val from = currentVersion(spark, rollupDir).getOrElse(
      throw new IllegalStateException(
        s"rollup at $rollupDir has no state — run bootstrapDerived first"))
    val latest = History.versions(spark, lakePath).last
    if (latest <= from) None
    else {
      // derive runs once per change side; persist the diff so the two
      // passes share one row-hash diff materialization
      val changes = History.changesBetween(spark, lakePath, from, latest)
        .persist()
      try {
        val ins = derive(changes.filter(col("_change") === "insert")
          .drop("_change")).withColumn("_sign", lit(1L))
        val del = derive(changes.filter(col("_change") === "delete")
          .drop("_change")).withColumn("_sign", lit(-1L))
        val delta = ins.unionByName(del)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("_sign")).as("d_rows"))
        mergeAndPublish(spark, rollupDir, from, latest, delta,
          keyCols, Nil, Nil)
        Some((from, latest))
      } finally { changes.unpersist(): Unit }
    }
  }

  /** The rollup at its current version: (keyCols..., n_rows, sum_<col>
    * per sum column, hll_<col> sketch bytes per distinct column —
    * estimate with [[graft.functions.HyperLogLog.hll_estimate]]). */
  def read(spark: SparkSession, rollupDir: String): DataFrame = {
    val v = currentVersion(spark, rollupDir).getOrElse(
      throw new IllegalStateException(
        s"rollup at $rollupDir has no state — run bootstrap first"))
    History.readParquetFooterSchema(spark, statePath(rollupDir, v).toString)
  }
}
