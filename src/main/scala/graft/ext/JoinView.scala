package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** INCREMENTALLY-MAINTAINED JOIN VIEW — materialized `A ⋈ B` as a
  * manifest lake that follows BOTH source lakes at change rate: the
  * classic IVM (incremental view maintenance) step beyond keyed
  * aggregates ([[graft.sources.IncrementalRollup]]).
  *
  * Strategy: '''recompute-touched-keys'''. For a window over the two
  * change feeds, the touched key set K = keys(ΔA) ∪ keys(ΔB); the
  * view's rows with key ∈ K are taken down (merge-on-read deletion
  * vectors), and `A_new[K] ⋈ B_new[K]` is appended — exact by
  * construction (a view row changes only if one of its sides' rows
  * for that key changed), with no ΔA⋈ΔB double-count case analysis.
  * Cost follows churn, not lake size:
  *  - the feeds are image diffs of only the files that changed;
  *  - the view takedown bloom-prunes to the files that might hold a
  *    touched key;
  *  - the recompute reads BOTH sides through
  *    [[History.readPinnedKeyed]] — bloom-pruned key lookups, so the
  *    join re-evaluates O(|K| · per-key fan-out) rows, never a corpus.
  *
  * Both lakes must expose the join key under the SAME column name
  * (rename while building the lakes), and their remaining column names
  * must be disjoint. The replay discipline is the index family's
  * undo-then-apply ([[IndexReplay]]): crashed batch-tagged appends are
  * retired wholesale, and an intent record closes the
  * delete-then-identical-reinsert image-diff hole. The two source
  * baselines are tracked in separate marker dirs; the intent record is
  * keyed by the combined (fromA, fromB) baseline.
  *
  * Reference scope: the reference engine materializes no derived
  * state at all (single-pass stream); this is §7.4 training-pipeline
  * surface — the "enriched corpus follows both inputs" shape — built
  * Spark-first.
  */
object JoinView {

  def rowsDir(viewRoot: String): String = s"$viewRoot/rows"
  def stateDir(viewRoot: String): String = s"$viewRoot/_state"
  private def intentsDir(viewRoot: String): String = s"$viewRoot/_intents"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The (versionA, versionB) baseline pair encoded as ONE marker
    * value, so the pair commits ATOMICALLY — two separate marker dirs
    * would open a half-advanced window (A's marker landed, B's lost)
    * whose combined intent key no replay would ever look up again,
    * silently orphaning the intents. Both components only grow, so
    * the encoding is monotone and `indexedVersion`'s max picks the
    * latest pair. Versions are commit counters; a million commits per
    * lake bounds the encoding far below Long overflow. */
  private def comb(fromA: Long, fromB: Long): Long = {
    require(fromA < 1000000L && fromB < 1000000L,
      s"JoinView version encoding supports < 1e6 versions per lake " +
        s"(got $fromA, $fromB) — re-bootstrap the view")
    fromA * 1000000L + fromB
  }

  /** The (versionA, versionB) baselines the view currently reflects. */
  def indexedVersions(spark: SparkSession,
                      viewRoot: String): Option[(Long, Long)] =
    IndexReplay.indexedVersion(fsOf(spark, viewRoot), stateDir(viewRoot))
      .map(c => (c / 1000000L, c % 1000000L))

  private def checkJoinType(joinType: String): Unit =
    require(joinType == "inner" || joinType == "left",
      s"JoinView supports inner|left equi-joins, got '$joinType' — " +
        "recompute-touched-keys is exact for both (a missing-dim key " +
        "is itself a touched key), but right/full flip which side " +
        "anchors the view")

  /** Materialize `A ⋈ B` (equi-join on `keyCol`; `joinType` inner or
    * left — left keeps A rows whose dim is absent, null-extended, the
    * enrichment shape) from both lakes' current pinned images. Pass
    * the SAME joinType to every [[tick]]. Returns the
    * (versionA, versionB) pair materialized. */
  def bootstrap(spark: SparkSession, lakeA: String, lakeB: String,
                viewRoot: String, keyCol: String,
                joinType: String = "inner"): (Long, Long) = {
    checkJoinType(joinType)
    def latest(l: String): Long =
      FileManifest.latestVersion(fsOf(spark, l), l).getOrElse(
        throw new IllegalStateException(
          s"JoinView needs manifest-mode source lakes: $l"))
    val (vA, vB) = (latest(lakeA), latest(lakeB))
    // null join keys never participate in the maintained view: inner
    // joins drop them by semantics, and a LEFT bootstrap must exclude
    // them too or tick-appended null-key facts (unreachable by keyed
    // recompute) would diverge from bootstrapped ones
    val aSide = {
      val base = History.readPinned(spark, lakeA, vA)
      if (joinType == "left") base.filter(col(keyCol).isNotNull) else base
    }
    val rows = aSide
      .join(History.readPinned(spark, lakeB, vB), Seq(keyCol), joinType)
    val rdir = rowsDir(viewRoot)
    rows.write.mode("overwrite").parquet(rdir)
    History.enableManifests(spark, rdir): Unit
    History.enableShardedManifests(spark, rdir): Unit
    History.refreshKeyIndex(spark, rdir, keyCol): Unit
    IndexReplay.markIndexed(fsOf(spark, viewRoot), stateDir(viewRoot),
      comb(vA, vB), reset = true)
    (vA, vB)
  }

  /** Advance the view to both lakes' latest versions from their change
    * feeds. Undo-then-apply replay discipline; run from one
    * maintenance agent per view. Returns ((versionA, versionB), touched
    * key count). */
  def tick(spark: SparkSession, lakeA: String, lakeB: String,
           viewRoot: String, keyCol: String,
           // 1M default: the touched set (and its string-form shadow
           // for the intent filter) lives on the driver — ~tens of MB
           // at this cap; a window touching more is a mass change that
           // belongs to re-bootstrap, and cappedKeys decides that with
           // a count, never by materializing the over-cap set
           maxKeys: Long = 1000000L,
           joinType: String = "inner"): ((Long, Long), Long) = {
    checkJoinType(joinType)
    def latest(l: String): Long =
      FileManifest.latestVersion(fsOf(spark, l), l).getOrElse(
        throw new IllegalStateException(
          s"JoinView needs manifest-mode source lakes: $l"))
    val (toA, toB) = (latest(lakeA), latest(lakeB))
    val (fromA, fromB) = indexedVersions(spark, viewRoot).getOrElse(
      throw new IllegalStateException(
        s"JoinView.tick before bootstrap at $viewRoot"))
    if (fromA == toA && fromB == toB) return ((toA, toB), 0L)
    val rdir = rowsDir(viewRoot)
    val from = comb(fromA, fromB)
    IndexReplay.undoCrashedAppends(fsOf(spark, rdir), rdir, s"jv-$from")
    // null join keys never appear in the view (inner join) — and a
    // null in the touched set would NPE the intent record, wedging
    // the window forever
    def feedKeys(lake: String, f: Long, t: Long): DataFrame =
      if (f == t) spark.emptyDataFrame.select()
      else History.changesBetween(spark, lake, f, t)
        .select(col(keyCol)).filter(col(keyCol).isNotNull)
    val kA = feedKeys(lakeA, fromA, toA)
    val kB = feedKeys(lakeB, fromB, toB)
    val keysDf =
      if (kA.columns.isEmpty) kB
      else if (kB.columns.isEmpty) kA
      else kA.unionByName(kB)
    val touched = IndexReplay.cappedKeys(keysDf, keyCol, maxKeys,
      "maxKeys")
    val fs = fsOf(spark, viewRoot)
    val touchedStr = touched.map(_.toString).toSet
    val extras = IndexReplay.pending(fs, intentsDir(viewRoot), from)
      .filterNot(touchedStr)
    IndexReplay.record(fs, intentsDir(viewRoot), from, touched)
    val allTouched = touched ++ extras
    if (allTouched.nonEmpty) {
      History.deleteKeysDV(spark, rdir, keyCol, allTouched): Unit
      // recompute PINNED at the window's resolved targets: an unpinned
      // read could capture a concurrent writer's later image while the
      // marker commits (toA, toB) — rows the next window's net feed
      // would never re-touch
      val aNew = History.readPinnedKeyed(spark, lakeA, keyCol,
        allTouched, version = Some(toA))
      val bNew = History.readPinnedKeyed(spark, lakeB, keyCol,
        allTouched, version = Some(toB))
      val fresh = aNew.join(bNew, Seq(keyCol), joinType)
      if (!fresh.isEmpty)
        History.append(spark, rdir, fresh,
          key = s"jv-$from-" +
            java.util.UUID.randomUUID().toString.take(8)): Unit
      History.refreshKeyIndex(spark, rdir, keyCol): Unit
    }
    IndexReplay.markIndexed(fs, stateDir(viewRoot), comb(toA, toB))
    IndexReplay.clear(fs, intentsDir(viewRoot), from)
    ((toA, toB), allTouched.length.toLong)
  }

  /** The view's current image (deletion-vector-aware pinned read). */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    History.readPinned(spark, rowsDir(viewRoot))
}
