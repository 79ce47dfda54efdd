package graft.stream

import org.apache.spark.sql.SparkSession
import graft.sources.{FileManifest, History}

/** Change-feed DELIVERY for the manifest lake: each tick publishes the
  * net row-level diff since the last delivered version
  * ([[History.changesBetween]] — insert/delete images from only the
  * files the commits rewrote) into `outDir/changes-v<from>-v<to>/`,
  * exactly once.
  *
  * Progress state is the OUTPUT ITSELF: the high-water version is the
  * max `<to>` among published range directories, so there is no
  * separate ledger to drift from the data. Publication is
  * stage-then-rename (the same discipline as every lake commit):
  *
  *  - a crash BEFORE the rename leaves only `_staging` leftovers — the
  *    next tick overwrites them; nothing was delivered, the high water
  *    never moved;
  *  - a crash AFTER the rename delivered the range and moved the high
  *    water atomically with it — a replayed tick sees the range dir
  *    and skips; the converged state is exactly one copy per range.
  *
  * An empty diff (compaction / clusterBy — pure rewrites) still
  * publishes its range dir, so the high water advances past
  * content-neutral commits instead of re-diffing them forever.
  *
  * Downstream is plain Structured Streaming: range dirs appear
  * atomically, so a vanilla file-source stream over
  * `outDir/changes-*` tails the feed with ordinary checkpointing —
  * no custom source needed. Ranges COLLAPSE intermediate versions
  * (net-effect semantics: a row inserted and deleted within one
  * window cancels), matching the multiset diff contract.
  *
  * The window's `from` version must still be retained: size the
  * lake's vacuum grace to at least the delivery cadence, or the tick
  * fails loudly (never silently re-baselines — that would replay the
  * whole lake as inserts). Bootstrap baselines at the latest version
  * (deliver changes from NOW on); pass `fromVersion` to baseline
  * elsewhere, e.g. the oldest retained version for
  * initial-snapshot-then-follow. */
object LakeChangeFeed {

  private val RangeDir = "changes-v(\\d+)-v(\\d+)".r

  /** Highest delivered `to` version under `outDir`, if any. */
  def highWater(spark: SparkSession, outDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val tos = fs.listStatus(p).iterator.flatMap(s =>
        s.getPath.getName match {
          case RangeDir(_, to) => Some(to.toLong)
          case _ => None
        }).toSeq
      if (tos.isEmpty) None else Some(tos.max)
    }
  }

  /** Deliver the (highWater, latest] diff, if any. Returns the range
    * published (also for an already-delivered replayed range), or None
    * when the lake has no new version. Run from one delivery agent at
    * a time (single-writer, like every lake maintenance op). */
  def tick(spark: SparkSession, lakePath: String, outDir: String,
           fromVersion: Option[Long] = None): Option[(Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(lakePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = FileManifest.latestVersion(fs, lakePath).getOrElse(
      throw new IllegalStateException(
        s"change feed needs a manifest-mode lake: $lakePath"))
    val hw = highWater(spark, outDir)
    val from = hw.orElse(fromVersion).getOrElse(latest)
    if (from >= latest) {
      // bootstrap with nothing to deliver: PERSIST the baseline as an
      // empty changes-vN-vN marker dir (no files — invisible to file-
      // source consumers), else every tick would re-baseline at the
      // then-current latest and never deliver anything
      if (hw.isEmpty) {
        val out = new org.apache.hadoop.fs.Path(outDir)
        val outFs = out.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        outFs.mkdirs(new org.apache.hadoop.fs.Path(
          out, s"changes-v$from-v$from")): Unit
      }
      return None
    }
    val retained = FileManifest.versions(fs, lakePath)
    require(retained.contains(from),
      s"change-feed baseline v$from is no longer retained at $lakePath " +
        s"(vacuumed; retained: ${retained.mkString(", ")}) — " +
        "re-bootstrap explicitly rather than silently re-baselining")
    val out = new org.apache.hadoop.fs.Path(outDir)
    val outFs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val name = s"changes-v$from-v$latest"
    val dest = new org.apache.hadoop.fs.Path(out, name)
    if (outFs.exists(dest)) return Some((from, latest)) // replayed tick
    val stage = new org.apache.hadoop.fs.Path(out, s"_staging/$name")
    outFs.delete(stage, true): Unit // crashed prior attempt
    History.changesBetween(spark, lakePath, from, latest)
      .write.mode("overwrite").parquet(stage.toString)
    outFs.mkdirs(dest.getParent): Unit
    if (outFs.exists(dest)) { // racing replay finished first: converge
      outFs.delete(stage, true): Unit
    } else if (!outFs.rename(stage, dest))
      throw new java.io.IOException(s"change-feed publish failed: $dest")
    Some((from, latest))
  }

  /** [[tick]] + CHANGE-FEED-DRIVEN index maintenance in one delivery
    * agent: after a range (from, to] is delivered (or found already
    * delivered — replays must converge the indexes too), bring the
    * stats sidecar / bloom key index up to date for EXACTLY the files
    * that range's commits added ([[History.refreshStatsForRange]] /
    * [[History.refreshKeyIndexForRange]]) — the agent never lists the
    * lake or diffs a full sidecar to find its work, so maintenance
    * cost follows the change rate, not the lake size. Idempotent per
    * range, like the delivery itself. */
  def tickWithMaintenance(spark: SparkSession, lakePath: String,
      outDir: String, statsCols: Seq[String] = Nil,
      keyCols: Seq[String] = Nil,
      fromVersion: Option[Long] = None,
      rollups: Seq[RollupSpec] = Nil,
      binPackTargetBytes: Option[Long] = None,
      vectorIndexes: Seq[IndexSpec] = Nil,
      lmRollups: Seq[LmSpec] = Nil,
      textIndexes: Seq[TextIndexSpec] = Nil): Option[(Long, Long)] = {
    val range = tick(spark, lakePath, outDir, fromVersion)
    range.foreach { case (from, to) =>
      statsCols.foreach(c =>
        History.refreshStatsForRange(spark, lakePath, c, from, to): Unit)
      keyCols.foreach(c =>
        History.refreshKeyIndexForRange(spark, lakePath, c, from, to): Unit)
    }
    // materialized rollups advance on EVERY maintenance pass, not just
    // when this agent delivered a new range: a rollup bootstrapped (or
    // replayed) behind the feed's high water still needs its own
    // catch-up, and IncrementalRollup.tick is a no-op when current —
    // so the compose stays idempotent per (rollup, lake-version) pair.
    // Failures are isolated PER ROLLUP: one poisoned rollup (e.g. an
    // HLL spec hitting a delete range) must not starve the others —
    // every spec gets its tick, then the failures surface together.
    // every maintenance step below is failure-ISOLATED on the same
    // terms: each is idempotent per delivered state (a current target
    // no-ops, a crashed prior tick replays to convergence), so one
    // poisoned step must cost one step, never starve the rest — all
    // failures collect and surface together after everything ran
    def guarded(label: String)(body: => Unit): Option[(String, Exception)] =
      try { body; None } catch { case e: Exception => Some((label, e)) }
    // small-file debt retires in the same agent pass: a converged lake
    // no-ops, a packing commit is pure layout (the NEXT tick's feed
    // diffs it to empty), and running after delivery means the
    // packed-away files were already diffed
    val failed =
      range.toSeq.flatMap(_ => binPackTargetBytes.flatMap(t =>
        guarded(s"$lakePath (binPack)") {
          History.binPack(spark, lakePath, targetBytes = t): Unit
        })) ++
      rollups.flatMap(r => guarded(r.rollupDir) {
        graft.sources.IncrementalRollup.tick(spark, lakePath, r.rollupDir,
          r.keyCols, r.sumCols, r.distinctCols): Unit
      }) ++
      vectorIndexes.flatMap(ix => guarded(ix.indexDir) {
        graft.ext.VectorIndex.tick(spark, lakePath, ix.indexDir,
          ix.idCol, ix.embCol,
          graft.ext.Similarity.loadCentroids(spark, ix.centroidsDir)): Unit
      }) ++
      lmRollups.flatMap(lm => guarded(lm.rollupDir) {
        (if (lm.kind == "bigram")
          graft.ext.LmRollup.tickBigrams(spark, lakePath,
            lm.rollupDir, lm.textCol)
        else
          graft.ext.LmRollup.tickUnigrams(spark, lakePath,
            lm.rollupDir, lm.textCol)): Unit
      }) ++
      textIndexes.flatMap(tx => guarded(tx.indexDir) {
        (if (tx.kind == "lexical")
          graft.ext.LexicalIndex.tick(spark, lakePath, tx.indexDir,
            tx.idCol, tx.textCol)
        else
          graft.ext.BandIndex.tick(spark, lakePath, tx.indexDir,
            tx.idCol, tx.textCol)): Unit
      })
    if (failed.nonEmpty) {
      val total = rollups.size + vectorIndexes.size + lmRollups.size +
        textIndexes.size +
        (if (binPackTargetBytes.isDefined) 1 else 0)
      val ex = new IllegalStateException(
        s"${failed.size}/$total maintenance tick(s) failed " +
          s"(the rest advanced): ${failed.map(_._1).mkString(", ")}",
        failed.head._2)
      failed.drop(1).foreach(f => ex.addSuppressed(f._2))
      throw ex
    }
    range
  }

  /** STREAM the lake: a Structured Streaming DataFrame tailing this
    * feed's delivered ranges — `readStream` over `outDir/changes-*`
    * with the lake's schema plus the `_change` tag ('insert' |
    * 'delete'). The pieces compose into end-to-end exactly-once with
    * no custom source: [[tick]] publishes each range atomically
    * (stage-then-rename, so the file source never lists a partial
    * range), the vanilla file source checkpoints which files it has
    * processed, and any idempotent/transactional sink downstream
    * completes the chain — watermarks, windowed aggregations,
    * `foreachBatch` into ANOTHER manifest lake (a derived table that
    * follows the source lake at change-rate cost), all ordinary
    * Structured Streaming on top.
    *
    * Schema comes from the LAKE (declared schema when committed, else
    * the pinned read's shape), so the stream resolves even before the
    * first non-empty range lands. Expire ranges only behind every
    * consumer's checkpoint ([[expire]]'s contract). Deletes arrive as
    * full row images tagged 'delete' — consumers maintaining state
    * retract on them (the same contract [[graft.sources
    * .IncrementalRollup]] consumes in batch). */
  def stream(spark: SparkSession, lakePath: String,
             outDir: String): org.apache.spark.sql.DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      History.readPinned(spark, lakePath).schema.fields :+
        org.apache.spark.sql.types.StructField("_change",
          org.apache.spark.sql.types.StringType, nullable = false))
    spark.readStream.schema(schema)
      .parquet(s"$outDir/changes-*")
  }

  /** Retire delivered range dirs beyond the newest `keepRanges` — the
    * feed's outDir otherwise grows one dir per delivery forever (the
    * same unbounded-metadata shape retention/vacuum close everywhere
    * else in the lake). The newest range always survives: its `to`
    * version IS the high water, and deleting it would re-baseline the
    * next tick at the then-current latest and replay history. Size
    * `keepRanges` to the slowest consumer's checkpoint lag — a file-
    * source stream that has already checkpointed past a range never
    * reads it again, so expiry behind every consumer is invisible.
    * Returns the number of range dirs deleted. `fence` runs before the
    * delete batch — the lease fencing hook, same discipline as
    * [[graft.sources.History.vacuum]]. */
  def expire(spark: SparkSession, outDir: String, keepRanges: Int,
             fence: () => Unit = () => ()): Int = {
    require(keepRanges >= 1, s"keepRanges must be >= 1, got $keepRanges")
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(out)) return 0
    val ranges = fs.listStatus(out).flatMap(s => s.getPath.getName match {
      case RangeDir(from, to) => Some((from.toLong, to.toLong, s.getPath))
      case _ => None
    }).sortBy(r => (r._2, r._1)) // oldest first; high water last
    val victims = ranges.dropRight(keepRanges)
    if (victims.isEmpty) return 0
    fence()
    victims.count { case (_, _, p) => fs.delete(p, true) }
  }

  /** One incrementally-maintained rollup for [[tickWithMaintenance]] to
    * advance alongside the stats/key-index refreshes. */
  final case class RollupSpec(rollupDir: String, keyCols: Seq[String],
                              sumCols: Seq[String],
                              distinctCols: Seq[String] = Nil)
  object RollupSpec {
    def apply(rollupDir: String, keyCols: Seq[String],
              sumCol: String): RollupSpec =
      RollupSpec(rollupDir, keyCols, Seq(sumCol))
  }

  /** One maintained LM count table ([[graft.ext.LmRollup]]) for
    * [[tickWithMaintenance]] to advance alongside the rollups —
    * `kind` is "unigram" or "bigram" over `textCol`. */
  final case class LmSpec(rollupDir: String, textCol: String,
                          kind: String) {
    require(kind == "unigram" || kind == "bigram",
      s"LmSpec kind must be unigram|bigram, got '$kind'")
  }

  /** One maintained ANN index ([[graft.ext.VectorIndex]]) for
    * [[tickWithMaintenance]] to advance alongside the rollups — the
    * quantizer is resolved from its versioned published root
    * ([[graft.ext.Similarity.loadCentroids]]). */
  final case class IndexSpec(indexDir: String, idCol: String,
                             embCol: String, centroidsDir: String)

  /** One maintained text-derived index for [[tickWithMaintenance]] to
    * advance alongside the rollups — `kind` is "lexical" (BM25
    * postings + rollups, [[graft.ext.LexicalIndex]]) or "bands"
    * (dedup LSH bands, [[graft.ext.BandIndex]]) over `textCol`. */
  final case class TextIndexSpec(indexDir: String, idCol: String,
                                 textCol: String, kind: String) {
    require(kind == "lexical" || kind == "bands",
      s"TextIndexSpec kind must be lexical|bands, got '$kind'")
  }
}
