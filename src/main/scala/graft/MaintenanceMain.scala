package graft

import org.apache.spark.sql.SparkSession
import graft.sources.History
import graft.stream.LakeChangeFeed

/** The deployable MAINTENANCE entry point — the lake-side counterpart
  * of [[LiveMain]]: one agent per lake running the whole maintenance
  * contract on a cadence, configured entirely through `spark.graft
  * .maintenance.*` conf (no code changes to add a rollup or an index):
  *
  *  - deliver the change feed + refresh stats sidecars / bloom key
  *    indexes / materialized rollups / maintained ANN indexes for
  *    exactly the delivered range ([[LakeChangeFeed
  *    .tickWithMaintenance]] — cost follows the change rate);
  *  - retire small-file debt (`binPackTargetBytes`);
  *  - optionally vacuum past the configured grace and expire delivered
  *    feed ranges beyond a keep window — the two shrink-side ops that
  *    REQUIRE a single agent, which this main is.
  *
  * Conf surface:
  * {{{
  *   spark.graft.maintenance.lake            /data/lake        (required)
  *   spark.graft.maintenance.feedDir         /data/lake-feed   (required)
  *   spark.graft.maintenance.statsCols       n_chars,ts
  *   spark.graft.maintenance.keyCols         doc_id
  *   spark.graft.maintenance.rollups         dir|k1+k2|s1+s2|d1  ;-separated
  *   spark.graft.maintenance.vectorIndexes   idxDir|id|emb|centDir ;-separated
  *   spark.graft.maintenance.lmRollups       dir|textCol|bigram    ;-separated
  *   spark.graft.maintenance.textIndexes     idxDir|id|text|lexical ;-separated
  *                                           (kind: lexical | bands)
  *   spark.graft.maintenance.joinViews       viewRoot|lakeA|lakeB|key ;-separated
  *   spark.graft.maintenance.binPackTargetBytes  134217728
  *   spark.graft.maintenance.vacuumGraceMs   86400000
  *   spark.graft.maintenance.feedKeepRanges  96
  *   spark.graft.maintenance.intervalSecs    60
  *   spark.graft.maintenance.once            true   (one pass, then exit)
  *   spark.graft.maintenance.leaseTtlMs      600000 (0 disables the lease)
  * }}}
  *
  * SINGLE-AGENT ENFORCEMENT: every pass first acquires (or renews) the
  * lake's maintenance lease ([[graft.sources.MaintenanceLease]] — an
  * expiring lease file under `_manifests/lease/` committed by the
  * atomic no-overwrite primitive). A second daemon pointed at the same
  * lake BOUNCES LOUDLY (the loop exits — two interleaved maintenance
  * sequences are undefined behavior, the exact constraint the lease
  * enforces); a crashed daemon's lease ages out after `leaseTtlMs` and
  * the next daemon takes over. Size the TTL well above one pass
  * duration + the interval so a live daemon renews long before expiry.
  */
object MaintenanceMain {

  private def conf(spark: SparkSession, key: String): Option[String] =
    spark.conf.getOption(s"spark.graft.maintenance.$key")
      .map(_.trim).filter(_.nonEmpty)

  private def csv(spark: SparkSession, key: String): Seq[String] =
    conf(spark, key).map(_.split(',').map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Nil)

  private[graft] def rollupSpecs(
      spark: SparkSession): Seq[LakeChangeFeed.RollupSpec] =
    conf(spark, "rollups").map(_.split(';').map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map { enc =>
        enc.split('|') match {
          case Array(dir, keys, sums) =>
            LakeChangeFeed.RollupSpec(dir,
              keys.split('+').toSeq, sums.split('+').toSeq)
          case Array(dir, keys, sums, distincts) =>
            LakeChangeFeed.RollupSpec(dir,
              keys.split('+').toSeq, sums.split('+').toSeq,
              distincts.split('+').toSeq)
          case _ => throw new IllegalArgumentException(
            s"bad rollup spec '$enc' — want dir|k1+k2|s1+s2[|d1+d2]")
        }
      }

  private[graft] def indexSpecs(
      spark: SparkSession): Seq[LakeChangeFeed.IndexSpec] =
    conf(spark, "vectorIndexes").map(_.split(';').map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map { enc =>
        enc.split('|') match {
          case Array(dir, id, emb, cents) =>
            LakeChangeFeed.IndexSpec(dir, id, emb, cents)
          case _ => throw new IllegalArgumentException(
            s"bad index spec '$enc' — want indexDir|idCol|embCol|centroidsDir")
        }
      }

  private[graft] def lmSpecs(
      spark: SparkSession): Seq[LakeChangeFeed.LmSpec] =
    conf(spark, "lmRollups").map(_.split(';').map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map { enc =>
        enc.split('|') match {
          case Array(dir, textCol, kind) =>
            LakeChangeFeed.LmSpec(dir, textCol, kind)
          case _ => throw new IllegalArgumentException(
            s"bad lm spec '$enc' — want rollupDir|textCol|{unigram,bigram}")
        }
      }

  private[graft] def textIndexSpecs(
      spark: SparkSession): Seq[LakeChangeFeed.TextIndexSpec] =
    conf(spark, "textIndexes").map(_.split(';').map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map { enc =>
        enc.split('|') match {
          case Array(dir, id, text, kind) =>
            LakeChangeFeed.TextIndexSpec(dir, id, text, kind)
          case _ => throw new IllegalArgumentException(
            s"bad text index spec '$enc' — want " +
              "indexDir|idCol|textCol|{lexical,bands}")
        }
      }

  private[graft] final case class JoinViewSpec(viewRoot: String,
      lakeA: String, lakeB: String, keyCol: String)

  private[graft] def joinViewSpecs(
      spark: SparkSession): Seq[JoinViewSpec] =
    conf(spark, "joinViews").map(_.split(';').map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map { enc =>
        enc.split('|') match {
          case Array(root, a, b, key) => JoinViewSpec(root, a, b, key)
          case _ => throw new IllegalArgumentException(
            s"bad join view spec '$enc' — want " +
              "viewRoot|lakeA|lakeB|keyCol")
        }
      }

  /** The lake's maintenance-lease TTL from conf (default 10 min;
    * 0 = lease off, for embedded callers that own sequencing). */
  private[graft] def leaseTtl(spark: SparkSession): Long =
    conf(spark, "leaseTtlMs").map(_.toLong).getOrElse(600000L)

  /** Acquire/renew the configured lake's lease for this process —
    * returned as the pass's FENCING TOKEN (see [[runOnce]]). Throws
    * [[graft.sources.LeaseHeldException]] when another daemon holds
    * it. None when the lease is disabled (ttl 0). */
  private[graft] def acquireLease(spark: SparkSession, owner: String)
      : Option[graft.sources.MaintenanceLease.Lease] = {
    val ttl = leaseTtl(spark)
    if (ttl <= 0) return None
    val lake = conf(spark, "lake").getOrElse(throw new
        IllegalArgumentException("spark.graft.maintenance.lake required"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Some(graft.sources.MaintenanceLease.acquire(fs, lake, owner, ttl))
  }

  private[graft] def releaseLease(spark: SparkSession,
                                  owner: String): Unit = {
    if (leaseTtl(spark) <= 0) return
    conf(spark, "lake").foreach { lake =>
      val fs = new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.sources.MaintenanceLease.release(fs, lake, owner): Unit
    }
  }

  /** One full maintenance pass; returns the delivered range, if any.
    * The testable unit — `main` loops this on the cadence. `lease` is
    * the pass's FENCING TOKEN: the destructive sweeps (vacuum, feed
    * expiry) re-verify it immediately before each delete batch, so a
    * pass that outlived its TTL bounces with
    * [[graft.sources.LeaseFencedException]] instead of deleting under
    * a successor's lease. */
  def runOnce(spark: SparkSession,
              lease: Option[graft.sources.MaintenanceLease.Lease] = None)
      : Option[(Long, Long)] = {
    val lake = conf(spark, "lake").getOrElse(throw new
        IllegalArgumentException("spark.graft.maintenance.lake required"))
    val feedDir = conf(spark, "feedDir").getOrElse(throw new
        IllegalArgumentException("spark.graft.maintenance.feedDir required"))
    val fence: () => Unit = lease match {
      case Some(tok) =>
        val fs = new org.apache.hadoop.fs.Path(lake)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        () => graft.sources.MaintenanceLease.checkFence(fs, lake, tok)
      case None => () => ()
    }
    // validate the vacuum contract UP FRONT, before a full pass of
    // work: a zero grace gives in-flight readers and the feed's
    // diffable files no protection at all — size the grace to the
    // delivery cadence plus the pass duration (the files a diff needs
    // are at most that old once the high water advances every pass)
    val grace = conf(spark, "vacuumGraceMs").map(_.toLong)
    grace.foreach(g => require(g > 0,
      "spark.graft.maintenance.vacuumGraceMs must be > 0 — size it to " +
        "the delivery cadence plus the pass duration (it is what keeps " +
        "a delivered range's diffable files readable)"))
    // grow-side tick first, but SHRINK-SIDE OPS MUST STILL ADVANCE when
    // it fails: tickWithMaintenance rethrows aggregated step failures,
    // and a persistently poisoned rollup/index spec would otherwise
    // starve vacuum and feed expiry on every daemon pass — retired
    // files and delivered ranges growing without bound while the loop
    // retries forever. Record the failure, run vacuum + expiry, then
    // rethrow (so `once` mode still propagates it).
    var range: Option[(Long, Long)] = None
    val failures = scala.collection.mutable.ListBuffer.empty[Throwable]
    try range = LakeChangeFeed.tickWithMaintenance(spark, lake, feedDir,
      statsCols = csv(spark, "statsCols"),
      keyCols = csv(spark, "keyCols"),
      rollups = rollupSpecs(spark),
      binPackTargetBytes = conf(spark, "binPackTargetBytes").map(_.toLong),
      vectorIndexes = indexSpecs(spark),
      lmRollups = lmSpecs(spark),
      textIndexes = textIndexSpecs(spark))
    catch { case scala.util.control.NonFatal(e) => failures += e }
    // maintained join views span TWO lakes, so they tick from runOnce
    // rather than the single-lake tickWithMaintenance — same failure
    // isolation (one poisoned view costs one view, never the pass);
    // the PARSE is inside the try too: a malformed conf must not
    // starve the shrink-side ops below any more than a failing tick
    try joinViewSpecs(spark).foreach { jv =>
      try graft.ext.JoinView.tick(spark, jv.lakeA, jv.lakeB,
        jv.viewRoot, jv.keyCol): Unit
      catch { case scala.util.control.NonFatal(e) => failures += e }
    } catch { case scala.util.control.NonFatal(e) => failures += e }
    grace.foreach { g =>
      // deliver the pass's OWN commits (bin-pack, rewrites) first so
      // the high water tracks latest (layout-only ranges diff to zero
      // rows downstream), then vacuum with the high-water ROOT pinned:
      // vacuum's own publish supersedes the just-delivered version,
      // and without the pin an aggressive grace could sweep the
      // baseline root in the same call — wedging every later pass on
      // an unresolvable changesBetween `from` (the feed fails loudly
      // rather than re-baselining, by design). A delivery failure here
      // still must not block the vacuum: the pin falls back to the
      // feed's current high water.
      try LakeChangeFeed.tick(spark, lake, feedDir): Unit
      catch { case scala.util.control.NonFatal(e) => failures += e }
      // vacuum/expire failures COLLECT like the tick's: throwing here
      // would skip the remaining shrink op and silently discard the
      // recorded grow-side failure (the daemon log would show only the
      // transient FS error, hiding the chronically failing spec)
      try {
        val pin = LakeChangeFeed.highWater(spark, feedDir).toSet
        History.vacuum(spark, lake, graceMs = g, keepVersions = pin,
          fence = fence): Unit
      } catch { case scala.util.control.NonFatal(e) => failures += e }
    }
    conf(spark, "feedKeepRanges").map(_.toInt).foreach(k =>
      try LakeChangeFeed.expire(spark, feedDir, keepRanges = k,
        fence = fence): Unit
      catch { case scala.util.control.NonFatal(e) => failures += e })
    failures.headOption.foreach { e =>
      failures.drop(1).foreach(s => e.addSuppressed(s))
      throw e
    }
    range
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-maintenance")
      .withExtensions(new GraftExtensions).getOrCreate()
    val once = conf(spark, "once").exists(_.toBoolean)
    val intervalMs =
      conf(spark, "intervalSecs").map(_.toLong).getOrElse(60L) * 1000L
    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val loop = Thread.currentThread()
    // graceful drain: flag the loop, wake it from its sleep, and WAIT
    // for the in-flight pass — a hook that only flips a plain var
    // neither reaches the loop thread reliably (no volatile) nor
    // outlives the hook's own return (the JVM halts as hooks finish)
    sys.addShutdownHook {
      running.set(false)
      loop.interrupt()
      loop.join(120000L)
    }
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // this process's lease identity — fresh per daemon start, so a
    // restarted daemon on the same host is a NEW owner (it waits out
    // its predecessor's lease like any other takeover)
    val owner = s"maintenance-${java.util.UUID.randomUUID()}"
    try while (running.get()) {
      // the agent is the ONE maintenance process per lake — ENFORCED:
      // acquire/renew the lease before every pass; a second daemon
      // bounces OUT OF THE LOOP loudly (retrying would be the exact
      // interleaving the lease exists to prevent). A transient pass
      // failure (an OCC abort under a racing writer, a poisoned
      // rollup's aggregate rethrow) must cost one pass, not the
      // daemon: vacuum, expiry, and every index stop advancing the
      // moment this loop dies. `once` mode propagates instead — a
      // one-shot caller wants the failure.
      try {
        val lease = acquireLease(spark, owner)
        runOnce(spark, lease): Unit
      } catch {
        case e: graft.sources.LeaseHeldException =>
          log.error("another maintenance daemon holds this lake's " +
            "lease — exiting (one agent per lake)", e)
          throw e
        case scala.util.control.NonFatal(e) if !once && running.get() =>
          log.warn(s"maintenance pass failed; retrying next interval", e)
      }
      if (once) running.set(false)
      else try Thread.sleep(intervalMs)
      catch { case _: InterruptedException => () } // shutdown wake-up
    } finally releaseLease(spark, owner)
    if (once) spark.stop()
  }
}
