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
  *   spark.graft.maintenance.binPackTargetBytes  134217728
  *   spark.graft.maintenance.vacuumGraceMs   86400000
  *   spark.graft.maintenance.feedKeepRanges  96
  *   spark.graft.maintenance.intervalSecs    60
  *   spark.graft.maintenance.once            true   (one pass, then exit)
  * }}}
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

  /** One full maintenance pass; returns the delivered range, if any.
    * The testable unit — `main` loops this on the cadence. */
  def runOnce(spark: SparkSession): Option[(Long, Long)] = {
    val lake = conf(spark, "lake").getOrElse(throw new
        IllegalArgumentException("spark.graft.maintenance.lake required"))
    val feedDir = conf(spark, "feedDir").getOrElse(throw new
        IllegalArgumentException("spark.graft.maintenance.feedDir required"))
    val range = LakeChangeFeed.tickWithMaintenance(spark, lake, feedDir,
      statsCols = csv(spark, "statsCols"),
      keyCols = csv(spark, "keyCols"),
      rollups = rollupSpecs(spark),
      binPackTargetBytes = conf(spark, "binPackTargetBytes").map(_.toLong),
      vectorIndexes = indexSpecs(spark))
    conf(spark, "vacuumGraceMs").map(_.toLong).foreach { g =>
      // a ZERO grace is incompatible with a change feed, structurally:
      // vacuum's own manifest publish supersedes the version the feed
      // just delivered, and at grace 0 the superseded root is
      // reclaimed in the same call — the next pass's baseline is gone
      // and the feed fails loudly (by design: silent re-baselining
      // would replay the lake as inserts). Enforce the feed contract
      // here: the grace must exceed the pass cadence.
      require(g > 0,
        "spark.graft.maintenance.vacuumGraceMs must be > 0 when a " +
          "change feed is delivered — size it to at least the pass " +
          "cadence (the feed's baseline version must stay retained " +
          "between passes)")
      // deliver the pass's OWN commits (bin-pack, rewrites) before
      // vacuuming so the high water tracks latest; these layout-only
      // ranges diff to zero rows downstream
      LakeChangeFeed.tick(spark, lake, feedDir): Unit
      History.vacuum(spark, lake, graceMs = g): Unit
    }
    conf(spark, "feedKeepRanges").map(_.toInt).foreach(k =>
      LakeChangeFeed.expire(spark, feedDir, keepRanges = k): Unit)
    range
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-maintenance").getOrCreate()
    val once = conf(spark, "once").exists(_.toBoolean)
    val intervalMs =
      conf(spark, "intervalSecs").map(_.toLong).getOrElse(60L) * 1000L
    var running = true
    sys.addShutdownHook { running = false }
    while (running) {
      runOnce(spark): Unit
      if (once) running = false
      else Thread.sleep(intervalMs)
    }
    if (once) spark.stop()
  }
}
