package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom cross-batch state (SURVEY.md §2.9: the reference keeps no state
  * across documents beyond the reconnect counter — this is the analytics
  * layer's natural stateful extension): detect sites that miss their
  * 5-minute SCATS cadence.
  *
  * Implemented with `flatMapGroupsWithState` — state is one long per site,
  * partitioned by siteId, so state size is O(#sites) regardless of
  * throughput; at 100 TB scale the state store shuffles only the
  * per-site key space.
  */
object GapMonitor {

  case class SiteObservation(siteId: String, ts: Long)
  case class GapAlert(siteId: String, prevTs: Long, ts: Long, gapSecs: Long)

  /** Emit an alert whenever consecutive observations of a site are more
    * than `maxGapSecs` apart (default: 2 missed 5-min periods + 3-min lag).
    */
  def alerts(records: DataFrame, maxGapSecs: Long = 900)
            : Dataset[GapAlert] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .selectExpr("siteId", "collectionendtimestamp_plus_3_mins AS ts")
      .as[SiteObservation]
      .groupByKey(_.siteId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (site: String, rows: Iterator[SiteObservation],
         state: GroupState[Long]) =>
          val sorted = rows.map(_.ts).toSeq.sorted
          val start = state.getOption
          val (alerts, last) = sorted.foldLeft(
            (Vector.empty[GapAlert], start)) { case ((acc, prev), ts) =>
            val acc2 = prev match {
              case Some(p) if ts - p > maxGapSecs =>
                acc :+ GapAlert(site, p, ts, ts - p)
              case _ => acc
            }
            (acc2, Some(ts))
          }
          last.foreach(state.update)
          alerts.iterator
      }
  }
}
