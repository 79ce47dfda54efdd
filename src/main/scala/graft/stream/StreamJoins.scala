package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins over the transis record streams (SURVEY §2.9
  * depth beyond the reference: the reference only ever consumes one
  * stream at a time; correlating counts with alarms is the first thing
  * an operations consumer asks of the combined feeds).
  *
  * 100 TB design note: a watermarked stream-stream inner join keeps
  * per-key state bounded by the time-range condition plus the
  * watermarks — alarm-side state ages out `horizonMinutes` + watermark
  * after its event time, count-side state at its watermark. Without
  * BOTH watermarks and the range condition, Spark would buffer the
  * streams forever.
  */
object StreamJoins {

  /** Each detector-count record paired with the alarms raised for its
    * region in the preceding `horizonMinutes` (inner join; records
    * without a recent alarm drop out — use the windowed-aggregate
    * layer for alarm-free analytics).
    *
    * @param records `Pipeline.payloadToRecords` shape (region, siteId,
    *                collectionendtimestamp_plus_3_mins, detectorCounts)
    * @param alarms  monitor-record shape (id, date, reg, value) — the
    *                S5 SiteAlarm surface
    */
  /** @param joinType "inner" (alarm-free records drop out) or
    *   "left_outer" — every record survives, alarm columns null when no
    *   alarm landed in the horizon. Outer rows can only emit once the
    *   watermark passes the record's horizon (Spark must prove no
    *   matching alarm can still arrive), so outer results trail the
    *   stream by watermark + horizon — the unavoidable price of
    *   correctness on unordered streams. */
  def countsWithRecentAlarms(records: DataFrame, alarms: DataFrame,
                             horizonMinutes: Int = 30,
                             joinType: String = "inner"): DataFrame = {
    val c = WindowedAnalytics.withEventTime(records)
      .withWatermark("eventTime", "10 minutes")
    val a = alarms.select(
        col("id").as("alarm_id"),
        col("reg").as("alarm_reg"),
        col("value").as("alarm_value"),
        to_timestamp(col("date")).as("alarmTime"))
      .withWatermark("alarmTime", "10 minutes")
    c.join(a,
      col("region") === col("alarm_reg") &&
        col("alarmTime") >= col("eventTime") -
          expr(s"INTERVAL $horizonMinutes MINUTES") &&
        col("alarmTime") <= col("eventTime"),
      joinType)
      .select(col("region"), col("siteId"), col("eventTime"),
        col("alarm_id"), col("alarm_value"), col("alarmTime"))
  }
}
