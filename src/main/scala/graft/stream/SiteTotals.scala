package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** §2.9 custom state on the MODERN arbitrary-state API: per-site running
  * totals as a `StatefulProcessor` over `transformWithState` (Spark 4) —
  * the successor to `flatMapGroupsWithState` (which `GapMonitor` uses;
  * both shapes are part of the engine's streaming surface). State lives
  * in named `ValueState` slots backed by the RocksDB state store, so
  * per-key state scales past executor heap — the property that matters
  * when 10⁵ sites × large state meet a 1000-executor cluster.
  */
object SiteTotals {

  /** Per-site update emitted each micro-batch the site appears in. */
  case class SiteUpdate(siteId: String, totalCount: Long, batchesSeen: Int)

  class Processor
      extends StatefulProcessor[String, (String, Long), SiteUpdate] {
    @transient private var total: ValueState[Long] = _
    @transient private var batches: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
      batches = getHandle.getValueState[Int](
        "batches", Encoders.scalaInt, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                 timers: TimerValues): Iterator[SiteUpdate] = {
      var add = 0L
      rows.foreach(add += _._2)
      val t = (if (total.exists()) total.get() else 0L) + add
      total.update(t)
      val b = (if (batches.exists()) batches.get() else 0) + 1
      batches.update(b)
      Iterator.single(SiteUpdate(key, t, b))
    }
  }

  /** Wire canonical records into the processor: explode the per-detector
    * count map, group by site, keep running totals. `records` is the
    * `payloadToRecords` stream. */
  def run(records: DataFrame): Dataset[SiteUpdate] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .select(col("siteId"), explode(col("detectorCounts")))
      .select(col("siteId"), col("value").cast("long").as("cnt"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Update())
  }
}
