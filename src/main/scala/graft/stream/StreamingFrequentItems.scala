package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import graft.ext.FrequentItems.MisraGries

/** Streaming frequent items (§2.9 extension): the Misra–Gries summary of
  * [[graft.ext.FrequentItems]] maintained as PER-KEY STREAMING STATE
  * across micro-batches — "which values are trending per series, right
  * now" over an unbounded stream, in O(k) state per key.
  *
  * The same mergeable summary the batch operator uses for candidate
  * generation is here the live answer (with the same ≤ N/k count-error
  * guarantee over the stream so far); a deployment wanting exact counts
  * runs the batch verify pass over the archived lake for the candidate
  * set this state surfaces. State is a single bounded map per key in a
  * `ValueState` slot (RocksDB-backed at scale) — it never grows with
  * stream length, the property that keeps a year-long query alive.
  */
object StreamingFrequentItems {

  /** Per-key snapshot after each micro-batch touching the key: the
    * surviving candidate items and total items processed so far (the
    * worst-case count error of the summary is derivable as
    * processed / k). */
  case class HotItems(key: String, candidates: Seq[String],
                      processed: Long)

  class Processor(k: Int)
      extends StatefulProcessor[String, (String, String), HotItems] {
    @transient private var summary: ValueState[Map[String, Long]] = _
    @transient private var processed: ValueState[Long] = _
    private lazy val mg = new MisraGries(k)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      summary = getHandle.getValueState[Map[String, Long]](
        "mg", Encoders.kryo[Map[String, Long]], TTLConfig.NONE)
      processed = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String,
                                 rows: Iterator[(String, String)],
                                 timers: TimerValues): Iterator[HotItems] = {
      var st = if (summary.exists()) summary.get() else Map.empty[String, Long]
      var n = if (processed.exists()) processed.get() else 0L
      // null items are never emittable candidates: skip them entirely
      // (counter slots and the processed total track the same
      // population, matching the batch operator's normalization)
      rows.foreach { r =>
        if (r._2 != null) { st = mg.reduce(st, r._2); n += 1 }
      }
      summary.update(st)
      processed.update(n)
      Iterator.single(HotItems(key, mg.finish(st), n))
    }
  }

  /** Group `stream`'s (key, item) pairs by key and maintain the bounded
    * summary; emits a [[HotItems]] snapshot per key per micro-batch. */
  def run(stream: DataFrame, keyCol: String, itemCol: String,
          k: Int): Dataset[HotItems] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new Processor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
