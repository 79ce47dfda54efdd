package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify a bucketed aggregate onto a complete
  * fixed-stride grid and forward-fill gaps — the "regularize the 5-minute
  * cadence" operator a monitoring/feature pipeline needs before windowed
  * math (the reference's detector counts arrive on a nominal 300 s
  * cadence with dropped periods; SURVEY §1.1).
  *
  * 100 TB shape: the grid is generated from ONE broadcast row (global
  * min/max bucket) cross the distinct series keys — `sequence` + explode,
  * so grid size is #series · #buckets, never a function of event rows —
  * and joined LEFT to the (already aggregated, post-shuffle) buckets.
  * The forward fill is a per-series ordered window: one shuffle on the
  * series key. For very long ranges with FEW series (one window
  * partition would serialize a year of buckets through one task), pass
  * `chunkBuckets`: the fill re-partitions by (series, time-chunk) with
  * chunk-boundary carry values — same result (`GapFillSpec` proves
  * chunked ≡ unchunked on randomized data), bounded window state.
  */
object GapFill {

  /** Densify `buckets` (one row per (seriesCol, bucketCol), bucket =
    * epoch-second start, stride `strideSec`) onto the full
    * [min, max] grid of observed buckets, every series × every bucket:
    *
    *  - `n_events`: 0 where the series has no row in that bucket
    *  - `valueCol` → `filled_<valueCol>`: last non-null value at-or-before
    *    the bucket (forward fill; null before a series' first value)
    *
    * `buckets` must already be aggregated (unique (series, bucket)).
    *
    * @param chunkBuckets few-series scale escape: when set, the ordered
    *   fill windows over (series, chunk-of-N-buckets) partitions instead
    *   of whole series, and a chunk-level carry table (#series·#chunks
    *   rows — tiny) threads the last value across chunk boundaries. Use
    *   when #series < cores and ranges are long; leave None for the
    *   many-series case (a detector network) where per-series windows
    *   already parallelize. */
  def resampleFill(buckets: DataFrame, seriesCol: String, bucketCol: String,
                   countCol: String, valueCol: String,
                   strideSec: Long,
                   chunkBuckets: Option[Long] = None): DataFrame = {
    val bounds = buckets.agg(
      min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
    val series = buckets.select(col(seriesCol)).distinct()
    val grid = series.crossJoin(broadcast(bounds)) // single row: broadcast
      .select(col(seriesCol),
        explode(sequence(col("lo"), col("hi"), lit(strideSec)))
          .as(bucketCol))
    val joined = grid.join(buckets, Seq(seriesCol, bucketCol), "left")
    chunkBuckets match {
      case None =>
        val w = Window.partitionBy(col(seriesCol)).orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.select(col(seriesCol), col(bucketCol),
          coalesce(col(countCol), lit(0L)).as(countCol),
          last(col(valueCol), ignoreNulls = true).over(w)
            .as(s"filled_$valueCol"))
      case Some(n) =>
        require(n > 0, s"chunkBuckets must be positive, got $n")
        // epoch-aligned chunk id: any consistent chunking preserves the
        // fill (the carry supplies everything before the chunk)
        val chunked = joined.withColumn("_chunk",
          floor(col(bucketCol) / lit(strideSec * n)))
        val wChunk = Window.partitionBy(col(seriesCol), col("_chunk"))
          .orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // last non-null value per (series, chunk) — a bounded aggregate,
        // then the cross-chunk carry is an ordered window over the
        // #series·#chunks summary rows, never the bucket rows
        val lastPerChunk = chunked.filter(col(valueCol).isNotNull)
          .groupBy(col(seriesCol), col("_chunk"))
          .agg(max_by(col(valueCol), col(bucketCol)).as("_lastVal"))
        val wCarry = Window.partitionBy(col(seriesCol)).orderBy(col("_chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = chunked.select(col(seriesCol), col("_chunk")).distinct()
          .join(lastPerChunk, Seq(seriesCol, "_chunk"), "left")
          .select(col(seriesCol), col("_chunk"),
            last(col("_lastVal"), ignoreNulls = true).over(wCarry)
              .as("_carry"))
        chunked
          .withColumn("_local",
            last(col(valueCol), ignoreNulls = true).over(wChunk))
          .join(carries, Seq(seriesCol, "_chunk"), "left")
          .select(col(seriesCol), col(bucketCol),
            coalesce(col(countCol), lit(0L)).as(countCol),
            coalesce(col("_local"), col("_carry"))
              .as(s"filled_$valueCol"))
    }
  }
}
