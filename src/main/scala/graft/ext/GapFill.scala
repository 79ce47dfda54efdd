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
  * series key. For very long ranges with few series, re-partition the
  * fill by (series, coarse-time-chunk) and carry chunk boundary values —
  * not needed while #series ≥ cores, which a detector-network (thousands
  * of series) always satisfies.
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
    * `buckets` must already be aggregated (unique (series, bucket)). */
  def resampleFill(buckets: DataFrame, seriesCol: String, bucketCol: String,
                   countCol: String, valueCol: String,
                   strideSec: Long): DataFrame = {
    val bounds = buckets.agg(
      min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
    val series = buckets.select(col(seriesCol)).distinct()
    val grid = series.crossJoin(broadcast(bounds)) // single row: broadcast
      .select(col(seriesCol),
        explode(sequence(col("lo"), col("hi"), lit(strideSec)))
          .as(bucketCol))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, Seq(seriesCol, bucketCol), "left")
      .select(col(seriesCol), col(bucketCol),
        coalesce(col(countCol), lit(0L)).as(countCol),
        last(col(valueCol), ignoreNulls = true).over(w)
          .as(s"filled_$valueCol"))
  }
}
