package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi-key — the second time-series
  * operator Spark has no native node for (build brief
  * §custom-operators; like [[AsOf]], existing ops express it exactly).
  *
  * A naive `p.ts BETWEEN i.lo AND i.hi` join plans as
  * BroadcastNestedLoop/cartesian — O(|P|·|I|) comparisons, which
  * detonates when neither side broadcasts. The scale shape: bucketize
  * both sides on a coarse grid with bucket width ≥ the maximum interval
  * length, so every interval spans at most two buckets. Intervals
  * explode to their covered buckets (≤2 rows each), points keep their
  * single bucket, the join becomes an equi-join on the bucket id, and
  * the exact range predicate runs as a residual filter. Work scales
  * with points × co-bucketed intervals — the density of overlap, not
  * the cross product. A point lives in exactly one bucket, so no
  * dedup pass is needed.
  */
object RangeJoin {

  /** @param bucketWidth grid width in `ptCol`'s units. Any positive
    *   width is CORRECT (the explode covers the full lo..hi bucket
    *   sequence); width is purely a cost knob — ≥ the longest interval
    *   keeps the explosion at ≤2 rows per interval, smaller widths
    *   trade more interval replicas for fewer co-bucketed points.
    *   Inverted intervals (hi < lo) fail loudly rather than silently
    *   producing no rows (a descending `sequence` would be empty). */
  def intervalJoin(points: DataFrame, ptCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ib = intervals
      .withColumn("_bkt",
        explode(sequence(
          expr(s"CASE WHEN $hiCol >= $loCol THEN $loCol div $bucketWidth " +
            s"ELSE raise_error(concat('intervalJoin: inverted interval hi<lo: ', " +
            s"$hiCol, ' < ', $loCol)) END"),
          expr(s"$hiCol div $bucketWidth"))))
    val pb = points.withColumn("_bkt", expr(s"$ptCol div $bucketWidth"))
    pb.join(ib, Seq("_bkt"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }
}
