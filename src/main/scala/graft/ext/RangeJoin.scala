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

  /** @param bucketWidth grid width in `ptCol`'s units; must be ≥ the
    *   longest interval (hi − lo) or intervals would span >2 buckets
    *   and miss matches. */
  def intervalJoin(points: DataFrame, ptCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_bkt", expr(s"$ptCol div $bucketWidth"))
    val ib = intervals.withColumn("_bkt",
      explode(sequence(expr(s"$loCol div $bucketWidth"),
        expr(s"$hiCol div $bucketWidth"))))
    pb.join(ib, Seq("_bkt"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }
}
