package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (build brief: "Skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join handles join-side skew at runtime; aggregation-side
  * hotspots (one key holding a large share of all rows — e.g. one region
  * in the detector stream, one boilerplate band key in LSH) are handled
  * here with the classic two-phase salted aggregate:
  *
  *   phase 1: groupBy(key, salt) — the hot key spreads over `salts`
  *            partitions, partial aggregates stay small;
  *   phase 2: groupBy(key) re-combines the `salts` partials.
  *
  * Cost: one extra (tiny) shuffle of #keys × salts rows. Only worth it for
  * genuinely hot keys; the API takes the aggregation in re-combinable form.
  */
object Skew {

  /** Salt ∈ [0, salts) from stable row identity, NOT from `rand`: a
    * nondeterministic salt feeding a shuffle means a fetch-failure map
    * retry can re-assign rows to different buckets than already-fetched
    * reducer outputs saw — double/zero-counting (the SPARK-23207 class
    * of bug), precisely at the cluster scale this targets. Also NOT
    * from data columns alone: a hot key's million identical rows would
    * collapse to one bucket. `monotonically_increasing_id()` (partition
    * id + row index) is distinct per row and recomputes identically as
    * long as the input's partition contents/order are deterministic —
    * true for file scans; checkpoint first if the input is downstream
    * of a nondeterministic shuffle. */
  def salt(salts: Int, seed: Long = 42L): Column =
    pmod(hash(monotonically_increasing_id(), lit(seed)), lit(salts))

  /** Two-phase salted sum/count aggregate: returns
    * (key, sum_<valueCol>, n_rows) — exactly what the direct
    * `groupBy(key).agg(sum, count)` returns, skew-proof. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pn")).cast("bigint").as("n_rows"))
}
