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

  /** Random salt ∈ [0, salts). Deliberately NOT derived from any data
    * column: a hot key whose rows share one value (a million `count=0`
    * rows on one region) would hash to a single bucket and the
    * mitigation would silently do nothing. `rand(seed)` spreads every
    * row regardless of content; the aggregate result is salt-invariant
    * so reproducibility of the salt itself doesn't matter. */
  def salt(salts: Int, seed: Long = 42L): Column =
    floor(rand(seed) * salts).cast("int")

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
