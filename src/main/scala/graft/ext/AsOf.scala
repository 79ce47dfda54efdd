package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series operator
  * Spark has no native node for (build brief §custom-operators;
  * composition chosen per the preference order: existing ops express it
  * exactly, so no custom strategy is needed).
  *
  * Implementation is the MERGE pattern: union both sides, one window
  * pass per key ordered by (time, side) carrying the last right-side
  * payload forward, keep left rows. Cost: ONE shuffle on the key and a
  * per-key sort of |L|+|R| rows — a naive `l.ts >= r.ts` range join is
  * O(|L|·|R|) per key and detonates on dense keys. Right-side payload
  * travels as a single struct so every carried column comes from the
  * SAME right row (independent per-column carries could mix rows when
  * payload fields are null).
  *
  * Tie semantics: a right row at exactly the left row's time IS
  * eligible (at-or-before) — right sorts before left at equal time via
  * the side flag. Right rows duplicated on (key, time) are resolved by
  * their sort order within the window; pre-dedup the right side when
  * that matters.
  *
  * 100 TB note: one hot key serializes its sort; salt by a coarse time
  * bucket (join bucket b and b-1) when a key's row count breaks the
  * per-task budget.
  */
object AsOf {

  /** @param payloadCols right-side columns attached to each left row as
    *   `<prefix><name>`; left rows with no earlier right row get nulls
    *   (filter them out for inner semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val r = right.select(col(keyCol), col(timeCol), payload.as("_asof"))
    val payloadType = r.schema("_asof").dataType
    val l2 = left
      .withColumn("_asof", lit(null).cast(payloadType))
      .withColumn("_side", lit(1))
    val r2 = left.columns.filterNot(c => c == keyCol || c == timeCol)
      .foldLeft(r) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .withColumn("_side", lit(0))
      .select(l2.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.unionByName(r2)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
    val out = payloadCols.foldLeft(carried.filter(col("_side") === 1)) {
      (df, c) => df.withColumn(prefix + c, col(s"_asof.$c"))
    }
    out.drop("_asof", "_side")
  }
}
