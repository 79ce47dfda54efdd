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
  * 100 TB note: one hot key serializes its sort through one task; pass
  * `saltBucketWidth` to spread it — see [[asofJoin]]'s parameter doc.
  */
object AsOf {

  /** What the salted path actually produced, observed during the user's
    * own action (a `CollectMetrics` node — zero extra jobs).
    *
    * @param nKeys      approx distinct keys in the union
    * @param nBuckets   exact (key, bucket) shard count
    * @param degenerate true when buckets-per-key exceeded the configured
    *                   bound — the width is too narrow for the observed
    *                   time range and the per-key summary window is
    *                   re-serializing (see [[asofJoin]]'s width formula) */
  case class SaltDiagnostic(nKeys: Long, nBuckets: Long, degenerate: Boolean)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val saltObsCounter = new java.util.concurrent.atomic.AtomicLong()

  /** @param payloadCols right-side columns attached to each left row as
    *   `<prefix><name>`; left rows with no earlier right row get nulls
    *   (filter them out for inner semantics).
    * @param saltBucketWidth hot-key salting, OFF by default. When set,
    *   rows are sharded on `(key, time div width)` so a hot key's sort
    *   spreads across its time buckets instead of serializing through
    *   one task: the window pass runs within each bucket, a per-bucket
    *   summary (one row per (key, bucket) — the bucket's last right
    *   payload) is scanned key-wise to produce each bucket's carry-in,
    *   and rows whose bucket holds no earlier right row fall back to
    *   that carry-in. The summary window IS keyed per key, but over
    *   #buckets rows, not #rows — so the width must balance the two:
    *
    *     buckets per key ≈ (t_max − t_min) / width
    *
    *   Pick `width ≈ (t_max − t_min) / B` for B in 10²–10⁴. Too WIDE
    *   (B→1) silently degrades to the unsalted hot-key sort; too NARROW
    *   (B > ~10⁵) moves the serialization into the per-key carry-in
    *   window over the buckets themselves. The shard count is observed
    *   during the caller's action and reported through
    *   `onSaltDiagnostic` (default: a WARN log when buckets-per-key
    *   exceeds `degenerateBucketsPerKey`). Results are identical to the
    *   unsalted path (randomized spec asserts it).
    * @param degenerateBucketsPerKey buckets-per-key bound above which the
    *   diagnostic flags the width as degenerate (default 10⁵)
    * @param onSaltDiagnostic override the default WARN-log sink for the
    *   salt diagnostic (invoked asynchronously after the first action on
    *   the result; tests use it to assert the warning path). The
    *   listener unregisters itself after it fires; a salted frame that
    *   is built but never acted on leaves one idle listener behind —
    *   negligible unless thousands of result frames are discarded
    *   unexecuted. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payloadCols: Seq[String],
               prefix: String = "asof_",
               saltBucketWidth: Option[Long] = None,
               degenerateBucketsPerKey: Long = 100000L,
               onSaltDiagnostic: Option[SaltDiagnostic => Unit] = None): DataFrame = {
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
    val u = l2.unionByName(r2)
    val carried = saltBucketWidth match {
      case None =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(timeCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      case Some(width) =>
        require(width > 0, "saltBucketWidth must be positive")
        val b = u.withColumn("_bkt", expr(s"$timeCol div $width"))
        // pass 1: carry WITHIN each (key, bucket) shard — the hot key's
        // |L|+|R| sort is now #buckets independent sorts
        val wIn = Window.partitionBy(col(keyCol), col("_bkt"))
          .orderBy(col(timeCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val within = b.withColumn("_in",
          last(col("_asof"), ignoreNulls = true).over(wIn))
        // pass 2: per-bucket summaries (#(key,bucket) rows, not #rows).
        // A bucket with right rows summarizes to its LAST right payload
        // (same (time, side) order as the window); running last-ignoreNulls
        // over STRICTLY EARLIER buckets is the bucket's carry-in — found
        // even across right-free gap buckets.
        val sums = b.filter(col("_side") === 0)
          .groupBy(col(keyCol), col("_bkt"))
          .agg(max_by(col("_asof"), struct(col(timeCol))).as("_blast"))
        // joins below are NULL-SAFE: the unsalted window groups null keys
        // (and null times → null buckets) into partitions like any other
        // value, so the salted path must match them too — a plain equi-
        // join would silently drop every null-key/null-time left row
        val kb = b.select(col(keyCol).as("_ck"), col("_bkt").as("_cb"))
          .distinct()
        // degenerate-width guard: observe the shard count during the
        // caller's own action (CollectMetrics piggybacks on the distinct
        // — no extra job, no extra shuffle) and report through a one-shot
        // listener. See the saltBucketWidth doc for the width formula.
        val obsName = s"graft.asof.salt.${saltObsCounter.incrementAndGet()}"
        val kbObserved = kb.observe(obsName,
          count(lit(1)).as("n_buckets"),
          approx_count_distinct(col("_ck")).as("n_keys"))
        val session = left.sparkSession
        val bound = degenerateBucketsPerKey
        val sink = onSaltDiagnostic.getOrElse { d: SaltDiagnostic =>
          if (d.degenerate) log.warn(
            s"asofJoin saltBucketWidth=$width produced ${d.nBuckets} " +
              s"(key, bucket) shards over ~${d.nKeys} keys — " +
              s">${bound}/key, the carry-in window is re-serializing; " +
              "widen the bucket (width ~ time_range / 10^2..10^4)")
        }
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.get(obsName).foreach { row =>
              val nBuckets = row.getLong(0)
              val nKeys = math.max(row.getLong(1), 1L)
              sink(SaltDiagnostic(nKeys, nBuckets,
                nBuckets > bound * nKeys))
              session.listenerManager.unregister(this)
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        }
        session.listenerManager.register(listener)
        val carryIn = kbObserved
          .join(sums, col("_ck") <=> sums(keyCol) && col("_cb") <=> sums("_bkt"),
            "left")
          .withColumn("_carry",
            last(col("_blast"), ignoreNulls = true).over(
              Window.partitionBy(col("_ck")).orderBy(col("_cb").asc)
                .rowsBetween(Window.unboundedPreceding, -1)))
          .select(col("_ck"), col("_cb"), col("_carry"))
        within.join(carryIn,
            col(keyCol) <=> col("_ck") && col("_bkt") <=> col("_cb"))
          .withColumn("_asof", coalesce(col("_in"), col("_carry")))
          .select(u.columns.map(col).toIndexedSeq: _*) // original column order
    }
    val out = payloadCols.foldLeft(carried.filter(col("_side") === 1)) {
      (df, c) => df.withColumn(prefix + c, col(s"_asof.$c"))
    }
    out.drop("_asof", "_side")
  }
}
