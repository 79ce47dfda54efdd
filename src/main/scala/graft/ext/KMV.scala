package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) bottom-k sketches: the mergeable distinct-count
  * sketch that — unlike HLL (`graft/functions/HyperLogLog`) — also
  * supports SET OPERATIONS: two sketches merge by keeping the k smallest
  * of their union, and the Jaccard of the underlying sets is estimated
  * from the merged sketch (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007). A training-data
  * pipeline uses this to cheaply estimate cross-source vocabulary /
  * document overlap before committing to a full dedup pass.
  *
  * Determinism: the "random" hash is the first 48 bits of md5 — 48 so the
  * value is exact in an IEEE double (2⁴⁸ < 2⁵³) and every estimate is an
  * integer-derived ratio that DuckDB reproduces bit-for-bit (the same
  * rule the MinHash/cosine oracles follow).
  *
  * 100 TB shape: a sketch is ONE hash-shuffle on the group key with
  * every partial buffer bounded at k longs (typed bounded aggregator —
  * no pre-distinct pass and no per-group window sort of the distinct
  * stream); pairwise stages operate on G·k sketch rows, never on corpus
  * rows — the per-pair merge windows see at most 2k rows each.
  */
object KMV {

  /** 48-bit md5 prefix as a non-negative bigint — exact in a double.
    * Native [[graft.functions.Md5Prefix]]: value-identical to
    * `conv(substring(md5(c),1,12),16,10)` (what the oracle computes)
    * without the per-word hex-string/substring/radix-parse
    * allocations. */
  def hash48(c: Column): Column =
    graft.functions.Md5Prefix.md5_prefix(c, 12)

  val hashSpace: Double = 281474976710656.0 // 2^48

  /** Bottom-k sketch per group: the k smallest distinct `hash48(value)`
    * per `groupCol`, ranked ascending (`rn` 1..k).
    *
    * Built with the bounded NATIVE aggregate
    * [[graft.functions.BottomKAgg]] (`TypedImperativeAggregate`), NOT a
    * per-group window sort: a window would drag every group's full
    * distinct-hash stream through one task (the window-argmax trap),
    * while the aggregate's partial buffers carry at most k longs per
    * group through the one shuffle. The buffer dedups on insert (KMV is
    * over the distinct hash SET; two occupancy slots for one value
    * would corrupt θ_k), so the input needs no pre-distinct pass. The
    * native form evaluates its child directly on `InternalRow`s — the
    * earlier typed-`Aggregator` formulation paid an encoder round-trip
    * per input row (~4× the whole-gate time at sf0.1). The group key is
    * coerced to string in the output (the gates' keys are strings
    * already). */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
             k: Int): DataFrame =
    df.select(col(groupCol).cast("string").as(groupCol),
      hash48(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.BottomK.bottom_k(col("h"), k).as("hs"))
      .select(col(groupCol), posexplode(col("hs")).as(Seq("p", "h")))
      .select(col(groupCol), col("h"), (col("p") + 1).cast("int").as("rn"))

  /** [[sketch]] over a TOKENIZED corpus, one input row per DOCUMENT
    * (r21 optimization, guide §4 per-row work / §2 volume): the value
    * column is an ARRAY of strings (e.g. `split(text, ' ')`) hashed
    * in-place with a higher-order `transform`, and [[
    * graft.functions.BottomKAgg]] folds each element into its bounded
    * buffer directly — the hot path's row count is the DOC count, not
    * the token count; no Generate/explode ever materializes a
    * token-per-row stream. Output and semantics are identical to
    * `sketch(explode(tokens))`: a null array (null text) contributes
    * nothing, exactly as `explode(null)` emits no rows, and the buffer
    * dedups on insert either way. */
  def sketchTokens(df: DataFrame, groupCol: String, tokensCol: Column,
                   k: Int): DataFrame =
    df.select(col(groupCol).cast("string").as(groupCol),
      transform(tokensCol, w => hash48(w)).as("hsa"))
      .groupBy(col(groupCol))
      .agg(graft.functions.BottomK.bottom_k(col("hsa"), k).as("hs"))
      .select(col(groupCol), posexplode(col("hs")).as(Seq("p", "h")))
      .select(col(groupCol), col("h"), (col("p") + 1).cast("int").as("rn"))

  /** Distinct-count estimate per group: (k−1)·2⁴⁸/θ_k where θ_k is the
    * k-th smallest hash; a group holding fewer than k distinct values
    * reports its exact count (the sketch IS the set). */
  def estimateDistinct(sk: DataFrame, groupCol: String, k: Int): DataFrame =
    sk.groupBy(col(groupCol))
      .agg(max(col("rn")).as("n"),
        max(when(col("rn") === k, col("h"))).as("theta"))
      .select(col(groupCol),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(
            lit((k - 1) * hashSpace) / col("theta").cast("double"), 6))
          .as("est_distinct"))

  /** Pairwise Jaccard estimate between every two groups: merge the two
    * sketches (k smallest of the union), count merged values present in
    * BOTH input sketches — J ≈ |both| / |merged|. Exact integer ratio →
    * cross-engine-stable double.
    *
    * Single-pass shape: each union row carries in_a/in_b origin flags
    * folded by one (a,b,h) aggregation (which IS the distinct), then the
    * per-pair bottom-k window and ONE final groupBy compute |merged| and
    * |both| together. The earlier formulation materialized `merged`
    * into two branches and re-joined the sketch twice for the
    * both-membership test — three extra shuffles of the same G·k rows. */
  def pairwiseJaccard(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val av = sk.select(col(groupCol).as("a_src"), col("h"))
    val bv = sk.select(col(groupCol).as("b_src"), col("h"))
    val groupPairs = av.select(col("a_src")).distinct()
      .join(bv.select(col("b_src")).distinct(), col("a_src") < col("b_src"))
    val tagged = groupPairs.join(av, Seq("a_src"))
      .select(col("a_src"), col("b_src"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .union(groupPairs.join(bv, Seq("b_src"))
        .select(col("a_src"), col("b_src"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("a_src"), col("b_src"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wp = Window.partitionBy(col("a_src"), col("b_src"))
      .orderBy(col("h").asc)
    tagged.withColumn("mrn", row_number().over(wp))
      .filter(col("mrn") <= k)
      .groupBy(col("a_src"), col("b_src"))
      .agg(count(lit(1)).as("mk"),
        sum((col("in_a") === 1 && col("in_b") === 1).cast("long")).as("m"))
      .select(col("a_src"), col("b_src"),
        (col("m").cast("double") / col("mk").cast("double"))
          .as("kmv_jaccard"))
  }
}
