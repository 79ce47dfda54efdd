package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Packing

/** Edge cases of the packing/budget stream semantics the SF gates'
  * data cannot exercise: null text, empty text, zero-token placement,
  * and a document larger than the sequence length spanning many bins. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "stratum", "text")
  }

  test("packBins: nulls, empties, and oversized docs place exactly") {
    // stream (one stratum, one shard), in id order:
    //   id 1: "a b c"   → 3 tokens, start 0
    //   id 2: null      → 0 tokens, start 3
    //   id 3: ""        → 1 token (split parity), start 3
    //   id 4: 10 tokens → start 4, spans bins 1..3 at seqLen 4
    //   id 5: "x"       → start 14, bin 3
    val d = docs(
      (1L, "s", "a b c"),
      (2L, "s", null),
      (3L, "s", ""),
      (4L, "s", (1 to 10).map(i => s"w$i").mkString(" ")),
      (5L, "s", "x"))
    val got = Packing.packBins(d, "id", "text", "stratum", lit(0L),
        seqLen = 4L)
      .select("id", "n_tokens", "start", "bin_first", "bin_last", "n_bins")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 0L, 3L, 0L, 0L, 1L), // zero tokens: degenerate single bin
      (3L, 1L, 3L, 0L, 0L, 1L),
      (4L, 10L, 4L, 1L, 3L, 3L), // oversized: spans three sequences
      (5L, 1L, 14L, 3L, 3L, 1L)))
    // stream invariant: final offset equals the total token count
    assert(got.map(_._2).sum === 15L)
    assert(got.last._3 + got.last._2 === 15L)
  }

  test("tokenBudget: the boundary doc is included, later docs are not") {
    val d = docs(
      (1L, "s", "a b c"), // start 0
      (2L, "s", "d e"),   // start 3 — crosses the 4-token budget: KEPT
      (3L, "s", "f"))     // start 5 — past it: dropped
    val kept = Packing.tokenBudget(d, "id", "text", "stratum", lit(0L),
        budget = 4L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 2L))
  }

  test("independent (stratum, shard) streams never interact") {
    val d = docs(
      (1L, "s1", "a b c d e f"),
      (2L, "s2", "a b c d e f"),
      (3L, "s1", "g h"),
      (4L, "s2", "g h"))
    // shard by id parity: four singleton-or-pair streams
    val got = Packing.packBins(d, "id", "text", "stratum",
        pmod(col("id"), lit(2L)), seqLen = 4L)
      .select("id", "start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // 1 and 3 share (s1, odd-id? 1%2=1, 3%2=1) → 3 starts after 1;
    // 2 and 4 share (s2, 0) → 4 starts after 2
    assert(got === Seq((1L, 0L), (2L, 0L), (3L, 6L), (4L, 6L)))
  }
}
