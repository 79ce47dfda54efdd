package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Degenerate-corpus robustness: one null, empty, whitespace, or
  * single-word document must never fail a whole 100 TB job. Every text
  * operator is evaluated over the pathological rows and must produce a
  * row (not throw) for each. */
class TextRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val pathological = {
    import spark.implicits._
    Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "word"),
      (5L, "two words"), (6L, "a b c d e f normal document here"))
      .toDF("doc_id", "text")
  }

  test("text operators survive null/empty/whitespace/single-word docs") {
    val df = pathological.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.predictedLang(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.redactPii(col("text")).as("redacted"),
      TextAnalysis.wordShingles(col("text"), 3).as("grams"),
      TextAnalysis.tokenChunks(col("text"), 4, 1).as("chunks"))
    val rows = df.collect()
    assert(rows.length === 6) // nothing threw, every doc produced a row
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // null text: chunks guarded to empty (the round-2 advisory bug:
    // sequence(0, -2, step) threw and failed the job on one null doc)
    assert(byId(1L).getAs[Seq[String]]("chunks") === Seq.empty)
    // short docs chunk to one whole-text chunk, never throw
    assert(byId(4L).getAs[Seq[String]]("chunks") === Seq("word"))
    // repetitionRatio over the projected gram column survives the
    // degenerate rows too (null grams for null text)
    val rep = pathological
      .select(col("doc_id"),
        TextAnalysis.wordShingles(col("text"), 2).as("g"))
      .select(col("doc_id"), TextAnalysis.repetitionRatio(col("g")).as("r"))
      .collect()
    assert(rep.length === 6)
  }

  test("as-of join: at-or-before semantics, ties, and missing matches") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 100L, 20L), (1L, 40L, 21L), (1L, 90L, 22L))
      .toDF("user_id", "ts", "event_id")
    val out = graft.ext.AsOf.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_event_id"))).toMap
    assert(out(10L) === Some(20L)) // tie: view AT the click's ts is taken
    assert(out(11L) === Some(21L)) // 40 <= 50 < 90: earlier view wins
    assert(out(12L) === None)      // user 2 has no views at all
  }

  test("interval join: boundary inclusivity, bucket spans, and plan shape") {
    import spark.implicits._
    val pts = Seq((1L, 0L), (2L, 100L), (3L, 150L), (4L, 151L), (5L, 250L))
      .toDF("pid", "ts")
    // interval [100, 150] crosses the bucket-100 grid boundary
    val ivs = Seq((10L, 100L, 150L), (11L, 240L, 260L))
      .toDF("iid", "lo", "hi")
    val out = graft.ext.RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi",
      bucketWidth = 100L)
    val got = out.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100 and 150 are both INSIDE (inclusive bounds); 151 is not; the
    // cross-bucket point 150 is found because the interval exploded
    // into both buckets; 250 lands in [240,260]
    assert(got === Set((2L, 10L), (3L, 10L), (5L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("dedup pipeline survives a corpus containing degenerate docs") {
    import graft.ext.Dedup
    val shingled = pathological.select(col("doc_id"),
      explode(TextAnalysis.wordShingles(col("text"), 2)).as("shingle"))
    val sigs = Dedup.minhashSignatures(shingled, "doc_id", 4)
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(sigs, "doc_id", 4, 2), "doc_id")
    assert(pairs.count() >= 0) // runs end-to-end, no throw
  }
}
