package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Exact-substring duplicate-span semantics (t29, the Lee-et-al
  * ExactSubstr accounting): golden island geometry on a hand corpus —
  * overlap merge, adjacency merge at exactly gap = n, a break at
  * gap = n+1, same-doc repetition counting toward the corpus
  * threshold, and sub-n docs excluded. */
class DupSpanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def goldenDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dupspan").toString
    // gram occurrences (n = 4): "a b c d" appears at d0p1, d1p2, d2p1,
    // d2p7 (same-doc repeat — must count toward the threshold), d4p1,
    // d4p5; "b c d e" at d0p2, d1p3. Everything else is unique.
    Seq(
      (0L, "a b c d e f g h", "en", "s0", 15L),
      (1L, "x a b c d e y z", "en", "s0", 15L),
      (2L, "a b c d q q a b c d", "en", "s1", 19L),
      (3L, "m n o p", "en", "s1", 7L), // one gram, unique → no row
      (4L, "a b c d a b c d", "en", "s1", 15L), // gap exactly 4 → merge
      (5L, "x y", "en", "s1", 3L), // sub-n doc: no grams at all
      (6L, null: String, "en", "s1", 0L) // null text survives
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("t29: island merge/break geometry on a golden corpus") {
    val out = SparkEntry
      .queries("t29_dup_span_islands")(spark, goldenDir())
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("max_island"))))
      .toMap
    // d0: dup positions 1,2 (gap 1 — overlap merge) → one island
    // covering [1, 5]
    assert(out(0L) === ((1L, 5L, 5L)))
    // d1: positions 2,3 → [2, 6]
    assert(out(1L) === ((1L, 5L, 5L)))
    // d2: positions 1,7 — gap 6 > n → TWO islands [1,4] and [7,10]
    assert(out(2L) === ((2L, 8L, 4L)))
    // d4: positions 1,5 — gap exactly n=4 (the covered spans [1,4] and
    // [5,8] are adjacent) → ONE island [1,8], the whole doc
    assert(out(4L) === ((1L, 8L, 8L)))
    // unique-gram, sub-n, and null docs produce no rows
    assert(out.keySet === Set(0L, 1L, 2L, 4L))
  }

  test("t30: excision cuts exactly the island tokens, in order") {
    def m(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val out = SparkEntry
      .queries("t30_dup_span_excision")(spark, goldenDir())
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("kept_hash"))))
      .toMap
    // d0 cuts [1,5] keeping "f g h"; d1 cuts [2,6] keeping "x y z"
    assert(out(0L) === ((3L, m("f g h"))))
    assert(out(1L) === ((3L, m("x y z"))))
    // d2 cuts [1,4] and [7,10], keeping the middle "q q"
    assert(out(2L) === ((2L, m("q q"))))
    // island-free docs keep everything (d3 whole, d5 sub-n)
    assert(out(3L) === ((4L, m("m n o p"))))
    assert(out(5L) === ((2L, m("x y"))))
    // d4 is fully covered — excised out of the cleaned corpus; the
    // null-text d6 never enters
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 5L))
  }

  test("t31: only eval-overlapping spans are cut, eval docs stay out") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-surgical").toString
    // doc 17 IS the eval slice (doc_id % 100 == 17); doc 1 quotes its
    // 4-gram "c d e f" at position 3; doc 2 shares nothing
    Seq(
      (17L, "c d e f", "en", "s0", 7L),
      (1L, "a b c d e f g h", "en", "s0", 15L),
      (2L, "t u v w x y", "en", "s0", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("t31_surgical_decontaminate")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("cut_tokens"),
          r.getAs[Long]("max_island"))))
      .toMap
    // doc 1 cuts exactly [3, 6]; the eval doc and the clean doc are
    // not in the cut report
    assert(out === Map(1L -> ((1L, 4L, 4L))))
  }

  test("charGrams mode: islands are character spans matching shared " +
      "substrings; minIslandLen drops sub-threshold matches") {
    import spark.implicits._
    // a 30-char string S shared by docs 10 and 11 (no internal
    // 20-char period, so grams repeat only ACROSS the docs), plus a
    // doc 12 sharing nothing 20 chars long
    val S = "abcdefghijklmnopqrstuvwxyz!@#$"
    assert(S.length === 30)
    val docs = Seq(
      (10L, "zzzzz" + S + "qqqqq"),
      (11L, S + "kkkkkkkk"),
      (12L, "completely different content here")
    ).toDF("doc_id", "text")
    val islands = graft.ext.Dedup.dupSpanIslands(docs, "doc_id", "text",
        n = 20, minCount = 2L, minIslandLen = 0, charGrams = true)
      .collect().map(r => (r.getLong(0),
        r.getAs[Number]("st").longValue, r.getAs[Number]("en").longValue))
      .toSeq.sortBy(_._1)
    // doc 10: S occupies chars 6..35; doc 11: chars 1..30 — the
    // island is EXACTLY the shared substring, in character positions
    assert(islands === Seq((10L, 6L, 35L), (11L, 1L, 30L)))
    // the fidelity knob: a 31-char minimum drops the 30-char match
    // (Lee et al.'s ≥50-byte threshold is this knob at paper scale)
    assert(graft.ext.Dedup.dupSpanIslands(docs, "doc_id", "text",
        n = 20, minCount = 2L, minIslandLen = 31,
        charGrams = true).count() === 0L)
    assert(graft.ext.Dedup.dupSpanIslands(docs, "doc_id", "text",
        n = 20, minCount = 2L, minIslandLen = 30,
        charGrams = true).count() === 2L)
  }

  test("minIslandLen in word mode keeps only long-enough islands") {
    val dir = goldenDir()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // golden geometry (t29 test): islands of token length 5,5,4,4,8 —
    // a 5-token floor keeps the two 5s and the 8, drops the 4s
    val kept = graft.ext.Dedup.dupSpanIslands(docs, "doc_id", "text",
        n = 4, minCount = 2L, minIslandLen = 5)
      .collect().map(r => (r.getLong(0),
        r.getAs[Number]("en").longValue -
          r.getAs[Number]("st").longValue + 1)).toSeq.sorted
    assert(kept === Seq((0L, 5L), (1L, 5L), (4L, 8L)))
  }

  test("positionalShingles preserves positions and nulls the partials") {
    import spark.implicits._
    val r = Seq(Tuple1("a b c d e"))
      .toDF("text")
      .select(TextAnalysis
        .positionalShingles(split(col("text"), " "), 3).as("g"))
      .as[Seq[String]].head()
    // element i (0-based) = the 3-gram starting at word i+1; the
    // trailing 2 partial windows are NULL, and length stays = n_words
    assert(r === Seq("a b c", "b c d", "c d e", null, null))
  }
}
