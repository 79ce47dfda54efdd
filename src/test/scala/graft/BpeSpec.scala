package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** Real BPE as an at-rest artifact: the exact chained-replace
  * segmentation (unit-boundary safety, adjacency exactness,
  * same-symbol runs), the reference trainer's deterministic merges,
  * the artifact round-trip, and the packing re-denomination hook. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def seg(text: String,
                  merges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(Bpe.tokens(col("t"), merges).as("u"))
      .collect()(0).getSeq[String](0)
  }

  test("segmentation applies merges in order through dependent rules") {
    // hello: h e l l o </w> → (l,l) → (e,ll) → (h,ell) → hell o </w>
    assert(seg("hello",
        Seq(("l", "l"), ("e", "ll"), ("h", "ell"))) ===
      Seq("hell", "o", "</w>"))
  }

  test("same-symbol runs merge greedily left-to-right (the " +
      "separator-consumption case)") {
    // a a a a </w> under (a,a): greedy pairs (1,2),(3,4) → aa aa </w>
    // — single-space replace would skip the second occurrence
    assert(seg("aaaa", Seq(("a", "a"))) === Seq("aa", "aa", "</w>"))
    // odd run: aa aa a </w>
    assert(seg("aaaaa", Seq(("a", "a"))) === Seq("aa", "aa", "a", "</w>"))
  }

  test("back-to-back distinct-pair occurrences all merge in one pass") {
    assert(seg("abab", Seq(("a", "b"))) === Seq("ab", "ab", "</w>"))
  }

  test("unit boundaries are safe: a rule never matches inside longer " +
      "units") {
    // after (a,t) both words hold an 'at' unit; rule (t, h) must NOT
    // fire across the "at h" unit boundary in "at ha"
    assert(seg("at ha", Seq(("a", "t"), ("t", "h"))) ===
      Seq("at", "</w>", "h", "a", "</w>"))
  }

  test("merges never cross word boundaries; </w> merges are legal") {
    // (b, a) never matches across "ab ab" (the </w> unit intervenes)
    assert(seg("ab ab", Seq(("b", "a"))) ===
      Seq("a", "b", "</w>", "a", "b", "</w>"))
    // (b, </w>) is the standard end-of-word merge
    assert(seg("ab ab", Seq(("b", "</w>"))) ===
      Seq("a", "b</w>", "a", "b</w>"))
  }

  test("normalization: lowercase, letters-only, empty words dropped; " +
      "null/letterless text counts zero") {
    import spark.implicits._
    assert(seg("He!!o  42 world", Nil) ===
      Seq("h", "e", "o", "</w>", "w", "o", "r", "l", "d", "</w>"))
    val counts = Seq(Some("ab"), Some("!!!"), None)
      .toDF("t")
      .select(Bpe.tokenCount(col("t"), Nil).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(counts === Seq(3L, 0L, 0L))
  }

  test("the reference trainer learns deterministic corpus merges") {
    import spark.implicits._
    val docs = Seq("the the the cat").toDF("text")
    // pair counts round 1: (t,h)=3, (h,e)=3, (e,</w>)=3, plus cat's —
    // ties break (count desc, left asc, right asc): e < h < t
    assert(Bpe.train(docs, "text", 3) ===
      Seq(("e", "</w>"), ("h", "e</w>"), ("t", "he</w>")))
  }

  test("the demo vocab is the trainer's output shape (rank-ordered, " +
      "no cross-marker rules)") {
    assert(Bpe.demoMerges.nonEmpty)
    assert(Bpe.demoMerges.forall(_._1 != "</w>"),
      "a rule merging ACROSS the word marker would glue words")
    // every rule's symbols are buildable from characters + earlier
    // merges — the well-formedness of a real merges table
    val known = scala.collection.mutable.Set.empty[String]
    Bpe.demoMerges.foreach { case (l, r) =>
      def ok(s: String) = s == "</w>" || s.length == 1 || known(s)
      assert(ok(l) && ok(r), s"rule ($l, $r) uses an unbuildable symbol")
      known += (l + r): Unit
    }
  }

  test("artifact round-trip: versioned publish, pointer flip, reload") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-art").toString + "/merges"
    Bpe.saveMerges(spark, Bpe.demoMerges.take(5), dir)
    assert(Bpe.loadMerges(spark, dir) === Bpe.demoMerges.take(5))
    // republish: the pointer flips to the newest table
    Bpe.saveMerges(spark, Bpe.demoMerges, dir)
    assert(Bpe.loadMerges(spark, dir) === Bpe.demoMerges)
  }

  test("packing re-denominates in BPE tokens through the countTokens " +
      "hook") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa", "x"), (2L, "aaaa aaaa", "x"))
      .toDF("doc_id", "text", "lang")
    val packed = graft.ext.Packing.packBins(docs, "doc_id", "text",
        "lang", lit(0L), seqLen = 4L,
        countTokens = t => Bpe.tokenCount(t, Seq(("a", "a"))))
      .select("doc_id", "n_tokens", "start", "bin_first", "bin_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    // doc1: aa aa </w> = 3 BPE tokens (whitespace would say 1);
    // doc2: 6 tokens starting at offset 3 → bins 0..2 with seqLen 4
    assert(packed === Seq((1L, 3L, 0L, 0L, 0L), (2L, 6L, 3L, 0L, 2L)))
  }
}
