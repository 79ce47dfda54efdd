package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}

/** Incremental dedup admission as a continuously-ingesting pipeline:
  * each batch is admitted against the ACCUMULATED band table, and only
  * the admitted docs' bands are appended — the corpus text is never
  * revisited. */
class DedupIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def bandsOf(df: DataFrame): DataFrame = {
    val sh = df.select(col("doc_id"),
      explode(TextAnalysis.wordShingles(col("text"), 3)).as("shingle"))
    Dedup.lshBands(Dedup.minhashSignatures(sh, "doc_id", 8), "doc_id", 8, 2)
  }

  test("continuous ingestion: admit, append bands, never re-read the corpus") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val bandDir = java.nio.file.Files
      .createTempDirectory("graft-band-table").toString + "/bands"
    def corpusBands: DataFrame =
      if (new java.io.File(bandDir).exists()) spark.read.parquet(bandDir)
      else Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "bkey")
    def admit(batch: DataFrame): Set[Long] = {
      val bands = bandsOf(batch)
      val kept = Dedup.incrementalKeep(bands, corpusBands, "doc_id")
      bands.join(kept, Seq("doc_id"), "left_semi")
        .write.mode("append").parquet(bandDir)
      kept.collect().map(_.getLong(0)).toSet
    }
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "completely different content about distributed query engines and shuffles"
    val tC = "a third unrelated document discussing parquet row group statistics"
    val tD = "yet another one on watermark semantics in structured streaming jobs"
    // batch 1: two distinct docs → both admitted
    assert(admit(Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")) ===
      Set(1L, 2L))
    // batch 2: an exact near-dup of doc 1 (same bands) is rejected by
    // the band table; the new doc is admitted
    assert(admit(Seq((10L, tA), (11L, tC)).toDF("doc_id", "text")) ===
      Set(11L))
    // batch 3: dup-of-corpus rejected, intra-batch dup pair keeps min id
    assert(admit(Seq((20L, tC), (21L, tD), (22L, tD))
      .toDF("doc_id", "text")) === Set(21L))
    // the accumulated band table holds exactly the admitted docs
    assert(spark.read.parquet(bandDir).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L, 21L))
  }

  test("replay against a corpus already holding the batch's own bands converges") {
    import spark.implicits._
    // the streaming crash window: bands of batch N were published, the
    // admitted docs were NOT yet delivered, and the batch replays — the
    // probe must not collide admitted docs with their OWN bands (that
    // would admit nothing and lose the batch), while a true near-dup of
    // ANOTHER corpus doc must still be dropped
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten eleven"
    val batch = Seq((10L, tA), (20L, tB)).toDF("doc_id", "text")
    val bands = bandsOf(batch)
    // corpus = exactly this batch's published bands (the replay state);
    // excludeSelf is the REPLAY-mode switch StreamingDedup flips when
    // it detects the batch's bands already published
    val keptReplay = Dedup.incrementalKeep(bands, bands, "doc_id",
        excludeSelf = true)
      .collect().map(_.getLong(0)).toSet
    assert(keptReplay === Set(10L, 20L), s"replay lost docs: $keptReplay")
    // same text under a DIFFERENT id is still a near-dup → dropped,
    // even in replay mode
    val imposter = Seq((99L, tA)).toDF("doc_id", "text")
    val keptImposter = Dedup.incrementalKeep(bandsOf(imposter), bands,
      "doc_id", excludeSelf = true).collect().map(_.getLong(0)).toSet
    assert(keptImposter === Set.empty, s"imposter admitted: $keptImposter")
    // and OUTSIDE replay mode (the default), an at-least-once upstream
    // re-delivering the SAME id in a later batch is a duplicate → drop
    val redelivered = Dedup.incrementalKeep(bandsOf(batch), bands,
      "doc_id").collect().map(_.getLong(0)).toSet
    assert(redelivered === Set.empty, s"redelivery admitted: $redelivered")
  }

  test("releaseBacking reclaims reliable checkpoint files after admission") {
    import spark.implicits._
    val sc = spark.sparkContext
    val savedCkpt = sc.getCheckpointDir
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-reliable-ckpt").toString
    sc.setCheckpointDir(ckptDir)
    try {
      val incoming = bandsOf(Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "another document with sufficiently different token content"))
        .toDF("doc_id", "text"))
      val corpus = Seq.empty[(Long, Int, String)]
        .toDF("doc_id", "band", "bkey")
      val kept = Dedup.incrementalKeep(incoming, corpus, "doc_id",
        reliable = true)
      assert(kept.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
      def ckptFiles(): Seq[java.nio.file.Path] = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .toList
        } finally s.close()
      }
      // the surviving-band + final-label checkpoints live on disk and
      // would outlive the JVM without the explicit release path
      assert(ckptFiles().nonEmpty)
      Dedup.releaseBacking(kept)
      assert(ckptFiles().isEmpty,
        ckptFiles().map(_.toString).mkString(","))
    } finally savedCkpt match {
      case Some(d) => sc.setCheckpointDir(d)
      case None => () // leave the temp dir set; no API to unset
    }
  }

  test("incremental admission survives degenerate docs (null/empty/one-word)") {
    import spark.implicits._
    val incoming = Seq(
      (1L, Option("normal enough text with several distinct words here")),
      (2L, Option(null.asInstanceOf[String])),
      (3L, Option("")),
      (4L, Option("word"))
    ).toDF("doc_id", "text")
    val corpus = Seq((100L, "an existing corpus document about something"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalKeep(bandsOf(incoming), bandsOf(corpus),
      "doc_id").collect().map(_.getLong(0)).toSet
    // doc 2's null text hashes to null band keys, which equi-join to
    // nothing — no duplication evidence, so it is admitted like the
    // empty/one-word docs (each shingles to its own literal text)
    assert(kept === Set(1L, 2L, 3L, 4L))
  }
}
