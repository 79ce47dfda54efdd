package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, VectorIndex}
import graft.sources.{FileManifest, History}

/** The maintenance daemon's tick RACED against concurrent writers —
  * the one concurrency surface the shared replay driver
  * ([[graft.ext.IndexReplay.tickWindow]]) exposes. Interleavings are
  * forced with the one-shot `testRaceHook`, fired inside the first
  * manifest commit's read→publish window exactly where a wall-clock
  * race would land.
  *
  * Contract under test: a tick SERIALIZES against foreign commits on
  * the source lake (it applies only the window it resolved at entry —
  * pinned reads, pinned feed — and the next tick catches up), and a
  * foreign commit that touches the tick's OWN derived lake either
  * rebases (disjoint) or conflicts loudly; a loud crash mid-window
  * must then replay to convergence (undo-then-apply). */
class IndexTickRaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dim = 4

  private def vec(id: Long): Array[Float] = {
    val r = new scala.util.Random(id * 7919L + 13L)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  private def corpusDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (id, vec(id))).toDF("vec_id", "embedding")
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def mkLakes(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-tickrace").toString
    val corpus = s"$base/corpus"
    corpusDf(0L until 60L).repartition(3).write.parquet(corpus)
    History.enableManifests(spark, corpus): Unit
    History.enableShardedManifests(spark, corpus): Unit
    (corpus, s"$base/index")
  }

  private def centroidsOf(corpus: String) =
    History.readPinned(spark, corpus).filter(col("vec_id") % 11 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .persist()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "b_id", "rank", "cos_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  private def assertSearchExact(corpus: String, index: String,
                                cent: org.apache.spark.sql.DataFrame): Unit = {
    val queries = History.readPinned(spark, corpus)
      .filter(col("vec_id") % 10 === 0)
    val got = rows(VectorIndex.searchTopK(spark, index, queries,
      "vec_id", "embedding", cent, k = 3))
    val want = rows(Similarity.ivfTopK(History.readPinned(spark, corpus),
      queries, cent, "vec_id", "embedding", 3))
    assert(got === want && got.nonEmpty)
  }

  test("a foreign corpus commit inside the tick window serializes") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    History.deleteKeysDV(spark, corpus, "vec_id", Seq(3L, 17L)): Unit
    History.append(spark, corpus, corpusDf(100L until 106L),
      key = "b2"): Unit
    val toResolved =
      FileManifest.latestVersion(fsOf(corpus), corpus).get
    // a writer lands a NEW corpus batch inside the tick's first commit
    // window (the postings takedown) — after the tick resolved its
    // (from, to) window
    FileManifest.testRaceHook = Some(() =>
      History.append(spark, corpus, corpusDf(200L until 204L),
        key = "race-batch"): Unit)
    val (v, nDel, nIns) = VectorIndex.tick(spark, corpus, index,
      "vec_id", "embedding", cent)
    assert(FileManifest.testRaceHook.isEmpty, "hook must be consumed")
    // the tick applied EXACTLY its resolved window — not the racer's
    // batch (an unpinned tick would half-apply it and the next window's
    // net feed would never re-touch those ids)
    assert(v === toResolved && nDel === 2L && nIns === 6L)
    // the racer's commit is a later version; the NEXT tick mirrors it
    val (v2, nDel2, nIns2) = VectorIndex.tick(spark, corpus, index,
      "vec_id", "embedding", cent)
    assert(v2 > v && nDel2 === 0L && nIns2 === 4L)
    assertSearchExact(corpus, index, cent)
  }

  test("a foreign commit on the DERIVED lake conflicts loudly; replay converges") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    History.deleteKeysDV(spark, corpus, "vec_id",
      Seq(3L, 17L, 30L)): Unit
    History.append(spark, corpus, corpusDf(100L until 108L),
      key = "b2"): Unit
    // a rogue second agent retires the postings files inside the
    // tick's takedown commit window: the tick's DV commit derived from
    // the pre-race file set, so OCC must refuse it — loudly, never by
    // silently attaching a vector to a retired file
    val pdir = VectorIndex.postingsDir(index)
    val victims = FileManifest.latest(fsOf(pdir), pdir).get.cur
    FileManifest.testRaceHook = Some(() =>
      FileManifest.commitDelta(fsOf(pdir), pdir, Nil, victims): Unit)
    intercept[Exception] {
      VectorIndex.tick(spark, corpus, index, "vec_id", "embedding", cent)
    }
    assert(FileManifest.testRaceHook.isEmpty, "hook must be consumed")
    // the crashed tick left no marker — the window is still open
    val marker = VectorIndex.indexedVersion(spark, index)
    assert(marker.isDefined &&
      marker.get < FileManifest.latestVersion(fsOf(corpus), corpus).get,
      "a crashed tick must not advance the marker")
    // replay: restore the single-agent world (undo the rogue
    // retirement — a real index has exactly one owner), then the
    // undo-then-apply replay converges on the corpus' truth
    FileManifest.commitDelta(fsOf(pdir), pdir, victims, Nil): Unit
    val (v, _, _) = VectorIndex.tick(spark, corpus, index,
      "vec_id", "embedding", cent)
    assert(v === FileManifest.latestVersion(fsOf(corpus), corpus).get)
    assertSearchExact(corpus, index, cent)
  }
}
