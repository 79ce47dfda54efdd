package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, VectorIndex}
import graft.sources.{FileManifest, History}

/** Incrementally-maintained IVF index: bootstrap once, advance per
  * corpus commit from the change feed (merge-on-read takedowns on the
  * postings, exactly-once cell-assigned appends), and every search
  * over the maintained lists must equal the one-shot IVF pipeline run
  * fresh over the corpus' current image. */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dim = 4

  private def vec(id: Long): Array[Float] = {
    // deterministic, well-spread unit-ish vectors
    val r = new scala.util.Random(id * 7919L + 13L)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  private def corpusDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (id, vec(id))).toDF("vec_id", "embedding")
  }

  private def mkLakes(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-vecidx").toString
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

  test("bootstrap + search equals the one-shot IVF pipeline") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    val queries = History.readPinned(spark, corpus)
      .filter(col("vec_id") % 10 === 0)
    val got = rows(VectorIndex.searchTopK(spark, index, queries,
      "vec_id", "embedding", cent, k = 3))
    val want = rows(Similarity.ivfTopK(History.readPinned(spark, corpus),
      queries, cent, "vec_id", "embedding", 3))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("ticks mirror corpus deletes and appends; search stays exact") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    // corpus evolves: a DV takedown + a fresh append land as commits
    History.deleteKeysDV(spark, corpus, "vec_id",
      Seq(3L, 17L, 30L)): Unit
    History.append(spark, corpus, corpusDf(100L until 112L),
      key = "b2"): Unit
    val pdirBefore = FileManifest.latest(
      fsOf(VectorIndex.postingsDir(index)),
      VectorIndex.postingsDir(index)).get
    val (v, nDel, nIns) = VectorIndex.tick(spark, corpus, index,
      "vec_id", "embedding", cent)
    assert(nDel === 3L && nIns === 12L)
    // the takedown side rewrote NO postings file (merge-on-read)
    val pdirAfter = FileManifest.latest(
      fsOf(VectorIndex.postingsDir(index)),
      VectorIndex.postingsDir(index)).get
    assert(pdirBefore.curSet.subsetOf(pdirAfter.curSet),
      "feed deletes must land as deletion vectors, not postings rewrites")
    assert(pdirAfter.dvs.nonEmpty)
    // search over the maintained lists == one-shot over the new corpus
    val queries = History.readPinned(spark, corpus)
      .filter(col("vec_id") % 10 === 0)
    val got = rows(VectorIndex.searchTopK(spark, index, queries,
      "vec_id", "embedding", cent, k = 3))
    val want = rows(Similarity.ivfTopK(History.readPinned(spark, corpus),
      queries, cent, "vec_id", "embedding", 3))
    assert(got === want)
    assert(got.exists(_._2 >= 100L),
      "appended vectors must be searchable after the tick")
    assert(!got.exists(t => Set(3L, 17L, 30L)(t._2)),
      "taken-down vectors must not surface from stale lists")
    // a second tick with no corpus change is a no-op
    assert(VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent) === ((v, 0L, 0L)))
    // multiprobe parity too
    val got2 = rows(VectorIndex.searchTopK(spark, index, queries,
      "vec_id", "embedding", cent, k = 3, nprobe = 2))
    val want2 = rows(Similarity.ivfTopKProbed(
      History.readPinned(spark, corpus), queries, cent,
      "vec_id", "embedding", 3, 2))
    assert(got2 === want2)
  }

  /** Crash the last tick: drop its state marker, leaving its postings
    * commits (if any) current and unmarked. */
  private def dropLastMarker(index: String): Unit = {
    val fs = fsOf(index)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        VectorIndex.stateDir(index)))
      .filter(_.getPath.getName.endsWith(".done"))
      .sortBy(_.getPath.getName).lastOption
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }

  private def assertExact(corpus: String, index: String,
      cent: org.apache.spark.sql.DataFrame, clue: String): Unit = {
    val queries = History.readPinned(spark, corpus)
      .filter(col("vec_id") % 10 === 0)
    val got = rows(VectorIndex.searchTopK(spark, index, queries,
      "vec_id", "embedding", cent, k = 3))
    val want = rows(Similarity.ivfTopK(History.readPinned(spark, corpus),
      queries, cent, "vec_id", "embedding", 3))
    assert(got === want, clue)
  }

  test("a crashed tick replays idempotently") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    History.deleteKeysDV(spark, corpus, "vec_id", Seq(5L)): Unit
    History.append(spark, corpus, corpusDf(200L until 204L),
      key = "b3"): Unit
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    // crash AFTER the postings commits but BEFORE the state marker: the
    // replay retires the unmarked attempt's batch files wholesale and
    // re-applies — never losing an id, never doubling one
    dropLastMarker(index)
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    assertExact(corpus, index, cent,
      "a replayed tick must not double-insert")
  }

  test("crashed-tick replay survives UPDATES in the window") {
    import spark.implicits._
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    // an UPDATE: the feed shows delete(old image) + insert(new image)
    // for the SAME id — the naive replay's poison case (its takedown
    // removes the crashed append's fresh posting, and a same-key
    // re-append converges to the same content instead of restoring it)
    val moved = Seq(7L, 20L).map(id => (id, vec(id + 5000L)))
    History.mergeInto(spark, corpus, moved.toDF("vec_id", "embedding"),
      Seq("vec_id")): Unit
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    dropLastMarker(index)
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    assertExact(corpus, index, cent,
      "updated ids must survive a crashed-tick replay")
    // the updated vectors specifically must be present exactly once
    val post = History.readPinnedKeyed(spark,
      VectorIndex.postingsDir(index), "vec_id", Seq(7L, 20L))
    assert(post.count() === 2L)
  }

  test("crashed-tick replay with an ADVANCED corpus neither doubles nor leaks") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    // window A: inserts 300..303 (plus 400, deleted again in window B —
    // its crashed posting must NOT survive the replay even though the
    // net feed across both windows never mentions it)
    History.append(spark, corpus, corpusDf(Seq(300L, 301L, 302L, 303L, 400L)),
      key = "bA"): Unit
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    dropLastMarker(index) // crash: window A applied but unmarked
    // corpus advances BEFORE the retry: 400 taken down again
    History.deleteKeysDV(spark, corpus, "vec_id", Seq(400L)): Unit
    val (_, _, _) = VectorIndex.tick(spark, corpus, index,
      "vec_id", "embedding", cent)
    assertExact(corpus, index, cent,
      "an advanced-window replay must not double pure inserts")
    assert(History.readPinnedKeyed(spark,
        VectorIndex.postingsDir(index), "vec_id",
        Seq(300L, 301L, 302L, 303L)).count() === 4L,
      "window A's inserts must appear exactly once")
    assert(History.readPinnedKeyed(spark,
        VectorIndex.postingsDir(index), "vec_id", Seq(400L)).count() === 0L,
      "an id inserted-then-deleted across the crash must not leak")
    // and exactly ONE attempt's batch files survive in cur (the
    // replay's); the crashed attempt's were retired wholesale
    val pdir = VectorIndex.postingsDir(index)
    val pm = graft.sources.FileManifest.latest(fsOf(pdir), pdir).get
    val tags = pm.cur.map(r => r.substring(r.lastIndexOf('/') + 1))
      .filter(_.startsWith("bivf-"))
      .map(_.split("-p").head).distinct
    assert(tags.size === 1,
      s"exactly one tick attempt's files may be current, got: $tags")
  }

  test("crashed-tick replay restores a delete-then-identical-reinsert") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    // the image-diff poison case: the crashed attempt's takedown of X
    // is durable, X is then re-inserted IDENTICALLY, and the replay's
    // net feed never mentions X — only the recorded intent knows
    History.deleteKeysDV(spark, corpus, "vec_id", Seq(4L)): Unit
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    dropLastMarker(index)
    History.append(spark, corpus, corpusDf(Seq(4L)), key = "back"): Unit
    VectorIndex.tick(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    assert(History.readPinnedKeyed(spark,
        VectorIndex.postingsDir(index), "vec_id", Seq(4L)).count() === 1L,
      "an id deleted-then-identically-reinserted across the crash must " +
        "be restored from the intent record")
    assertExact(corpus, index, cent, "post-restore search parity")
  }

  test("the one-agent maintenance loop advances the index with the feed") {
    import graft.stream.LakeChangeFeed
    val (corpus, index) = mkLakes()
    val centRoot = java.nio.file.Files
      .createTempDirectory("graft-vecidx-cent").toString + "/ivf"
    Similarity.saveCentroids(centroidsOf(corpus), centRoot)
    val cent = Similarity.loadCentroids(spark, centRoot)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    val feedDir = java.nio.file.Files
      .createTempDirectory("graft-vecidx-feed").toString + "/feed"
    LakeChangeFeed.tick(spark, corpus, feedDir): Unit // baseline
    History.deleteKeysDV(spark, corpus, "vec_id", Seq(9L)): Unit
    History.append(spark, corpus, corpusDf(500L until 505L),
      key = "bM"): Unit
    // ONE maintenance pass: deliver the range AND advance the index
    // from the published quantizer — no bespoke index agent
    LakeChangeFeed.tickWithMaintenance(spark, corpus, feedDir,
      vectorIndexes = Seq(LakeChangeFeed.IndexSpec(
        index, "vec_id", "embedding", centRoot))): Unit
    assertExact(corpus, index, cent,
      "the maintenance loop must mirror the window into the index")
    // a second pass with no corpus change is a no-op for the index too
    LakeChangeFeed.tickWithMaintenance(spark, corpus, feedDir,
      vectorIndexes = Seq(LakeChangeFeed.IndexSpec(
        index, "vec_id", "embedding", centRoot))): Unit
    assertExact(corpus, index, cent, "idempotent per delivered state")
  }

  test("search reads only the probed cells' metadata and partitions") {
    val (corpus, index) = mkLakes()
    val cent = centroidsOf(corpus)
    VectorIndex.bootstrap(spark, corpus, index, "vec_id", "embedding",
      cent): Unit
    val one = History.readPinned(spark, corpus)
      .filter(col("vec_id") === 0L)
    // warm the root index, then count shard reads for a 1-query search
    VectorIndex.searchTopK(spark, index, one, "vec_id", "embedding",
      cent, k = 3).collect(): Unit
    val before = FileManifest.shardFileReads.get()
    val plan = VectorIndex.searchTopK(spark, index, one,
      "vec_id", "embedding", cent, k = 3)
    plan.collect(): Unit
    assert(FileManifest.shardFileReads.get() - before <= 1,
      "a 1-cell probe must parse at most that cell's manifest shard")
  }

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
