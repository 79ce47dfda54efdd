package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{HybridRetrieval, LexicalIndex}
import graft.sources.{FileManifest, History}

/** Maintained BM25 index: bootstrap once, advance per corpus commit,
  * and every search over the maintained postings + rollups must equal
  * the one-shot doc-as-query BM25 pipeline over the corpus' current
  * image — exact scores, exact ranks. */
class LexicalIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Common filler (df-capped away) + RARE tokens (df ≈ corpus/13 and
    * /23 — the terms the cap keeps and BM25 actually ranks on). */
  private def text(id: Long): String = {
    val r = new scala.util.Random(id * 31L + 7L)
    val filler = (0 until 4).map(_ => s"the data row ${r.nextInt(2)}")
    val rare = Seq(s"t${id % 13}", s"t${(id * 7) % 13}", s"r${id % 23}")
    (filler ++ rare ++ rare.take(1 + (id % 2).toInt)).mkString(" ")
  }

  private def corpusDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (id, text(id))).toDF("doc_id", "text")
  }

  private def mkLakes(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-lexidx").toString
    val corpus = s"$base/corpus"
    corpusDf(0L until 40L).repartition(3).write.parquet(corpus)
    History.enableManifests(spark, corpus): Unit
    History.enableShardedManifests(spark, corpus): Unit
    (corpus, s"$base/index")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("b_id"), col("rank"),
        col("score").cast("double")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  private def oneShot(corpus: String, k: Int) =
    HybridRetrieval.docQueryBm25TopK(History.readPinned(spark, corpus),
      col("doc_id") % 10 === 0, k)

  private def maintained(corpus: String, index: String, k: Int) = {
    val qIds = History.readPinned(spark, corpus)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    LexicalIndex.searchTopK(spark, index, qIds, k)
  }

  test("bootstrap + search equals the one-shot BM25 pipeline") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    val got = rows(maintained(corpus, index, 5))
    val want = rows(oneShot(corpus, 5))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("ticks mirror takedowns and appends; df/stats retract exactly") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    // corpus evolves: DV takedown + appended docs (some share phrases,
    // shifting df and avgdl — the rollup-retraction stress)
    History.deleteKeysDV(spark, corpus, "doc_id",
      Seq(3L, 10L, 21L)): Unit
    History.append(spark, corpus, corpusDf(100L until 110L),
      key = "b2"): Unit
    val (v, nDel, nIns) = LexicalIndex.tick(spark, corpus, index)
    assert(nDel === 3L && nIns === 10L)
    val got = rows(maintained(corpus, index, 5))
    val want = rows(oneShot(corpus, 5))
    assert(got === want,
      "maintained BM25 must equal a fresh recompute over the new corpus")
    assert(got.exists(_._2 >= 100L),
      "appended docs must be retrievable")
    assert(!got.exists(t => Set(3L, 10L, 21L)(t._2) ||
      Set(3L, 10L, 21L)(t._1)), "taken-down docs must be gone both ways")
    // no-op tick
    assert(LexicalIndex.tick(spark, corpus, index) === ((v, 0L, 0L)))
  }

  test("ticks mirror row corrections (updateWhere and keyed merge)") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    // a correction REWRITES docs in place (copy-on-write): the change
    // feed's hash-projected diff presents exactly the changed rows as
    // delete+insert, so the tick must retract the old text's postings
    // and admit the new — never the rewritten files' unchanged rows
    History.updateWhere(spark, corpus, col("doc_id") % 10 === 3,
      Seq("text" -> concat(col("text"), lit(" zq77 zq77")))): Unit
    val (_, d1, i1) = LexicalIndex.tick(spark, corpus, index)
    assert(d1 === 4L && i1 === 4L,
      s"only the 4 changed docs may replay, got del=$d1 ins=$i1")
    assert(rows(maintained(corpus, index, 5)) ===
      rows(oneShot(corpus, 5)),
      "maintained BM25 must equal a fresh recompute after the update")
    // a keyed merge: one corrected image + one brand-new doc
    import spark.implicits._
    History.mergeInto(spark, corpus,
      Seq((5L, "zq88 zq88 t5 r5"), (200L, text(200L)))
        .toDF("doc_id", "text"), Seq("doc_id")): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    assert(rows(maintained(corpus, index, 5)) ===
      rows(oneShot(corpus, 5)),
      "maintained BM25 must equal a fresh recompute after the merge")
  }

  test("a crashed tick replays to convergence, rollups included") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(7L)): Unit
    History.append(spark, corpus, corpusDf(200L until 206L),
      key = "b3"): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    // crash before the marker; corpus advances before the retry
    val fs = new org.apache.hadoop.fs.Path(index).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        LexicalIndex.stateDir(index)))
      .filter(_.getPath.getName.endsWith(".done"))
      .sortBy(_.getPath.getName).lastOption
      .foreach(s => fs.delete(s.getPath, false): Unit)
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(203L)): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    val got = rows(maintained(corpus, index, 5))
    val want = rows(oneShot(corpus, 5))
    assert(got === want,
      "replay must converge postings AND df/stats rollups")
  }

  test("crashed-tick replay restores a delete-then-identical-reinsert") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(5L)): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    // crash after the takedown landed; doc 5 comes back IDENTICALLY
    val fs = new org.apache.hadoop.fs.Path(index).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        LexicalIndex.stateDir(index)))
      .filter(_.getPath.getName.endsWith(".done"))
      .sortBy(_.getPath.getName).lastOption
      .foreach(s => fs.delete(s.getPath, false): Unit)
    History.append(spark, corpus, corpusDf(Seq(5L)), key = "back"): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    val got = rows(maintained(corpus, index, 5))
    val want = rows(oneShot(corpus, 5))
    assert(got === want,
      "the intent record must restore the net-zero id's postings AND " +
        "its df/stats contributions")
  }

  test("re-bootstrap over a surviving index dir resets rollups and state") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(1L, 2L)): Unit
    LexicalIndex.tick(spark, corpus, index): Unit
    // a NEW corpus at a fresh path (version numbering restarts below
    // the old rollup cursor) indexed into the SAME surviving index dir
    // — the stale-artifact-root shape a session restart produces
    val corpus2 = java.nio.file.Files
      .createTempDirectory("graft-lexidx2").toString + "/corpus"
    corpusDf(1000L until 1030L).repartition(2).write.parquet(corpus2)
    History.enableManifests(spark, corpus2): Unit
    LexicalIndex.bootstrap(spark, corpus2, index): Unit
    History.deleteKeysDV(spark, corpus2, "doc_id", Seq(1001L)): Unit
    LexicalIndex.tick(spark, corpus2, index): Unit
    val qIds = History.readPinned(spark, corpus2)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val got = rows(LexicalIndex.searchTopK(spark, index, qIds, 5))
    val want = rows(HybridRetrieval.docQueryBm25TopK(
      History.readPinned(spark, corpus2), col("doc_id") % 10 === 0, 5))
    assert(got === want,
      "a re-bootstrap must reset df/stats rollups, not serve stale ones")
  }

  test("size-gated tf checkpoint: same results, lineage-truncated plan") {
    val (corpus, _) = mkLakes()
    val want = rows(oneShot(corpus, 5)) // default: below threshold, lazy
    spark.conf.set("spark.graft.bm25.ckptTfMinBytes", "0")
    try {
      val ck = oneShot(corpus, 5)
      // above-threshold shape: the tf aggregate is a local checkpoint,
      // so the plan roots on a LogicalRDD scan instead of re-deriving
      // the corpus explode per branch
      assert(ck.queryExecution.optimizedPlan.collectLeaves()
          .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
        "expected a checkpoint-rooted leaf when the size gate fires")
      assert(rows(ck) === want)
      graft.ext.CkptRegistry.release(spark)
    } finally spark.conf.unset("spark.graft.bm25.ckptTfMinBytes")
  }

  test("search reads only the query terms' bucket partitions") {
    val (corpus, index) = mkLakes()
    LexicalIndex.bootstrap(spark, corpus, index): Unit
    // warm caches, then count shard reads for a one-doc query
    LexicalIndex.searchTopK(spark, index, Seq(0L), 3).collect(): Unit
    val before = FileManifest.shardFileReads.get()
    LexicalIndex.searchTopK(spark, index, Seq(0L), 3).collect(): Unit
    val delta = FileManifest.shardFileReads.get() - before
    assert(delta <= LexicalIndex.BUCKETS / 4,
      s"a one-doc query's bucket prune must not touch most shards " +
        s"($delta reads)")
  }
}
