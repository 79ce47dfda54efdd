package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{BandIndex, Dedup}
import graft.sources.History

/** Maintained dedup band index: bootstrap once, advance per corpus
  * commit, and the maintained bands lake must equal a one-shot band
  * derivation over the corpus' current image — so admission through it
  * equals admission against a fresh recompute. */
class BandIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Corpus ids (< 1000) share text within their (id % 7) family —
    * real near-dup structure, identical signatures. Probe ids ≥ 1000
    * are unique, except 1002/1003 which duplicate EACH OTHER (the
    * within-batch dedup case). */
  private def family(fam: Long): String =
    s"alpha$fam beta gamma delta$fam epsilon zeta eta$fam theta iota"

  private def text(id: Long): String =
    if (id == 1002L || id == 1003L)
      "pair alpha pair beta pair gamma pair delta pair epsilon"
    else if (id == 2005L) family(2005L % 7) // collides with corpus fam 3
    else if (id >= 1000L)
      // every word id-suffixed: no shared shingles across probe docs
      s"uniq$id a$id b$id c$id d$id e$id f$id g$id h$id"
    else family(id % 7)

  private def corpusDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (id, text(id))).toDF("doc_id", "text")
  }

  private def mkLakes(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-bandidx").toString
    val corpus = s"$base/corpus"
    corpusDf(0L until 40L).repartition(3).write.parquet(corpus)
    History.enableManifests(spark, corpus): Unit
    History.enableShardedManifests(spark, corpus): Unit
    (corpus, s"$base/index")
  }

  private def bandSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("band"), col("bkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def recomputed(corpus: String) =
    BandIndex.deriveBands(History.readPinned(spark, corpus))

  test("bootstrap materializes exactly the corpus image's bands") {
    val (corpus, index) = mkLakes()
    BandIndex.bootstrap(spark, corpus, index): Unit
    val got = bandSet(BandIndex.read(spark, index))
    assert(got === bandSet(recomputed(corpus)))
    assert(got.nonEmpty)
    // family structure survived the round trip: identical texts,
    // identical band keys
    val byDoc = got.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byDoc(0L) === byDoc(7L), "same family => same bands")
    assert(byDoc(0L) !== byDoc(1L), "different family => different bands")
  }

  test("tick mirrors takedowns and appends; admission equals one-shot") {
    val (corpus, index) = mkLakes()
    BandIndex.bootstrap(spark, corpus, index): Unit
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(3L, 10L, 21L)): Unit
    History.append(spark, corpus, corpusDf(100L until 110L),
      key = "b2"): Unit
    val (v, nDel, nIns) = BandIndex.tick(spark, corpus, index)
    assert(nDel === 3L && nIns === 10L)
    assert(bandSet(BandIndex.read(spark, index)) ===
      bandSet(recomputed(corpus)),
      "maintained bands must equal a fresh derivation over the evolved " +
        "corpus")
    // admission: 2005 collides with corpus family 3 (dropped — 17/24/…
    // still carry it after the takedown), 1000/1001 are unique (kept),
    // 1002/1003 duplicate each other (batch CC keeps the min id)
    val batch = corpusDf(Seq(1000L, 1001L, 1002L, 1003L, 2005L))
    val keep = Dedup.incrementalKeep(BandIndex.deriveBands(batch),
        BandIndex.read(spark, index), "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keep === Set(1000L, 1001L, 1002L))
    val keepOneShot = Dedup.incrementalKeep(BandIndex.deriveBands(batch),
        recomputed(corpus), "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keep === keepOneShot)
    // no-op tick
    assert(BandIndex.tick(spark, corpus, index) === ((v, 0L, 0L)))
  }

  test("tick mirrors a row correction: old bands retract, new derive") {
    val (corpus, index) = mkLakes()
    BandIndex.bootstrap(spark, corpus, index): Unit
    // a correction rewrites one family's text in place — the feed's
    // hash-projected diff replays exactly the changed docs, the tick
    // re-shingles only them, and the maintained bands lake must equal
    // a one-shot derivation over the corrected corpus
    History.updateWhere(spark, corpus, col("doc_id") % 7 === 2,
      Seq("text" -> concat(col("text"), lit(" corrected kappa lambda")))
    ): Unit
    val (_, d, i) = BandIndex.tick(spark, corpus, index)
    assert(d === 6L && i === 6L,
      s"only the 6 changed docs may replay, got del=$d ins=$i")
    assert(bandSet(BandIndex.read(spark, index)) ===
      bandSet(recomputed(corpus)),
      "maintained bands must equal a fresh derivation after the update")
  }

  test("admission scans the maintained bands lake, never the corpus text") {
    val (corpus, index) = mkLakes()
    BandIndex.bootstrap(spark, corpus, index): Unit
    // AQE's adaptive wrapper hides the inner plan from collect — the
    // static plan is the asserted shape
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Dedup.admissionHits(
        BandIndex.deriveBands(corpusDf(Seq(1000L))),
        BandIndex.read(spark, index), "doc_id", excludeSelf = false)
      val scanned = probe.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toString)
      }.flatten
      assert(scanned.nonEmpty, "the probe must read the bands lake files")
      assert(scanned.forall(_.contains(BandIndex.bandsDir(index))),
        s"probe file scans must stay inside the bands lake: $scanned")
      assert(!scanned.exists(_.contains(corpus)),
        "admission must never re-read corpus text")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("crashed-tick replay restores a delete-then-identical-reinsert") {
    val (corpus, index) = mkLakes()
    BandIndex.bootstrap(spark, corpus, index): Unit
    History.deleteKeysDV(spark, corpus, "doc_id", Seq(5L)): Unit
    BandIndex.tick(spark, corpus, index): Unit
    // crash after the takedown landed: marker lost, doc 5 comes back
    // IDENTICALLY — the image-diff feed nets to nothing, only the
    // intent record can restore it
    val fs = new org.apache.hadoop.fs.Path(index).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        BandIndex.stateDir(index)))
      .filter(_.getPath.getName.endsWith(".done"))
      .sortBy(_.getPath.getName).lastOption
      .foreach(s => fs.delete(s.getPath, false): Unit)
    History.append(spark, corpus, corpusDf(Seq(5L)), key = "back"): Unit
    BandIndex.tick(spark, corpus, index): Unit
    assert(bandSet(BandIndex.read(spark, index)) ===
      bandSet(recomputed(corpus)),
      "the intent record must restore the net-zero id's band rows")
  }
}
