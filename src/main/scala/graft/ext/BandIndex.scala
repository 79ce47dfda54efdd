package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** INCREMENTALLY-MAINTAINED DEDUP BAND INDEX — the admission side of
  * near-dup dedup made a persisted artifact that follows a live corpus,
  * completing the maintained-index family ([[VectorIndex]] dense,
  * [[LexicalIndex]] lexical, [[LmRollup]] model): one-shot pipelines
  * re-shingle the whole corpus per admission batch, here the
  * shingle→MinHash→band derivation is paid once at bootstrap and then
  * at CHANGE RATE.
  *
  *  - '''bands lake''': one row per (doc, band) — (doc_id, band, bkey),
  *    PARTITIONED BY BAND; bloom key index on doc_id so takedowns and
  *    replay resets content-prune to the files that might hold a key.
  *  - band derivation is the canonical d02 signature family (word
  *    3-gram shingles → 8 MinHash seeds → 4 bands × 2 rows), so band
  *    keys are comparable across every dedup gate and any one-shot
  *    band table ([[Dedup.writeBucketedBands]]).
  *
  * [[tick]] mirrors a corpus window with the same undo-then-apply
  * replay discipline as [[LexicalIndex.tick]]: crashed batch-tagged
  * appends retired wholesale, intent records closing the
  * delete-then-reinsert image-diff hole, feed deletes as merge-on-read
  * takedowns (deletion vectors — the corpus text of a deleted doc is
  * never re-read), feed inserts as ONE attempt-unique band append.
  *
  * Admission ([[Dedup.incrementalKeep]] over [[read]]) probes the
  * maintained lake with the incoming batch's bands: only the batch
  * ever derives bands from text. The probe's (band, bkey) join shuffles
  * both sides here; a deployment that needs the shuffle-free corpus
  * side layers the d09 bucketed layout ([[Dedup.ensureBandTable]] +
  * exactly-once bucketed appends) over the same feed — the maintenance
  * contract (this file) is independent of the serving layout.
  *
  * Reference scope: the reference engine has no persisted index
  * artifacts at all (single-pass stream, `transis_consumer.py`); this
  * is part of the §7.4 training-pipeline surface built Spark-first.
  */
object BandIndex {

  def bandsDir(indexDir: String): String = s"$indexDir/bands"
  def stateDir(indexDir: String): String = s"$indexDir/_state"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The canonical d02-family band derivation: word 3-gram shingles →
    * 8 MinHash seeds → 4 bands × 2 rows. ONE definition so the
    * maintained lake, the one-shot gates, and the admission probe all
    * produce byte-identical (band, bkey) rows. */
  def deriveBands(docs: DataFrame, docIdCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(docIdCol).as("doc_id"),
      explode(TextAnalysis.wordShingles(col(textCol), 3)).as("shingle"))
    Dedup.lshBands(Dedup.minhashSignatures(sh, "doc_id", 8), "doc_id", 8, 2)
  }

  /** The corpus version the index currently reflects. */
  def indexedVersion(spark: SparkSession, indexDir: String): Option[Long] =
    IndexReplay.indexedVersion(fsOf(spark, indexDir), stateDir(indexDir))

  /** Build the bands lake from the corpus lake's current pinned image.
    * Returns the corpus version indexed. */
  def bootstrap(spark: SparkSession, corpusLake: String, indexDir: String,
                docIdCol: String = "doc_id",
                textCol: String = "text"): Long = {
    val cfs = fsOf(spark, corpusLake)
    val v = FileManifest.latestVersion(cfs, corpusLake).getOrElse(
      throw new IllegalStateException(
        s"BandIndex needs a manifest-mode corpus lake: $corpusLake"))
    val corpus = History.readPinned(spark, corpusLake, v)
      // the md5-heavy shingling must not inherit a single-split corpus
      // file's parallelism (at scale the scan provides it)
      .repartition(spark.sparkContext.defaultParallelism, col(docIdCol))
    val bdir = bandsDir(indexDir)
    deriveBands(corpus, docIdCol, textCol)
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(bdir)
    History.enableManifests(spark, bdir): Unit
    History.enableShardedManifests(spark, bdir): Unit
    History.refreshKeyIndex(spark, bdir, "doc_id"): Unit
    IndexReplay.markIndexed(fsOf(spark, indexDir), stateDir(indexDir), v,
      reset = true)
    v
  }

  /** Advance the bands lake to the corpus lake's latest version from
    * the change feed. Undo-then-apply replay discipline — see
    * [[VectorIndex.tick]]'s contract; run from one maintenance agent
    * per index. Returns (corpus version indexed, docs deleted, docs
    * inserted). */
  def tick(spark: SparkSession, corpusLake: String, indexDir: String,
           docIdCol: String = "doc_id", textCol: String = "text",
           maxDeletes: Long = 10000000L): (Long, Long, Long) = {
    val cfs = fsOf(spark, corpusLake)
    val to = FileManifest.latestVersion(cfs, corpusLake).getOrElse(
      throw new IllegalStateException(
        s"BandIndex needs a manifest-mode corpus lake: $corpusLake"))
    val from = indexedVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"BandIndex.tick before bootstrap at $indexDir"))
    val bdir = bandsDir(indexDir)
    if (from == to) return (to, 0L, 0L)
    IndexReplay.undoCrashedAppends(fsOf(spark, bdir), bdir, s"band-$from")
    val feed = History.changesBetween(spark, corpusLake, from, to)
      .select(col(docIdCol), col(textCol), col("_change"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lim =
        if (maxDeletes >= Int.MaxValue.toLong) Int.MaxValue
        else (maxDeletes + 1).toInt
      val touched = feed.select(col(docIdCol)).distinct()
        .limit(lim).collect().map(_.get(0)).toSeq
      require(touched.length < lim || lim == Int.MaxValue,
        s"tick window touches > maxDeletes=$maxDeletes docs — " +
          "re-bootstrap the index instead of replaying a mass change")
      // crashed-attempt intents from this baseline whose ids the
      // image-diff feed no longer mentions — reset + re-insert their
      // image at `to` (see [[IndexReplay]])
      val ifs = fsOf(spark, indexDir)
      val touchedStr = touched.map(_.toString).toSet
      val extras = IndexReplay
        .pending(ifs, stateDir(indexDir), from)
        .filterNot(touchedStr)
      IndexReplay.record(ifs, stateDir(indexDir), from, touched)
      val nDel = feed.filter(col("_change") === "delete")
        .select(col(docIdCol)).distinct().count()
      val allTouched = touched ++ extras
      if (allTouched.nonEmpty)
        History.deleteKeysDV(spark, bdir, "doc_id", allTouched): Unit
      val feedInserts = feed.filter(col("_change") === "insert")
        .select(col(docIdCol), col(textCol))
      val inserts =
        if (extras.isEmpty) feedInserts
        else feedInserts.unionByName(
          History.readPinned(spark, corpusLake, to)
            .filter(col(docIdCol).cast("string").isin(extras: _*))
            .select(col(docIdCol), col(textCol)))
      val nIns = inserts.select(col(docIdCol)).distinct().count()
      if (nIns > 0L) {
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        History.append(spark, bdir, deriveBands(inserts, docIdCol, textCol),
          key = s"band-$from-$to-$nonce", partitionCols = Seq("band")): Unit
      }
      History.refreshKeyIndex(spark, bdir, "doc_id"): Unit
      IndexReplay.markIndexed(ifs, stateDir(indexDir), to)
      IndexReplay.clear(ifs, stateDir(indexDir), from)
      (to, nDel, nIns)
    } finally feed.unpersist(): Unit
  }

  /** The maintained band table's current image (deletion-vector-aware,
    * pinned manifest read). */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    History.readPinned(spark, bandsDir(indexDir))
      .select(col("doc_id"), col("band"), col("bkey"))
}
