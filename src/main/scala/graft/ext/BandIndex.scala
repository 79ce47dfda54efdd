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
      // band alone has 4 distinct values — keying the shuffle on it
      // would serialize the corpus-sized write onto 4 tasks; bkey
      // keeps full parallelism while partitionBy still lays out the
      // band dirs
      .repartition(col("band"), col("bkey"))
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
           maxDeletes: Long = 1000000L): (Long, Long, Long) = {
    val bdir = bandsDir(indexDir)
    IndexReplay.tickWindow(spark, corpusLake, indexDir,
      stateDir(indexDir), lakes = Seq(bdir), keyPrefix = "band",
      idCol = docIdCol, valueCols = Seq(textCol),
      maxDeletes = maxDeletes, indexName = "BandIndex",
      lakeKeyCol = "doc_id") {
      (inserts, nIns, key) =>
        if (nIns > 0L)
          History.append(spark, bdir,
            deriveBands(inserts, docIdCol, textCol),
            key = key, partitionCols = Seq("band")): Unit
        History.refreshKeyIndex(spark, bdir, "doc_id"): Unit
    }
  }

  /** The maintained band table's current image (deletion-vector-aware,
    * pinned manifest read). */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    History.readPinned(spark, bandsDir(indexDir))
      .select(col("doc_id"), col("band"), col("bkey"))
}
