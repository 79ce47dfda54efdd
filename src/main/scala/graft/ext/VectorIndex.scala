package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** INCREMENTALLY-MAINTAINED IVF index over an embeddings lake.
  *
  * The one-shot IVF pipeline ([[Similarity.ivfTopK]]) re-assigns the
  * whole corpus per query batch; the trained-quantizer gates (s07/s08)
  * serve assignment from an at-rest artifact but still scan the full
  * corpus. This closes the remaining gap for a LIVE corpus: the
  * inverted lists themselves are a persisted, versioned artifact —
  * a manifest lake of `(id, embedding, cell)` postings PARTITIONED BY
  * CELL — advanced per corpus commit from the row-level change feed:
  *
  *  - [[bootstrap]]: one full pinned scan assigns every vector to its
  *    nearest centroid and writes the postings lake (+ its bloom key
  *    index); records the indexed corpus version.
  *  - [[tick]]: reads `History.changesBetween(indexed, latest)` —
  *    O(rewritten files + changed vectors), never O(corpus) — applies
  *    feed DELETES as a merge-on-read takedown on the postings lake
  *    ([[History.deleteKeysDV]]: position sidecars, zero postings
  *    files rewritten) and feed INSERTS as one cell-assigned
  *    exactly-once append. Crash replay is undo-then-apply +
  *    intent-recorded ([[IndexReplay]]): a crashed attempt's
  *    batch-tagged files retire wholesale, appends carry
  *    attempt-unique keys, and intent records restore ids whose
  *    delete-then-identical-reinsert nets to nothing in the replay's
  *    image-diff feed.
  *  - [[searchTopK]]: assigns the bounded query set to its `nprobe`
  *    nearest cells and reads ONLY those cells' partitions
  *    ([[History.readPinnedPartitions]] — with sharded manifests the
  *    driver parses O(probed cells) metadata, and the scan reads
  *    O(probed lists) data: the inverted-list contract made physical).
  *    Results are identical to running the one-shot IVF pipeline over
  *    the corpus' current image with the same centroids.
  *
  * Scale: a tick costs the change rate (feed rows assigned against a
  * broadcast centroid set + one commit per side); a search costs the
  * probed lists; nothing ever re-touches the unchanged corpus. The
  * centroid set is fixed at bootstrap — after enough drift, re-train
  * and re-bootstrap (publishing centroids via
  * [[Similarity.saveCentroids]] versions the quantizer itself).
  *
  * Contract: corpus ids are unique (the standard vector-store key
  * contract) — feed deletes remove a postings id wholesale, so a
  * multiset corpus would over-delete on partial takedowns.
  */
object VectorIndex {

  def postingsDir(indexDir: String): String = s"$indexDir/postings"
  def stateDir(indexDir: String): String = s"$indexDir/_state"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The corpus version the postings lake currently reflects
    * ([[IndexReplay.indexedVersion]]). */
  def indexedVersion(spark: SparkSession, indexDir: String): Option[Long] =
    IndexReplay.indexedVersion(fsOf(spark, indexDir), stateDir(indexDir))

  /** Build the postings lake from the corpus lake's CURRENT pinned
    * image with the given (already-published) centroid set. Returns
    * the corpus version indexed. Idempotent per corpus version. */
  def bootstrap(spark: SparkSession, corpusLake: String, indexDir: String,
                idCol: String, embCol: String,
                centroids: DataFrame): Long = {
    val cfs = fsOf(spark, corpusLake)
    val v = FileManifest.latestVersion(cfs, corpusLake).getOrElse(
      throw new IllegalStateException(
        s"VectorIndex needs a manifest-mode corpus lake: $corpusLake"))
    val pdir = postingsDir(indexDir)
    val corpus = History.readPinned(spark, corpusLake, v)
    val assigned = Similarity.assignCells(corpus, idCol, embCol, centroids)
    assigned.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(pdir)
    History.enableManifests(spark, pdir): Unit
    History.enableShardedManifests(spark, pdir): Unit
    History.refreshKeyIndex(spark, pdir, idCol): Unit
    IndexReplay.markIndexed(fsOf(spark, indexDir), stateDir(indexDir), v,
      reset = true)
    v
  }

  /** Advance the postings lake to the corpus lake's latest version by
    * applying only the change feed: deletes → merge-on-read takedown
    * on the postings (bloom-pruned, zero rewrites), inserts → one
    * cell-assigned exactly-once append. Returns (corpus version now
    * indexed, rows deleted, rows inserted). `maxDeletes` bounds the
    * driver-side takedown id list (change-rate sized; a bigger purge
    * should re-bootstrap). */
  def tick(spark: SparkSession, corpusLake: String, indexDir: String,
           idCol: String, embCol: String, centroids: DataFrame,
           maxDeletes: Long = 10000000L): (Long, Long, Long) = {
    val cfs = fsOf(spark, corpusLake)
    val to = FileManifest.latestVersion(cfs, corpusLake).getOrElse(
      throw new IllegalStateException(
        s"VectorIndex needs a manifest-mode corpus lake: $corpusLake"))
    val from = indexedVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"VectorIndex.tick before bootstrap at $indexDir"))
    if (from == to) return (to, 0L, 0L)
    val pdir = postingsDir(indexDir)
    // UNDO-THEN-APPLY, the shape that makes replay convergent in every
    // crash/advance interleaving. A crashed tick can leave its append
    // CURRENT in the postings lake with the state marker unwritten; a
    // naive replay then either loses updated ids (its takedown removes
    // the crashed append's posting and a same-key re-append sweeps and
    // REPLACES the batch files in place — mutating bytes under any DV
    // pointers the reset attached: silent corruption) or doubles pure
    // inserts (an advanced `to` changes the append key, so nothing
    // dedupes), and an id inserted-then-deleted INSIDE the replay
    // window escapes the net feed entirely, leaving its crashed
    // posting live forever. So:
    //  (1) retire, wholesale, every current postings file a prior
    //      attempt from this SAME baseline landed — batch-tagged names
    //      (`b ivf-<from>-…`) make them exactly enumerable, and only
    //      unmarked (crashed) attempts can still carry this baseline's
    //      prefix. This erases every partial-apply ambiguity at once.
    //  (2) take down the net feed's touched ids from the PRE-window
    //      postings (merge-on-read; re-deletes match nothing).
    //  (3) append the feed's insert images under an ATTEMPT-UNIQUE
    //      key — files are never name-reused, so postings stay
    //      immutable under their deletion vectors.
    // Run from one maintenance agent per index, like every lake
    // maintenance sequence.
    IndexReplay.undoCrashedAppends(fsOf(spark, pdir), pdir, s"ivf-$from")
    val feed = History.changesBetween(spark, corpusLake, from, to)
      .select(col(idCol), col(embCol), col("_change"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lim =
        if (maxDeletes >= Int.MaxValue.toLong) Int.MaxValue
        else (maxDeletes + 1).toInt
      val touchedIds = feed.select(col(idCol)).distinct()
        .limit(lim).collect().map(_.get(0)).toSeq
      require(touchedIds.length < lim || lim == Int.MaxValue,
        s"tick window touches > maxDeletes=$maxDeletes ids — " +
          "re-bootstrap the index instead of replaying a mass change")
      // ids a crashed attempt from this baseline ALREADY took down that
      // the image-diff feed no longer mentions (deleted-then-reinserted
      // across the crash): reset them and re-insert their image AT `to`
      // — see [[IndexReplay]]
      val fs = fsOf(spark, indexDir)
      val touchedStr = touchedIds.map(_.toString).toSet
      val extras = IndexReplay
        .pending(fs, stateDir(indexDir), from)
        .filterNot(touchedStr)
      IndexReplay.record(fs, stateDir(indexDir), from, touchedIds)
      val nDel = feed.filter(col("_change") === "delete").count()
      val allTouched = touchedIds ++ extras
      if (allTouched.nonEmpty) {
        History.deleteKeysDV(spark, pdir, idCol, allTouched): Unit
      }
      val feedInserts = feed.filter(col("_change") === "insert")
        .select(col(idCol), col(embCol))
      val inserts =
        if (extras.isEmpty) feedInserts
        else feedInserts.unionByName(
          History.readPinned(spark, corpusLake, to)
            .filter(col(idCol).cast("string").isin(extras: _*))
            .select(col(idCol), col(embCol)))
      val nIns = inserts.count()
      if (nIns > 0L)
        History.append(spark, pdir,
          Similarity.assignCells(inserts, idCol, embCol, centroids),
          key = s"ivf-$from-$to-" +
            java.util.UUID.randomUUID().toString.take(8),
          partitionCols = Seq("cell")): Unit
      History.refreshKeyIndex(spark, pdir, idCol): Unit
      IndexReplay.markIndexed(fs, stateDir(indexDir), to)
      IndexReplay.clear(fs, stateDir(indexDir), from)
      (to, nDel, nIns)
    } finally feed.unpersist(): Unit
  }

  /** ANN top-k from the MAINTAINED inverted lists: assign the bounded
    * query set to its `nprobe` nearest cells, read only those cells'
    * postings partitions, rank by 6-dp cosine with the deterministic
    * (score desc, id asc) tie-break — the same output contract as
    * [[Similarity.ivfTopK]]/[[Similarity.ivfTopKProbed]] over the
    * corpus' current image. */
  def searchTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
                 idCol: String, embCol: String, centroids: DataFrame,
                 k: Int, nprobe: Int = 1): DataFrame = {
    val q0 =
      if (nprobe <= 1)
        Similarity.assignCells(queries, idCol, embCol, centroids)
      else // probed assignment is (id, cell) rows — reattach the vector
        Similarity.assignCellsProbed(queries, idCol, embCol, centroids,
            nprobe)
          .join(queries.select(col(idCol), col(embCol)), Seq(idCol))
    val q = Similarity.withNorm(q0, idCol, embCol)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    // the probed set is bounded by |queries| × nprobe — collecting it
    // is what makes the partition-pruned postings read possible
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val lists = History.readPinnedPartitions(spark, postingsDir(indexDir),
      dir => dir.startsWith("cell=") &&
        dir.stripPrefix("cell=").toLongOption.exists(probed))
    val c = Similarity.withNorm(lists, idCol, embCol)
      .select(col(idCol).as("b_id"), col(embCol).as("b_emb"),
        col("nrm").as("b_nrm"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("b_id"))
      .select(col("query_id"), col("b_id"),
        Similarity.cosine(col("q_emb"), col("b_emb"),
          col("q_nrm"), col("b_nrm")).as("cos_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("b_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "b_id", "rank", "cos_r")
  }
}
