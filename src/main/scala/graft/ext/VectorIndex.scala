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
    * indexed, DISTINCT ids deleted, DISTINCT ids inserted) — both
    * counters are distinct-id counts, not feed-row counts (an id whose
    * image changed twice in the window counts once; monitoring that
    * compares tick metrics against raw feed volumes should expect
    * the distinct semantics). `maxDeletes` bounds the driver-side
    * takedown id list (change-rate sized, count-first checked; a
    * bigger purge should re-bootstrap). */
  def tick(spark: SparkSession, corpusLake: String, indexDir: String,
           idCol: String, embCol: String, centroids: DataFrame,
           maxDeletes: Long = 1000000L): (Long, Long, Long) = {
    // UNDO-THEN-APPLY, the shape that makes replay convergent in every
    // crash/advance interleaving (see [[IndexReplay.tickWindow]], the
    // one shared home of the discipline): a crashed tick can leave its
    // append CURRENT in the postings lake with the state marker
    // unwritten; a naive replay then either loses updated ids (its
    // takedown removes the crashed append's posting and a same-key
    // re-append sweeps and REPLACES the batch files in place — mutating
    // bytes under any DV pointers the reset attached: silent
    // corruption) or doubles pure inserts (an advanced `to` changes the
    // append key, so nothing dedupes), and an id inserted-then-deleted
    // INSIDE the replay window escapes the net feed entirely. So the
    // driver (1) retires crashed batch-tagged appends wholesale,
    // (2) takes the net feed's touched ids down from the pre-window
    // postings (merge-on-read), and (3) hands this index the insert
    // images to append under an ATTEMPT-UNIQUE key — files are never
    // name-reused, so postings stay immutable under their deletion
    // vectors. Run from one maintenance agent per index.
    val pdir = postingsDir(indexDir)
    IndexReplay.tickWindow(spark, corpusLake, indexDir,
      stateDir(indexDir), lakes = Seq(pdir), keyPrefix = "ivf",
      idCol = idCol, valueCols = Seq(embCol),
      maxDeletes = maxDeletes, indexName = "VectorIndex") {
      (inserts, nIns, key) =>
        if (nIns > 0L)
          History.append(spark, pdir,
            Similarity.assignCells(inserts, idCol, embCol, centroids),
            key = key, partitionCols = Seq("cell")): Unit
        History.refreshKeyIndex(spark, pdir, idCol): Unit
    }
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
