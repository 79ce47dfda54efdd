package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.{Pipeline, StreamingDedup}

/** Dedup at ingest: the streaming admission must reject near-dups of
  * everything previously ADMITTED (not merely seen), keep exactly one
  * of an intra-batch duplicate pair, accumulate only admitted bands,
  * and make crash-replayed batches no-ops. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("admission stream rejects corpus and intra-batch near-dups exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val bandTable = java.nio.file.Files
      .createTempDirectory("graft-stream-bands").toString + "/bands"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup-ck").toString
    val ledger = new Pipeline.FileBatchLedger(s"$bandTable/_ledger")
    val admitted = new java.util.concurrent.ConcurrentHashMap[
      Long, Set[Long]]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.admitStream(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bandTable, ckpt, Some(ledger)) { (df, id) =>
      admitted.put(id,
        df.select("doc_id").collect().map(_.getLong(0)).toSet): Unit
    }
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "completely different content about distributed query engines and shuffles"
    val tC = "a third unrelated document discussing parquet row group statistics"
    val tD = "yet another one on watermark semantics in structured streaming jobs"
    try {
      // batch 0: two distinct docs → both admitted
      input.addData((1L, tA), (2L, tB))
      q.processAllAvailable()
      assert(admitted.get(0L) === Set(1L, 2L))
      // batch 1: near-dup of ADMITTED doc 1 rejected; new doc admitted
      input.addData((10L, tA), (11L, tC))
      q.processAllAvailable()
      assert(admitted.get(1L) === Set(11L))
      // batch 2: dup-of-corpus rejected; intra-batch dup keeps min id
      input.addData((20L, tC), (21L, tD), (22L, tD))
      q.processAllAvailable()
      assert(admitted.get(2L) === Set(21L))
      // the band table indexes exactly the admitted corpus
      assert(spark.read.parquet(bandTable).select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L, 21L))
      assert(ledger.lastCommitted === 2L)
    } finally q.stop()

    // crash-replay: a restarted query re-delivers early batches (fresh
    // checkpoint → batchIds restart at 0); the durable ledger turns them
    // into no-ops — no duplicate bands, no callback re-fire
    val bandsBefore = spark.read.parquet(bandTable).count()
    val replayAdmitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val input2 = MemoryStream[(Long, String)]
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup-ck2").toString
    val q2 = StreamingDedup.admitStream(
      input2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bandTable, ckpt2, Some(ledger)) { (_, _) =>
      replayAdmitted.incrementAndGet(): Unit
    }
    try {
      input2.addData((1L, tA), (2L, tB)) // batch 0 again
      q2.processAllAvailable()
      assert(replayAdmitted.get() === 0)
      assert(spark.read.parquet(bandTable).count() === bandsBefore)
    } finally q2.stop()
  }

  test("bucketed band table: identical admissions, bucket-consistent files") {
    // buckets > 0 changes the band table's at-rest LAYOUT (catalog-
    // described bucketing + bucket-tagged published files), never the
    // admission semantics: same inputs as the flat test, same admitted
    // sets; and every published file's _NNNNN bucket id must agree with
    // the murmur3-pmod of the rows inside it (the invariant the
    // shuffle-free probe rests on).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bandTable = java.nio.file.Files
      .createTempDirectory("graft-stream-bands-b").toString + "/bands"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup-bck").toString
    val ledger = new Pipeline.FileBatchLedger(s"$bandTable/_ledger")
    val admitted = new java.util.concurrent.ConcurrentHashMap[
      Long, Set[Long]]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.admitStream(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bandTable, ckpt, Some(ledger), buckets = 4,
      compactEvery = 2) { (df, id) =>
        admitted.put(id,
          df.select("doc_id").collect().map(_.getLong(0)).toSet): Unit
    }
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "completely different content about distributed query engines and shuffles"
    val tC = "a third unrelated document discussing parquet row group statistics"
    try {
      input.addData((1L, tA), (2L, tB))
      q.processAllAvailable()
      assert(admitted.get(0L) === Set(1L, 2L))
      // near-dup of admitted doc 1 rejected against the BUCKETED corpus
      input.addData((10L, tA), (11L, tC))
      q.processAllAvailable()
      assert(admitted.get(1L) === Set(11L))
      // the catalog table and a flat read see the same rows
      val tbl = graft.ext.Dedup.bandTableName(bandTable)
      val viaTable = spark.table(tbl)
        .select("doc_id", "band", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val viaFlat = spark.read.parquet(bandTable)
        .select("doc_id", "band", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(viaTable === viaFlat)
      assert(viaTable.map(_._1) === Set(1L, 2L, 11L))
      // in-line maintenance fired after batch 1 (compactEvery = 2):
      // the two batches' per-bucket files folded to ≤ one per bucket
      val fileNames = {
        val p = new org.apache.hadoop.fs.Path(bandTable)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(s => s.isFile &&
            !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath.getName).toSeq
      }
      assert(fileNames.size <= 4, fileNames)
      assert(fileNames.forall(_.startsWith("bcompact-")), fileNames)
      // layout invariant: each file's parsed bucket id matches the
      // bucket hash of every row in it
      val withFile = spark.read.parquet(bandTable)
        .withColumn("f", org.apache.spark.sql.functions
          .input_file_name())
        .withColumn("b", org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions
            .hash(org.apache.spark.sql.functions.col("band"),
              org.apache.spark.sql.functions.col("bkey")),
            org.apache.spark.sql.functions.lit(4)))
        .select("f", "b").collect()
      val fileBucket = raw"_(\d+)\.parquet$$".r
      withFile.foreach { r =>
        val parsed = fileBucket.findFirstMatchIn(r.getString(0))
        assert(parsed.nonEmpty, s"unbucketed file name: ${r.getString(0)}")
        assert(parsed.get.group(1).toInt === r.getInt(1),
          s"row bucket ${r.getInt(1)} in file ${r.getString(0)}")
      }
    } finally q.stop()

    // replay with the durable ledger: still a no-op in bucketed mode
    val bandsBefore = spark.read.parquet(bandTable).count()
    val input2 = MemoryStream[(Long, String)]
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup-bck2").toString
    val replays = new java.util.concurrent.atomic.AtomicInteger(0)
    val q2 = StreamingDedup.admitStream(
      input2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bandTable, ckpt2, Some(ledger), buckets = 4) {
      (_, _) => replays.incrementAndGet(): Unit
    }
    try {
      input2.addData((1L, tA), (2L, tB))
      q2.processAllAvailable()
      assert(replays.get() === 0)
      assert(spark.read.parquet(bandTable).count() === bandsBefore)
    } finally {
      q2.stop()
      spark.sql(s"DROP TABLE IF EXISTS " +
        s"`${graft.ext.Dedup.bandTableName(bandTable)}`"): Unit
    }
  }

  test("band table compaction: one file per bucket, probe unchanged, dupe-tolerant") {
    import spark.implicits._
    import graft.ext.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions.{col, explode}
    val root = java.nio.file.Files
      .createTempDirectory("graft-band-compact").toString
    val bandTable = s"$root/bands"
    def bandsOf(docs: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(Dedup.minhashSignatures(
        docs.select(col("doc_id"),
          explode(TextAnalysis.wordShingles(col("text"), 3)).as("shingle")),
        "doc_id", 8), "doc_id", 8, 2)
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river",
      2L -> "completely different content about distributed query engines",
      3L -> "a third unrelated document discussing parquet row group stats")
    // three bucketed "batches" → ~3 files per touched bucket (the same
    // repartition+publishBucketed path admitBatch runs)
    texts.zipWithIndex.foreach { case ((id, t), i) =>
      val bands = bandsOf(Seq((id, t)).toDF("doc_id", "text"))
      Dedup.ensureBandTable(spark, bandTable, bands.schema, 4): Unit
      bands.repartition(4, col("band"), col("bkey"))
        .write.mode("overwrite")
        .parquet(graft.sources.LakeCommit.stagingDir(bandTable, s"k$i"))
      graft.sources.LakeCommit.publishBucketed(spark, bandTable, s"k$i"): Unit
    }
    def files: Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(bandTable)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.getName).toSeq
    }
    val tbl = Dedup.bandTableName(bandTable)
    val probe = bandsOf(Seq(
      10L -> "the quick brown fox jumps over the lazy dog near the river",
      11L -> "fresh text on watermark semantics in structured streams")
      .toDF("doc_id", "text"))
    def hits: Set[Long] = {
      spark.catalog.refreshTable(tbl)
      Dedup.admissionHits(probe, spark.table(tbl), "doc_id",
        excludeSelf = false).collect().map(_.getLong(0)).toSet
    }
    val beforeFiles = files.size
    assert(beforeFiles > 4, s"expected multiple per-batch files: $files")
    assert(hits === Set(10L))
    val (b1, a1) = Dedup.compactBandTable(spark, bandTable, 4)
    assert(b1 === beforeFiles)
    assert(a1 <= 4)
    assert(files.forall(_.startsWith("bcompact-1-")), files)
    assert(hits === Set(10L))
    // crash window: a compacted copy published but old files not swept →
    // duplicate rows; the SET probe is unchanged, and the next
    // compaction converges back to one file per bucket AND to the
    // original ROW set (its distinct folds the duplicates — without it
    // every crash would compound them into all later generations)
    val rowsClean = spark.read.parquet(bandTable).count()
    spark.table(tbl)
      .repartition(4, col("band"), col("bkey"))
      .write.mode("overwrite")
      .parquet(graft.sources.LakeCommit.stagingDir(bandTable, "crashdup"))
    graft.sources.LakeCommit.publishBucketed(spark, bandTable, "crashdup"): Unit
    spark.catalog.refreshTable(tbl)
    assert(files.size > a1) // duplicates present
    assert(spark.read.parquet(bandTable).count() === 2 * rowsClean)
    assert(hits === Set(10L)) // answers unchanged
    val (_, a2) = Dedup.compactBandTable(spark, bandTable, 4)
    assert(a2 <= 4)
    assert(files.forall(_.startsWith("bcompact-2-")), files)
    assert(spark.read.parquet(bandTable).count() === rowsClean)
    assert(hits === Set(10L))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`"): Unit
  }

  test("crash between band publish and corpus commit converges to one corpus copy") {
    // The onAdmitted contract is at-least-once: a crash after the band
    // publish but before the ledger mark replays the batch and
    // re-delivers the same admitted set. corpusSink (batch-keyed
    // stage-then-publish, same key family as the bands) turns that into
    // end-to-end exactly-once — kill the batch at BOTH crash points and
    // the replay must converge to one copy of every admitted doc.
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-eo").toString
    val bandTable = s"$root/bands"
    val corpusDir = s"$root/corpus"
    val ckpt = s"$root/ck"
    val ledger = new Pipeline.FileBatchLedger(s"$bandTable/_ledger")
    val sink = StreamingDedup.corpusSink(corpusDir, ckpt)
    val key = Pipeline.streamTagOf(ckpt) + "-0"
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "completely different content about distributed query engines and shuffles"
    val docs = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    def corpusIds: Set[Long] =
      try spark.read.parquet(corpusDir).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
    def corpusRows: Long =
      spark.read.parquet(corpusDir).count()

    // crash point 1: bands published, sink never ran
    intercept[RuntimeException] {
      StreamingDedup.admitBatch(docs, 0L, "doc_id", "text", bandTable,
        key, Some(ledger)) { (_, _) =>
        throw new RuntimeException("crash before corpus sink")
      }
    }
    assert(ledger.lastCommitted === -1L)
    val bandsAfter1 = spark.read.parquet(bandTable).count()
    assert(bandsAfter1 > 0)
    assert(corpusIds === Set.empty)

    // crash point 2 (replay of the same key): corpus published, ledger
    // mark never reached — the admitted set must be REPRODUCED (band
    // self-exclusion), not lost
    intercept[RuntimeException] {
      StreamingDedup.admitBatch(docs, 0L, "doc_id", "text", bandTable,
        key, Some(ledger)) { (df, id) =>
        sink(df, id)
        throw new RuntimeException("crash before ledger mark")
      }
    }
    assert(ledger.lastCommitted === -1L)
    assert(spark.read.parquet(bandTable).count() === bandsAfter1)
    assert(corpusIds === Set(1L, 2L))
    assert(corpusRows === 2L)

    // final replay completes: still exactly one copy everywhere
    StreamingDedup.admitBatch(docs, 0L, "doc_id", "text", bandTable,
      key, Some(ledger))(sink)
    assert(ledger.lastCommitted === 0L)
    assert(spark.read.parquet(bandTable).count() === bandsAfter1)
    assert(corpusIds === Set(1L, 2L))
    assert(corpusRows === 2L)

    // and a post-commit replay (restart re-delivery) is a full no-op
    StreamingDedup.admitBatch(docs, 0L, "doc_id", "text", bandTable,
      key, Some(ledger)) { (_, _) =>
      fail("ledger-committed batch must not re-run")
    }
    assert(corpusRows === 2L)
  }
}
