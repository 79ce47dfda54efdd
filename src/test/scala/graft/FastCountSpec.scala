package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileManifest, History}

/** Metadata-only COUNT(*): footer row counts from the stats sidecar
  * minus live deletion-vector cardinalities must equal a full scan's
  * count at every lake state — and an unrefreshed sidecar must answer
  * None (fall back to the scan), never a wrong number. */
class FastCountSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def mkLake(): String = {
    import spark.implicits._
    val lake = java.nio.file.Files
      .createTempDirectory("graft-fastcount").toString + "/lake"
    (0L until 50L).map(i => (i, s"payload-$i")).toDF("id", "v")
      .repartition(3).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    lake
  }

  test("fastCount answers from metadata or not at all") {
    import spark.implicits._
    val lake = mkLake()
    // unrefreshed sidecar: no answer, never a guess
    assert(History.fastCount(spark, lake).isEmpty)
    assert(History.refreshRowCounts(spark, lake) === 3)
    assert(History.fastCount(spark, lake) === Some(50L))
    val v0 = FileManifest.latestVersion(
      new org.apache.hadoop.fs.Path(lake).getFileSystem(
        spark.sparkContext.hadoopConfiguration), lake).get

    // evolve: an append (new unstatted file) and a DV takedown
    History.append(spark, lake,
      (100L until 120L).map(i => (i, s"payload-$i")).toDF("id", "v"),
      key = "fc1"): Unit
    History.deleteWhereDV(spark, lake, col("id") % 10 === 3): Unit
    // the appended file has no row-count entry yet → no answer
    assert(History.fastCount(spark, lake).isEmpty)
    assert(History.refreshRowCounts(spark, lake) >= 1)
    val scanned = History.readPinned(spark, lake).count()
    assert(History.fastCount(spark, lake) === Some(scanned),
      "metadata count must equal the scan after append + DV delete")
    assert(scanned === 63L) // 70 rows - 7 ids ending in 3

    // time travel: the pinned baseline still answers exactly
    assert(History.fastCount(spark, lake, Some(v0)) === Some(50L))

    // a second refresh is a no-op (footers are read once per file)
    assert(History.refreshRowCounts(spark, lake) === 0)
  }

  test("fastCount never materializes DV positions; sidecar reads are bounded") {
    import spark.implicits._
    val lake = mkLake()
    History.refreshRowCounts(spark, lake): Unit
    History.deleteKeysDV(spark, lake, "id", Seq(1L, 11L, 21L)): Unit
    History.deleteWhereDV(spark, lake, col("id") % 10 === 7): Unit
    val fs = new org.apache.hadoop.fs.Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val liveDvs = FileManifest.latest(fs, lake).get.dvs.size
    assert(liveDvs >= 1)
    val expected = History.readPinned(spark, lake).count()
    // evict every cache so the count must hit disk — and prove it hits
    // only the cardinality path: zero FULL position parses, at most
    // one cardinality read per live vector
    graft.sources.DeletionVector.evictCache()
    val fullBefore = graft.sources.DeletionVector.dvFileReads.get()
    val cntBefore = graft.sources.DeletionVector.dvCountReads.get()
    assert(History.fastCount(spark, lake) === Some(expected))
    assert(graft.sources.DeletionVector.dvFileReads.get() === fullBefore,
      "fastCount expanded a full deletion vector just to count it")
    val firstPass =
      graft.sources.DeletionVector.dvCountReads.get() - cntBefore
    assert(firstPass <= liveDvs.toLong && firstPass >= 1L,
      s"cardinality reads ($firstPass) exceed live DV files ($liveDvs)")
    // second count: everything cached, zero sidecar I/O of either kind
    assert(History.fastCount(spark, lake) === Some(expected))
    assert(graft.sources.DeletionVector.dvFileReads.get() === fullBefore)
    assert(graft.sources.DeletionVector.dvCountReads.get() ===
      cntBefore + firstPass)
    // and the counts agree with the full parse when one DOES happen
    val m = FileManifest.latest(fs, lake).get
    m.dvs.values.foreach { name =>
      assert(graft.sources.DeletionVector.cardinality(fs, lake, name) ===
        graft.sources.DeletionVector.read(fs, lake, name).length.toLong)
    }
  }
}
