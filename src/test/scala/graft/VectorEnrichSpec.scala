package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ext.Similarity
import graft.stream.VectorEnrich

/** Serve-side of the train-once quantizer: each micro-batch's
  * embeddings are assigned to the PUBLISHED centroids, and the
  * streaming assignments match the batch assignCells on the same
  * rows — one codebook, one answer, regardless of arrival mode. */
class VectorEnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streaming cell assignment matches batch assignCells per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // train + publish (the s07 batch pipeline): pointer-file versioned
    val qPath = java.nio.file.Files
      .createTempDirectory("graft-quantizer").toString
    Similarity.saveCentroids(
      Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 1), qPath)
    val rows = emb.select("vec_id", "embedding").limit(40)
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(20)
    val got = new java.util.concurrent.ConcurrentHashMap[
      Long, Set[(Long, Long)]]()
    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-enrich-ck").toString
    val q = VectorEnrich.assignStream(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", qPath, ckpt) { (df, id) =>
      got.put(id, df.select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet): Unit
    }
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val loaded = Similarity.loadCentroids(spark, qPath)
      def expect(batch: Seq[(Long, Seq[Float])]): Set[(Long, Long)] =
        Similarity.assignCells(batch.toDF("vec_id", "embedding"),
          "vec_id", "embedding", loaded)
          .select("vec_id", "cell").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.get(0L) === expect(b1))
      assert(got.get(1L) === expect(b2))
      // every streamed vector got exactly one cell
      assert(got.get(0L).map(_._1) === b1.map(_._1).toSet)
      assert(got.get(1L).map(_._1) === b2.map(_._1).toSet)
    } finally q.stop()
  }
}
