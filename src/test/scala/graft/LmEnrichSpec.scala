package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.LmRollup
import graft.sources.History
import graft.stream.LmEnrich

/** Streaming LM admission scoring: per-batch scores equal the batch
  * scoreDocs on the same rows, and a model tick BETWEEN batches is
  * picked up at the next batch boundary — the live-filter semantic. */
class LmEnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("per-batch scores match batch scoreDocs; ticks apply next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val lake = java.nio.file.Files
      .createTempDirectory("graft-lmenrich-lake").toString + "/lake"
    Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val bi = java.nio.file.Files
      .createTempDirectory("graft-lmenrich-bi").toString + "/x"
    val uni = java.nio.file.Files
      .createTempDirectory("graft-lmenrich-uni").toString + "/x"
    LmRollup.bootstrapBigrams(spark, lake, bi, "text"): Unit
    LmRollup.bootstrapUnigrams(spark, lake, uni, "text"): Unit
    val got = new java.util.concurrent.ConcurrentHashMap[
      Long, Map[Long, Option[Double]]]()
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-lmenrich-ck").toString
    val q = LmEnrich.scoreStream(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bi, uni, ckpt) { (df, id) =>
      got.put(id, df.collect().map { r =>
        r.getAs[Long]("doc_id") ->
          (if (r.isNullAt(r.fieldIndex("avg_nll"))) None
           else Some(r.getAs[Double]("avg_nll")))
      }.toMap): Unit
    }
    def batchScore(rows: Seq[(Long, String)]): Map[Long, Double] =
      LmRollup.scoreDocs(spark, bi, uni, rows.toDF("doc_id", "text"),
        "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("avg_nll")).toMap
    try {
      val b1 = Seq((100L, "a b c"), (101L, "z z"))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(got.get(0L) === batchScore(b1).view.mapValues(Some(_)).toMap)
      // evolve the model BETWEEN batches: new corpus doc makes (z, z)
      // a seen bigram — the next batch must score against the new
      // version without a stream restart
      val before = got.get(0L)(101L).get
      History.append(spark, lake,
        Seq((3L, "z z z")).toDF("doc_id", "text"), key = "e1"): Unit
      LmRollup.tickBigrams(spark, lake, bi, "text"): Unit
      LmRollup.tickUnigrams(spark, lake, uni, "text"): Unit
      val b2 = Seq((102L, "z z"), (103L, "solo"), (104L, ""))
      input.addData(b2: _*)
      q.processAllAvailable()
      // scoreable docs match the batch path ...
      assert(got.get(1L).filter(_._2.isDefined) ===
        batchScore(Seq((102L, "z z"))).view.mapValues(Some(_)).toMap)
      assert(got.get(1L)(102L).get < before,
        "a (z,z)-seen model must score 'z z' better than the unseen one")
      // ... and UNSCOREABLE docs still surface (null score): an
      // admission filter must route every doc it saw, not drop them
      assert(got.get(1L).keySet === Set(102L, 103L, 104L))
      assert(got.get(1L)(103L).isEmpty && got.get(1L)(104L).isEmpty)
    } finally q.stop()
  }
}
