package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{FrequentItems, Similarity}

/** Scalar (int8) quantization + grouped heavy hitters: the quantizer's
  * reconstruction contract and the summary-vs-exact contract, on data
  * where the exact answers are computable in-spec. */
class SqQuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("sq codes stay in [0, 255] and reconstruct within scale/2") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 50L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 10f - 5f)))
    val df = rows.toDF("vec_id", "embedding")
    val (mins, scales) = Similarity.sqTrain(df, "embedding")
    assert(mins.size === 8 && scales.size === 8)
    val codes = Similarity.sqCodes(df, "vec_id", "embedding", mins, scales)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, emb) =>
      val q = codes(id)
      assert(q.forall(c => c >= 0L && c <= 255L),
        s"vec $id codes out of byte range: $q")
      emb.zipWithIndex.foreach { case (v, d) =>
        val recon = mins(d) + q(d) * scales(d)
        assert(math.abs(recon - v.toDouble) <= scales(d) / 2 + 1e-9,
          s"vec $id dim $d: |$recon - $v| > ${scales(d) / 2}")
      }
    }
  }

  test("constant dimensions quantize to zero without dividing by zero") {
    import spark.implicits._
    val df = Seq((1L, Seq(3.5f, 1f)), (2L, Seq(3.5f, 2f)))
      .toDF("vec_id", "embedding")
    val (mins, scales) = Similarity.sqTrain(df, "embedding")
    assert(scales.head === 1.0) // degenerate dim: sentinel scale
    val codes = Similarity.sqCodes(df, "vec_id", "embedding", mins, scales)
      .collect().map(_.getSeq[Long](1))
    assert(codes.forall(_.head === 0L))
  }

  test("sq ranking approximates exact-dot ranking on separable data") {
    import spark.implicits._
    // orthogonal-ish clusters: quantization must preserve the obvious
    // nearest neighbor (same-cluster vector), k=1
    val base = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(9.5f, 0.1f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f), Seq(0.1f, 9.5f, 0f, 0f),
      Seq(0f, 0f, 10f, 0.2f), Seq(0f, 0.1f, 9.5f, 0f))
    val df = base.zipWithIndex.map { case (v, i) => (i.toLong * 50L, v) }
      .toDF("vec_id", "embedding") // ids 0,50,100,... → all are queries
    val top1 = Similarity.sqTopK(df, df, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(0L) === 50L && top1(50L) === 0L)
    assert(top1(100L) === 150L && top1(150L) === 100L)
    assert(top1(200L) === 250L && top1(250L) === 200L)
  }

  test("published SQ bounds round-trip; the serve path equals one-shot") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0L until 60L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 4f - 2f))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft-sq").toString + "/sq"
    val (mins, scales) = Similarity.sqTrain(df, "embedding")
    Similarity.saveSqBounds(spark, root, mins, scales)
    val (m2, s2) = Similarity.loadSqBounds(spark, root)
    assert(m2 === mins && s2 === scales)
    // re-publish flips the pointer atomically (saveCentroids protocol)
    Similarity.saveSqBounds(spark, root, mins.map(_ + 1.0), scales)
    assert(Similarity.loadSqBounds(spark, root)._1 === mins.map(_ + 1.0))
    // the served path over an at-rest code table returns exactly the
    // one-shot answer (same bounds, same integer dots, same ranks)
    val codesDir = java.nio.file.Files
      .createTempDirectory("graft-sqcodes").toString + "/codes"
    Similarity.sqCodes(df, "vec_id", "embedding", mins, scales)
      .write.parquet(codesDir)
    val queries = df.filter(col("vec_id") % 10 === 0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
    val served = Similarity.sqTopKServed(spark.read.parquet(codesDir),
      queries, "vec_id", "embedding", mins, scales, k = 3)
      .collect().map(key).toSet
    val oneShot = Similarity.sqTopK(df, queries, "vec_id", "embedding", 3)
      .collect().map(key).toSet
    assert(served === oneShot && served.nonEmpty)
  }

  test("grouped heavy hitters equal the exact per-group answer") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = (0 until 3000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // zipf-ish: small ids frequent
      val it = s"w${math.min(rnd.nextInt(40), rnd.nextInt(40))}"
      (g, it)
    }
    val df = items.toDF("grp", "item")
    val got = FrequentItems
      .groupedHeavyHitters(df, "grp", "item", k = 64, phi = 0.05)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
    val totals = items.groupBy(_._1).view.mapValues(_.size.toLong)
    val want = exact.filter { case ((g, _), c) => c >= 0.05 * totals(g) }
    assert(got === want.toMap)
  }

  test("grouped heavy hitters reject an unguaranteed phi") {
    import spark.implicits._
    val df = Seq(("g", "a")).toDF("grp", "item")
    intercept[IllegalArgumentException] {
      FrequentItems.groupedHeavyHitters(df, "grp", "item",
        k = 10, phi = 0.05)
    }
  }
}
