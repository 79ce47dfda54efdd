package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.FrequentItems

/** Two-pass heavy hitters: the exact contract must survive sketch
  * eviction — a tiny k forces the Misra-Gries decrement and merge paths
  * on skewed seeded data, and the result must STILL equal the plain
  * exact GROUP BY (that is the whole point of the verify pass). */
class FrequentItemsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Seeded Zipf-ish stream: item i appears ~ N/(i+1) times, shuffled
    * deterministically so partitions interleave hot and cold items. */
  private def zipfStream(nItems: Int, scale: Int): Seq[String] = {
    val raw = (0 until nItems).flatMap(i =>
      Seq.fill(scale / (i + 1))(s"item$i"))
    val rnd = new scala.util.Random(42)
    rnd.shuffle(raw)
  }

  test("heavy hitters == exact GROUP BY even when the sketch evicts") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 200 distinct items, ~1180 rows; k=24 counters (far below the
    // vocabulary) forces constant eviction; phi=0.05 > 1/24
    val data = zipfStream(200, 200)
    val df = data.toDF("word").repartition(7) // multiple partials to merge
    val got = FrequentItems.heavyHitters(df, k = 24, phi = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = data.size
    val exact = data.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      .filter { case (_, c) => c >= 0.05 * n }
    assert(got === exact, s"got $got expected $exact")
    assert(got.nonEmpty) // the gate must not pass vacuously
  }

  test("uniform stream with no heavy hitters returns empty, not noise") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"u${i % 100}").toDF("word")
    // every item is exactly 1% < phi=5%
    val got = FrequentItems.heavyHitters(df, k = 64, phi = 0.05).collect()
    assert(got.isEmpty)
  }

  test("empty input yields an empty result, not a failure") {
    import spark.implicits._
    val got = FrequentItems.heavyHitters(
      Seq.empty[String].toDF("word"), k = 16, phi = 0.1).collect()
    assert(got.isEmpty)
  }

  test("phi <= 1/k is rejected (the guarantee would not hold)") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("word")
    intercept[IllegalArgumentException] {
      FrequentItems.heavyHitters(df, k = 10, phi = 0.05)
    }
  }

  test("MisraGries summary never exceeds k counters and keeps true HHs") {
    val mg = new FrequentItems.MisraGries(8)
    // one item at 40%, the rest spread across 100 cold items
    val stream = zipfStream(1, 400) ++ (0 until 600).map(i => s"c${i % 100}")
    val rnd = new scala.util.Random(7)
    val parts = rnd.shuffle(stream).grouped(100).toSeq
    val partials = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
    partials.foreach(b => assert(b.size <= 8))
    val merged = partials.reduce(mg.merge)
    assert(merged.size <= 8)
    assert(mg.finish(merged).contains("item0")) // 40% ≫ N/k = 12.5%
  }
}
