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

  test("non-string items get exact string-equality semantics end to end") {
    // the normalization contract: an int column is cast to string ONCE,
    // and the sketch, total, and verify join all see the same frame —
    // no implicit-coercion join between int rows and string candidates
    import spark.implicits._
    val data = Seq.fill(40)(7) ++ (0 until 60).map(i => 100 + i)
    val df = new scala.util.Random(3).shuffle(data).toDF("num")
      .repartition(5)
    val got = FrequentItems.heavyHitters(df, k = 16, phi = 0.2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("7" -> 40L), got)
  }

  test("null items count toward neither the total nor the candidates") {
    // 2 "a" + 1 "b" + 3 nulls: over the non-null population N=3 the item
    // "a" clears phi=0.5 (2 >= 1.5); if nulls inflated N to 6 the
    // threshold would be 3 and nothing would emit
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .toDF("word")
    val got = FrequentItems.heavyHitters(df, k = 4, phi = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L), got)
  }

  test("native sketch plans one bounded aggregate — no encoder round-trip") {
    import spark.implicits._
    val df = zipfStream(50, 100).toDF("word")
    val hh = FrequentItems.heavyHitters(df, k = 24, phi = 0.05)
    val plan = hh.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), plan.take(1500))
    assert(!plan.contains("DeserializeToObject"), plan.take(1500))
    assert(plan.contains("partial_misragriesagg"), plan.take(1500))
  }

  test("misra_gries is SQL-callable and keeps the candidate guarantee") {
    import spark.implicits._
    Views.registerSqlFunctions(spark) // idempotent temp-function scope
    zipfStream(100, 150).toDF("word").createOrReplaceTempView("mg_words")
    val cands = spark.sql(
      "SELECT explode(misra_gries(word, 12)) AS w FROM mg_words")
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= 12)
    assert(cands.contains("item0")) // ~75/~550 rows ≫ N/k
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
