package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.GapFill

/** Resample + forward fill: grid completeness, zero-fill vs carry-forward
  * semantics, and the leading-null edge (no value to carry before a
  * series' first observation). */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fill(rows: Seq[(String, Long, Long, java.lang.Double)]) = {
    import spark.implicits._
    GapFill.resampleFill(
      rows.toDF("series", "bucket", "n", "v"),
      "series", "bucket", "n", "v", strideSec = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
  }

  test("gaps densify to n=0 with the last value carried forward") {
    spark.sparkContext.setLogLevel("WARN")
    val got = fill(Seq(
      ("a", 100L, 3L, Double.box(1.5)),
      ("a", 130L, 2L, Double.box(9.0)), // 110,120 missing
      ("b", 110L, 1L, Double.box(4.0))))
    // global grid spans 100..130 for BOTH series
    assert(got.keySet === Set(
      "a" -> 100L, "a" -> 110L, "a" -> 120L, "a" -> 130L,
      "b" -> 100L, "b" -> 110L, "b" -> 120L, "b" -> 130L))
    assert(got("a" -> 110L) === ((0L, Some(1.5)))) // gap: carry 1.5
    assert(got("a" -> 120L) === ((0L, Some(1.5))))
    assert(got("a" -> 130L) === ((2L, Some(9.0)))) // observed again
    // b starts at 110: leading bucket has nothing to carry
    assert(got("b" -> 100L) === ((0L, None)))
    assert(got("b" -> 110L) === ((1L, Some(4.0))))
    assert(got("b" -> 130L) === ((0L, Some(4.0)))) // trailing carry
  }

  test("chunked fill ≡ unchunked on seeded random data (few-series escape)") {
    import spark.implicits._
    // 3 series × a long sparse range with null values sprinkled in —
    // exactly the few-series/long-range shape the chunking exists for;
    // chunk sizes chosen to hit mid-chunk, boundary, and empty-chunk
    // carry paths
    val rnd = new scala.util.Random(19)
    val rows = for {
      s <- Seq("s1", "s2", "s3")
      b <- 0 until 400 if rnd.nextDouble() < 0.15
    } yield (s, 1000L + b * 10L, rnd.nextInt(5).toLong + 1L,
      if (rnd.nextDouble() < 0.3) null.asInstanceOf[java.lang.Double]
      else Double.box(math.round(rnd.nextDouble() * 1e4) / 100.0))
    val df = rows.toDF("series", "bucket", "n", "v").repartition(7)
    def canon(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2))
    val plain = canon(GapFill.resampleFill(
      df, "series", "bucket", "n", "v", strideSec = 10L))
    for (chunk <- Seq(1L, 7L, 64L, 100000L)) {
      val chunked = canon(GapFill.resampleFill(
        df, "series", "bucket", "n", "v", strideSec = 10L,
        chunkBuckets = Some(chunk)))
      assert(chunked === plain, s"chunkBuckets=$chunk diverged")
    }
  }

  test("single-bucket input produces a single-cell grid per series") {
    val got = fill(Seq(("x", 50L, 7L, Double.box(2.0))))
    assert(got === Map(("x" -> 50L) -> ((7L, Some(2.0)))))
  }

  test("empty input yields an empty grid, not a failure") {
    assert(fill(Seq.empty).isEmpty)
  }
}
