package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Bloom

/** The Bloom surface's contract: NO false negatives ever (a false
  * negative would make the composed prune-then-verify operator silently
  * drop matches — the one failure mode that corrupts results rather
  * than costing time), a bounded false-positive rate (the cost knob),
  * bit-identical behavior across the distributed merge path, and the
  * SQL registration. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("zero false negatives across a multi-partition build") {
    import spark.implicits._
    val members = (0 until 5000).map(i => s"member-$i")
    // 13 partitions: the buffer merge path (word-wise OR) must preserve
    // every partial's bits
    val filterRow = members.toDF("s").repartition(13)
      .agg(Bloom.bloom_build(xxhash64(col("s")), 5000L, 0.01).as("bf"))
    val probes = members.toDF("s")
      .crossJoin(broadcast(filterRow))
      .filter(!Bloom.bloom_might_contain(col("bf"), xxhash64(col("s"))))
    assert(probes.count() === 0L)
  }

  test("false-positive rate is near the requested fpp") {
    import spark.implicits._
    val members = (0 until 5000).map(i => s"member-$i")
    val filterRow = members.toDF("s")
      .agg(Bloom.bloom_build(xxhash64(col("s")), 5000L, 0.01).as("bf"))
    val absent = (0 until 20000).map(i => s"absent-$i")
    val fp = absent.toDF("s")
      .crossJoin(broadcast(filterRow))
      .filter(Bloom.bloom_might_contain(col("bf"), xxhash64(col("s"))))
      .count()
    val rate = fp.toDouble / 20000
    // 1% nominal; allow generous slack for hash variance, but the order
    // of magnitude must hold or the sizing math is broken
    assert(rate < 0.03, s"false-positive rate $rate >> nominal 0.01")
  }

  test("distributed build == single-partition build, bit for bit") {
    import spark.implicits._
    val vals = (0 until 2000).map(_.toLong)
    def build(parts: Int): Array[Byte] =
      vals.toDF("v").repartition(parts)
        .agg(Bloom.bloom_build(col("v"), 2000L, 0.05).as("bf"))
        .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(11)))
  }

  test("nulls are skipped, not inserted") {
    import spark.implicits._
    val withNulls = Seq(Some(1L), None, Some(2L), None).toDF("v")
    val justVals = Seq(1L, 2L).toDF("v")
    val a = withNulls.agg(Bloom.bloom_build(col("v"), 100L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val b = justVals.agg(Bloom.bloom_build(col("v"), 100L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("empty build answers definitely-absent for everything") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("v")
      .agg(Bloom.bloom_build(col("v"), 100L, 0.01).as("bf"))
    val probed = Seq(1L, 42L, -7L).toDF("x")
      .crossJoin(broadcast(empty))
      .filter(Bloom.bloom_might_contain(col("bf"), col("x")))
    assert(probed.count() === 0L)
  }

  test("malformed filter bytes answer might-contain, never false-negative") {
    // in prune-then-verify, a spurious absent on garbage input silently
    // drops rows; a spurious might-contain only costs a verify lookup
    assert(Bloom.mightContain(Array.emptyByteArray, 42L))
    assert(Bloom.mightContain(Array[Byte](0, 0, 0, 7), 42L)) // header, no words
    assert(Bloom.mightContain( // negative hash count in the header
      Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0, 0, 0, 0, 0), 42L))
  }

  test("SQL surface: bloom_build + bloom_might_contain registered") {
    Views.registerSqlFunctions(spark)
    import spark.implicits._
    (0 until 100).map(i => s"k$i").toDF("s").createOrReplaceTempView("bloom_in")
    val n = spark.sql(
      """WITH f AS (
        |  SELECT bloom_build(xxhash64(s), 100, 0.01) AS bf FROM bloom_in
        |)
        |SELECT count(*) AS hits FROM bloom_in, f
        |WHERE bloom_might_contain(bf, xxhash64(s))""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 100L)
  }

  test("sizing: optimalNumBits/NumHashes match the standard formulas") {
    // n=5000, p=0.01 -> m ~ 47926 bits -> rounded to a word multiple
    val m = Bloom.optimalNumBits(5000L, 0.01)
    assert(m % 64 === 0)
    assert(m >= 47926 && m <= 47926 + 64)
    val k = Bloom.optimalNumHashes(5000L, m)
    assert(k === 7) // round(m/n * ln2)
    // degenerate floor: tiny n still gets a whole word and one hash
    assert(Bloom.optimalNumBits(1L, 0.5) === 64)
    assert(Bloom.optimalNumHashes(1000000L, 64L) === 1)
  }

  test("probe stays inside whole-stage codegen (no eval fallback)") {
    import spark.implicits._
    val bytes = (0 until 50).map(_.toLong).toDF("v")
      .agg(Bloom.bloom_build(col("v"), 50L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    // range -> filter has no exchange, so the plan is non-adaptive and
    // the codegen span is directly inspectable; a doGenCode that failed
    // to compile would fall back to an eval'd Filter outside any span
    val df = spark.range(60)
      .filter(Bloom.bloom_might_contain(lit(bytes), col("id")))
    assert(df.count() >= 50) // every member passes (+ possible FPs)
    val codegenFilter = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collect {
            case f: org.apache.spark.sql.execution.FilterExec => f
          }.nonEmpty => w
    }
    assert(codegenFilter.nonEmpty,
      s"expected the probe Filter inside a codegen span in:\n" +
        df.queryExecution.executedPlan)
  }

  test("bloom_merge of shard filters ≡ one whole build, bit for bit") {
    import spark.implicits._
    val vals = (0 until 3000).map(_.toLong)
    // build per-shard filters (same parameters), then roll them up
    // through the distributed aggregate path — the result must be THE
    // union-set filter, not merely contain it
    val merged = vals.toDF("v")
      .withColumn("shard", pmod(col("v"), lit(7)))
      .groupBy("shard")
      .agg(Bloom.bloom_build(col("v"), 3000L, 0.02).as("bf"))
      .repartition(5) // exercise BloomMergeAgg.merge across partials
      .agg(Bloom.bloom_merge(col("bf")).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val whole = vals.toDF("v")
      .agg(Bloom.bloom_build(col("v"), 3000L, 0.02).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("bloom_merge skips nulls; an all-null group answers null") {
    import spark.implicits._
    val bf = Seq(1L, 2L).toDF("v")
      .agg(Bloom.bloom_build(col("v"), 10L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val rows = Seq(("a", Some(bf)), ("a", None), ("b", None))
      .toDF("g", "bf")
    val got = rows.groupBy("g").agg(Bloom.bloom_merge(col("bf")).as("m"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(got("a"), bf))
    assert(got("b") === null)
  }
}
