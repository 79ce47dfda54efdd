package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** Count-Min contract: NEVER an underestimate (the one-sided error that
  * makes sketch-then-verify compositions safe), exact merge linearity
  * across the distributed build, and the SQL surface. */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("estimates never undercount, and are exact at generous width") {
    import spark.implicits._
    // zipf-ish: item i appears 200/(i+1) times
    val rows = (0 until 50).flatMap(i => Seq.fill(200 / (i + 1))(s"w$i"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = rows.toDF("w").repartition(9)
      .agg(CountMin.cms_build(xxhash64(col("w")), 5, 4096).as("sk"))
    val est = rows.distinct.toDF("w")
      .crossJoin(broadcast(sk))
      .select(col("w"), CountMin.cms_estimate(col("sk"), xxhash64(col("w")))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, c) =>
      assert(est(w) >= c, s"UNDERestimate for $w: ${est(w)} < $c")
    }
    // 50 keys into 5×4096 counters: collisions are essentially
    // impossible, so the estimates should be exact here
    assert(est === truth)
  }

  test("distributed build == single-partition build, bit for bit") {
    import spark.implicits._
    val vals = (0 until 3000).map(i => (i % 37).toLong)
    def build(parts: Int): Array[Byte] =
      vals.toDF("v").repartition(parts)
        .agg(CountMin.cms_build(col("v"), 4, 256).as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(13)))
  }

  test("nulls are skipped; empty build estimates zero everywhere") {
    import spark.implicits._
    val a = Seq(Some(1L), None, Some(1L)).toDF("v")
      .agg(CountMin.cms_build(col("v"), 3, 64).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val b = Seq(1L, 1L).toDF("v")
      .agg(CountMin.cms_build(col("v"), 3, 64).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
    val empty = Seq.empty[Long].toDF("v")
      .agg(CountMin.cms_build(col("v"), 3, 64).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(CountMin.estimate(empty, 42L) === 0L)
  }

  test("malformed sketch bytes answer MaxValue, never an undercount") {
    assert(CountMin.estimate(Array.emptyByteArray, 1L) === Long.MaxValue)
    assert(CountMin.estimate(Array[Byte](0, 0, 0, 2, 0, 0, 0, 8), 1L) ===
      Long.MaxValue) // header claims counters it doesn't carry
    // crafted header whose 8*depth*width wraps past Long range must not
    // slip past validation into an out-of-bounds read
    val wrap = java.nio.ByteBuffer.allocate(16)
      .putInt(0x40000000).putInt(0x7fffffff).putLong(7L).array()
    assert(CountMin.estimate(wrap, 1L) === Long.MaxValue)
  }

  test("oversized depth x width is rejected at construction, not mid-job") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Seq(1L).toDF("v")
        .agg(CountMin.cms_build(col("v"), 16, 268435457).as("sk"))
        .collect()
    }
    assert(e.getMessage.contains("too large"), e.getMessage)
  }

  test("SQL surface: cms_build + cms_estimate registered") {
    Views.registerSqlFunctions(spark)
    import spark.implicits._
    Seq.fill(7)("hot").++(Seq("cold")).toDF("s")
      .createOrReplaceTempView("cms_in")
    val got = spark.sql(
      """WITH sk AS (SELECT cms_build(xxhash64(s), 4, 512) AS sk FROM cms_in)
        |SELECT s, cms_estimate(sk, xxhash64(s)) AS est
        |FROM (SELECT DISTINCT s FROM cms_in), sk""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hot") === 7L && got("cold") === 1L, got.toString)
  }

  test("cms_merge of shard sketches ≡ one whole build, bit for bit") {
    import spark.implicits._
    val vals = (0 until 4000).map(i => (i % 61).toLong)
    // per-shard sketches (same depth×width), rolled up through the
    // distributed CmsMergeAgg path — linearity means the merged bytes
    // ARE the single-build bytes, so downstream estimates can't tell
    // how many shards the corpus arrived in
    val merged = vals.toDF("v")
      .withColumn("shard", pmod(col("v"), lit(9)))
      .groupBy("shard")
      .agg(CountMin.cms_build(col("v"), 4, 256).as("sk"))
      .repartition(5) // exercise CmsMergeAgg.merge across partials
      .agg(CountMin.cms_merge(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val whole = vals.toDF("v")
      .agg(CountMin.cms_build(col("v"), 4, 256).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("cms_merge skips nulls; an all-null group answers null") {
    import spark.implicits._
    val sk = Seq(5L, 5L, 6L).toDF("v")
      .agg(CountMin.cms_build(col("v"), 3, 64).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val rows = Seq(("a", Some(sk)), ("a", None), ("b", None))
      .toDF("g", "sk")
    val got = rows.groupBy("g").agg(CountMin.cms_merge(col("sk")).as("m"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(got("a"), sk))
    assert(got("b") === null)
  }
}
