package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog.hll_distinct

/** HLL sketch: accuracy envelope vs exact distinct counts, partial-agg
  * merge path, and grouped usage. */
class HyperLogLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def relErr(est: Long, exact: Long): Double =
    math.abs(est.toDouble - exact) / exact

  test("estimate within 5% of exact on documents and lineitem keys") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .repartition(8) // force the serialize/merge partial-agg path
    val exactDocs = docs.select(countDistinct(col("text"))).head().getLong(0)
    val estDocs = docs.select(hll_distinct(col("text"))).head().getLong(0)
    assert(relErr(estDocs, exactDocs) < 0.05, s"$estDocs vs $exactDocs")

    val li = Tables.lineitem(spark, "/root/testdata/sf0.01").repartition(8)
    val exactParts = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val estParts = li.select(hll_distinct(col("l_partkey"))).head().getLong(0)
    assert(relErr(estParts, exactParts) < 0.05, s"$estParts vs $exactParts")
  }

  test("grouped sketches: one estimate per group, sane envelope") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").repartition(8)
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(hll_distinct(col("l_orderkey")).as("est"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(grouped.nonEmpty)
    grouped.foreach { r =>
      assert(relErr(r.getAs[Long]("est"), r.getAs[Long]("exact")) < 0.08,
        r.toString)
    }
  }

  test("determinism: same input → same estimate (fixed hash seed)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.select(hll_distinct(col("text"))).head().getLong(0)
    val b = docs.repartition(16).select(hll_distinct(col("text")))
      .head().getLong(0)
    assert(a === b) // register-wise max is order/partitioning-insensitive
  }
}
