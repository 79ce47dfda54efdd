package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.KMV

/** KMV bottom-k sketch: estimator accuracy, the exact small-group path,
  * and Jaccard recovery on sets with known overlap. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("distinct estimate lands near truth; small groups report exactly") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // group "big": 5000 distinct values; group "tiny": 10 distinct
    val rows = (0 until 5000).map(i => ("big", s"v$i")) ++
      (0 until 10).map(i => ("tiny", s"t$i"))
    val df = rows.toDF("src", "value")
    val k = 256
    val est = KMV.estimateDistinct(KMV.sketch(df, "src", "value", k),
      "src", k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // KMV relative stderr ~ 1/sqrt(k-2) ~ 6.3%; 3 sigma bound
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.19,
      s"big estimate ${est("big")}")
    assert(est("tiny") === 10.0) // < k values: the sketch IS the set
  }

  test("pairwise Jaccard recovers known overlaps") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 (true J = 1/3), C disjoint from both
    val rows =
      (0 until 1000).map(i => ("A", s"x$i")) ++
        (500 until 1500).map(i => ("B", s"x$i")) ++
        (0 until 300).map(i => ("C", s"z$i"))
    val k = 256
    val j = KMV.pairwiseJaccard(
      KMV.sketch(rows.toDF("src", "value"), "src", "value", k), "src", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(j.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(math.abs(j(("A", "B")) - 1.0 / 3.0) < 0.12, j(("A", "B")).toString)
    assert(j(("A", "C")) === 0.0)
    assert(j(("B", "C")) === 0.0)
  }

  test("sketchTokens over doc arrays equals sketch over the explode") {
    import spark.implicits._
    // docs with repeated words, an empty-string word (split artifact),
    // a null text, and a group whose only doc is null text
    val docs = Seq(
      ("A", "alpha beta gamma alpha"),
      ("A", "beta  delta"), // double space → empty-string token
      ("A", null),
      ("B", "alpha zeta"),
      ("C", null)
    ).toDF("src", "text")
    val k = 8
    val viaExplode = KMV.sketch(
      docs.select(col("src"), explode(split(col("text"), " ")).as("w")),
      "src", "w", k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(identity)
    val viaArrays = KMV.sketchTokens(
      docs.select(col("src"), split(col("text"), " ").as("ws")),
      "src", col("ws"), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(identity)
    assert(viaArrays.toSeq === viaExplode.toSeq)
    // null-text-only group contributes no sketch rows on either path
    assert(!viaArrays.exists(_._1 == "C"))
    // bounded: a long doc still yields ≤ k rows, folded row-free
    val big = Seq(("G", (0 until 500).map(i => s"w$i").mkString(" ")))
      .toDF("src", "text")
    val sk = KMV.sketchTokens(big.select(col("src"),
      split(col("text"), " ").as("ws")), "src", col("ws"), k).collect()
    assert(sk.length === k)
  }

  test("sketch is deterministic and bounded at k rows per group") {
    import spark.implicits._
    val df = (0 until 2000).map(i => ("g", s"v$i")).toDF("src", "value")
    val s1 = KMV.sketch(df, "src", "value", 64).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(s1.length === 64)
    // ranked ascending by hash — rank order IS value order
    assert(s1.map(_._1).toSeq === s1.map(_._1).sorted.toSeq)
    val s2 = KMV.sketch(df, "src", "value", 64).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(s1.toSeq === s2.toSeq)
  }
}
