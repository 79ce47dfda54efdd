package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.LmRollup
import graft.sources.{History, IncrementalRollup}
import graft.stream.LakeChangeFeed

/** Maintained LM count tables: derived (row-local transform) rollups
  * stay EXACT under appends and deletes — every tick's state equals a
  * one-shot recompute over the lake's current image. */
class LmRollupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/x"

  private def lake(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = fresh("graft-lm-lake")
    rows.toDF("doc_id", "text").coalesce(2).write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    dir
  }

  private def oneShotBigrams(dir: String): Set[(String, String, Long)] =
    LmRollup.bigramDerive("text")(History.readPinned(spark, dir))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  private def state(rollup: String): Set[(String, String, Long)] =
    LmRollup.read(spark, rollup)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_rows"))).toSet

  test("bigram rollup tracks appends and deletes exactly") {
    import spark.implicits._
    val dir = lake(Seq(
      (1L, "a b a b c"), (2L, "a b"), (3L, "x y x"),
      (4L, null), (5L, "solo")))
    val rollup = fresh("graft-lm-rollup")
    LmRollup.bootstrapBigrams(spark, dir, rollup, "text"): Unit
    assert(state(rollup) === oneShotBigrams(dir))
    // append: new grams add, existing grams increment
    History.append(spark, dir,
      Seq((10L, "a b z"), (11L, "b c")).toDF("doc_id", "text"),
      key = "b1"): Unit
    assert(LmRollup.tickBigrams(spark, dir, rollup, "text").isDefined)
    assert(state(rollup) === oneShotBigrams(dir))
    // COW delete retracts doc 1's grams ((a,b)×2, (b,a), (b,c));
    // (b,a) reaches zero and must DROP from the state
    History.deleteWhere(spark, dir, col("doc_id") === 1L): Unit
    assert(LmRollup.tickBigrams(spark, dir, rollup, "text").isDefined)
    val s = state(rollup)
    assert(s === oneShotBigrams(dir))
    assert(!s.exists(t => t._1 == "b" && t._2 == "a"),
      "a zero-count gram must drop from the state")
    // merge-on-read delete (DV) retracts through the positional feed
    History.deleteKeysDV(spark, dir, "doc_id", Seq(3L)): Unit
    assert(LmRollup.tickBigrams(spark, dir, rollup, "text").isDefined)
    assert(state(rollup) === oneShotBigrams(dir))
    // current rollup: tick no-ops
    assert(LmRollup.tickBigrams(spark, dir, rollup, "text").isEmpty)
  }

  test("unigram rollup: same contract, one-column key") {
    import spark.implicits._
    val dir = lake(Seq((1L, "a b a"), (2L, "c")))
    val rollup = fresh("graft-lm-uni")
    LmRollup.bootstrapUnigrams(spark, dir, rollup, "text"): Unit
    def uni(): Map[String, Long] = LmRollup.read(spark, rollup)
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("n_rows"))
      .toMap
    assert(uni() === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    History.deleteWhere(spark, dir, col("doc_id") === 1L): Unit
    History.append(spark, dir, Seq((3L, "c c")).toDF("doc_id", "text"),
      key = "u1"): Unit
    assert(LmRollup.tickUnigrams(spark, dir, rollup, "text").isDefined)
    assert(uni() === Map("c" -> 3L))
  }

  test("derived rollups join the one-agent maintenance loop") {
    import spark.implicits._
    val dir = lake(Seq((1L, "a b"), (2L, "b c")))
    val rollup = fresh("graft-lm-loop")
    val feed = fresh("graft-lm-feed")
    LmRollup.bootstrapBigrams(spark, dir, rollup, "text"): Unit
    LakeChangeFeed.tick(spark, dir, feed): Unit
    History.append(spark, dir, Seq((3L, "a b")).toDF("doc_id", "text"),
      key = "m1"): Unit
    LakeChangeFeed.tickWithMaintenance(spark, dir, feed,
      lmRollups = Seq(LakeChangeFeed.LmSpec(rollup, "text", "bigram"))): Unit
    assert(state(rollup) === oneShotBigrams(dir))
    assert(state(rollup).contains(("a", "b", 2L)))
    // bad kind fails at construction, not mid-pass
    intercept[IllegalArgumentException] {
      LakeChangeFeed.LmSpec(rollup, "text", "trigram")
    }
  }

  test("scoreDocs serves new docs through the smoothing (unseen grams)") {
    import spark.implicits._
    val dir = lake(Seq((1L, "a b a b"), (2L, "b c")))
    val bi = fresh("graft-lm-sbi"); val uni = fresh("graft-lm-suni")
    LmRollup.bootstrapBigrams(spark, dir, bi, "text"): Unit
    LmRollup.bootstrapUnigrams(spark, dir, uni, "text"): Unit
    // vocab = {a, b, c} = 3; contexts: a→2 (a b ×2), b→2 (b a, b c)
    val scored = LmRollup.scoreDocs(spark, bi, uni,
      Seq((100L, "a b z"), (101L, "q q")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    // doc 100: (a,b) seen c12=2,c1=2 → ln(3/5); (b,z) unseen in a seen
    // context → ln(1/5); doc 101: (q,q) unseen context → ln(1/3)
    def nll(lps: Seq[Double]): Double = {
      val dec = lps.map(lp => BigDecimal(lp).setScale(4,
        BigDecimal.RoundingMode.HALF_UP))
      (-(dec.sum).toDouble / lps.size * 1e6).round / 1e6
    }
    assert(scored(100L)._1 === 2L)
    assert(math.abs(scored(100L)._2 -
      nll(Seq(math.log(3.0 / 5), math.log(1.0 / 5)))) < 1e-9)
    assert(scored(101L)._1 === 1L)
    assert(math.abs(scored(101L)._2 - nll(Seq(math.log(1.0 / 3)))) < 1e-9)
  }

  test("tickDerived refuses an unbootstrapped rollup; derive key contract") {
    import spark.implicits._
    val dir = lake(Seq((1L, "a b")))
    intercept[IllegalStateException] {
      IncrementalRollup.tickDerived(spark, dir, fresh("graft-lm-none"),
        Seq("w1", "w2"), LmRollup.bigramDerive("text"))
    }
    // reserved name collision fails loudly
    intercept[IllegalArgumentException] {
      IncrementalRollup.bootstrapDerived(spark, dir,
        fresh("graft-lm-bad"), Seq("n_rows"),
        df => df.select(lit(1L).as("n_rows")))
    }
  }
}
