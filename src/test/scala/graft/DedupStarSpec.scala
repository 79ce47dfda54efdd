package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.ext.Dedup

/** Large-star/small-star CC: identical labels to min-label propagation,
  * exponentially fewer rounds on long-diameter (chain) graphs. */
class DedupStarSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Reference CC by union-find on the driver. */
  private def naive(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => (k, find(k))).toSet
  }

  test("star CC ≡ propagation ≡ union-find on seeded random graphs") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 80 + trial * 20
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val pairs = edges.toDF("a_id", "b_id")
      val plain = labelSet(Dedup.resolveClusters(pairs, maxRounds = 50))
      val star = labelSet(Dedup.resolveClustersStar(pairs))
      assert(star === plain, s"trial $trial: star != propagation")
      assert(star === naive(edges), s"trial $trial: star != union-find")
    }
  }

  test("chain graph: star converges in a fraction of propagation's rounds") {
    import spark.implicits._
    // a 32-node path is the propagation worst case: the min label moves
    // one hop per round (rounds ≈ diameter); star contracts toward the
    // root exponentially
    val n = 32
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    var plainRounds = -1
    var starRounds = -1
    val plain = labelSet(Dedup.resolveClusters(pairs, maxRounds = 100,
      onRounds = plainRounds = _))
    val star = labelSet(Dedup.resolveClustersStar(pairs,
      onRounds = starRounds = _))
    // both fully resolve the chain to cluster 0
    val want = (0L until n.toLong).map(i => (i, 0L)).toSet
    assert(plain === want)
    assert(star === want)
    // the round-count separation the algorithm exists for
    assert(plainRounds >= n / 2,
      s"propagation rounds $plainRounds — chain no longer the worst case?")
    assert(starRounds * 3 <= plainRounds,
      s"star=$starRounds vs propagation=$plainRounds rounds")
  }

  test("propagation budget exhausted: fails over to star, labels stay CORRECT") {
    import spark.implicits._
    // diameter 31 ≫ the default 10-round budget: pre-failover this
    // returned PARTIALLY-propagated labels — silently wrong clusters
    val n = 32
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    var rounds = -1
    val labels = labelSet(Dedup.resolveClusters(pairs,
      onRounds = rounds = _)) // default maxRounds = 10
    assert(labels === (0L until n.toLong).map(i => (i, 0L)).toSet)
    // reported rounds include the exhausted propagation budget + star's
    assert(rounds > 10, s"expected propagation budget + star rounds, got $rounds")
  }

  test("star CC reliable mode: superseded rounds' checkpoint files released, eviction empties") {
    import spark.implicits._
    def ckptFiles(dir: String): Set[String] = {
      val b = Set.newBuilder[String]
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) { b += p.toString; () }
      }
      b.result()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-star-ckpt")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val result = Dedup.resolveClustersStar(pairs, reliable = true)
    assert(labelSet(result) === (0L to 15L).map(i => (i, 0L)).toSet)
    // only the final labels checkpoint holds files — every edge round and
    // the pair seed were released as they were superseded
    val liveDirs = ckptFiles(dir).map(f =>
      java.nio.file.Paths.get(f).getParent.toString)
    assert(liveDirs.nonEmpty && liveDirs.size <= 1,
      s"superseded rounds leaked: $liveDirs")
    org.apache.spark.sql.graftbridge.DatasetBridge.backingRdds(result)
      .foreach(org.apache.spark.sql.graftbridge.DatasetBridge.releaseRdd(_))
    assert(ckptFiles(dir).isEmpty,
      s"final checkpoint files leaked: ${ckptFiles(dir)}")
  }

  test("star CC handles degenerate shapes: self-loops, duplicates, two-node, singleton-free") {
    import spark.implicits._
    val pairs = Seq(
      (5L, 5L),           // self-loop: must not create a spurious edge
      (1L, 2L), (2L, 1L), // duplicate + reversed duplicate
      (7L, 9L)            // disjoint two-node component
    ).toDF("a_id", "b_id")
    val got = labelSet(Dedup.resolveClustersStar(pairs))
    assert(got === Set((1L, 1L), (2L, 1L), (7L, 7L), (9L, 7L), (5L, 5L)))
  }
}
