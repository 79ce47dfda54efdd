package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.JoinView
import graft.sources.History

/** Maintained join view (IVM): bootstrap once, advance per source
  * commit on EITHER side, and the materialized rows must equal a fresh
  * `A ⋈ B` over both lakes' current images at every state — including
  * across crashes. */
class JoinViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def mkLakes(): (String, String, String) = {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-joinview").toString
    val a = s"$base/a"
    val b = s"$base/b"
    // A: facts (several rows per key); B: dims (one row per key)
    (0L until 60L).map(i => (i % 20L, i, i * 10L))
      .toDF("k", "a_id", "a_val").repartition(3).write.parquet(a)
    (0L until 20L).map(k => (k, s"dim-$k"))
      .toDF("k", "b_name").repartition(2).write.parquet(b)
    History.enableManifests(spark, a): Unit
    History.enableManifests(spark, b): Unit
    (a, b, s"$base/view")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("a_id"), col("a_val"), col("b_name"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  private def fresh(a: String, b: String) =
    History.readPinned(spark, a).join(History.readPinned(spark, b), "k")

  test("bootstrap materializes the full join; tick follows both sides") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    assert(rows(JoinView.read(spark, view)) === rows(fresh(a, b)))
    assert(rows(JoinView.read(spark, view)).size === 60)

    // evolve BOTH sides in one window: a dim takedown (drops that
    // key's fact rows from the view), a dim rename (delete+append same
    // key), and a new fact batch under existing keys
    History.deleteKeysDV(spark, b, "k", Seq(3L)): Unit
    History.deleteKeysDV(spark, b, "k", Seq(5L)): Unit
    History.append(spark, b, Seq((5L, "dim-5-renamed")).toDF("k", "b_name"),
      key = "b-rename"): Unit
    History.append(spark, a,
      Seq((5L, 100L, 999L), (7L, 101L, 998L)).toDF("k", "a_id", "a_val"),
      key = "a-batch"): Unit
    val (_, nKeys) = JoinView.tick(spark, a, b, view, "k")
    assert(nKeys === 3L) // keys 3, 5, 7
    val got = rows(JoinView.read(spark, view))
    assert(got === rows(fresh(a, b)),
      "maintained view must equal a fresh join over both current images")
    assert(!got.exists(_._1 == 3L), "taken-down dim key must be gone")
    assert(got.exists(t => t._1 == 5L && t._4 == "dim-5-renamed"))
    assert(got.exists(t => t._2 == 101L))
    // no-op tick
    assert(JoinView.tick(spark, a, b, view, "k")._2 === 0L)
  }

  test("an over-cap window fails by COUNT, before any driver key set") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    // a window touching 5 keys against maxKeys=3: the guard must
    // refuse with the re-bootstrap message — decided executor-side
    // (count-first), never by materializing the over-cap set
    History.append(spark, a,
      (0L until 5L).map(k => (k, 1000L + k, 0L))
        .toDF("k", "a_id", "a_val"),
      key = "mass"): Unit
    val e = intercept[IllegalArgumentException] {
      JoinView.tick(spark, a, b, view, "k", maxKeys = 3L)
    }
    assert(e.getMessage.contains("re-bootstrap"), e.getMessage)
    // nothing advanced: marker still at the bootstrap pair, view
    // unchanged, and a wide-enough retry applies the window whole
    val viewBefore = rows(JoinView.read(spark, view))
    val (_, nKeys) = JoinView.tick(spark, a, b, view, "k")
    assert(nKeys === 5L)
    assert(rows(JoinView.read(spark, view)) === rows(fresh(a, b)))
    assert(rows(JoinView.read(spark, view)) !== viewBefore)
  }

  test("crashed tick replays to convergence, including net-zero keys") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    History.deleteKeysDV(spark, b, "k", Seq(4L)): Unit
    JoinView.tick(spark, a, b, view, "k"): Unit
    // crash: the window's (atomic, pair-encoded) marker is lost, and
    // dim 4 comes back IDENTICALLY before the retry
    val fs = new org.apache.hadoop.fs.Path(view).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(JoinView.stateDir(view)))
      .filter(_.getPath.getName.endsWith(".done"))
      .sortBy(_.getPath.getName).lastOption
      .foreach(s => fs.delete(s.getPath, false): Unit)
    History.append(spark, b, Seq((4L, "dim-4")).toDF("k", "b_name"),
      key = "back"): Unit
    JoinView.tick(spark, a, b, view, "k"): Unit
    assert(rows(JoinView.read(spark, view)) === rows(fresh(a, b)),
      "replay must restore the net-zero key's view rows")
    assert(rows(JoinView.read(spark, view)).exists(_._1 == 4L))
  }

  test("an incremental rollup composes over the view lake (agg-of-join)") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    // the view's rows lake is an ordinary manifest lake, so the keyed
    // rollup machinery maintains agg-of-join with NO new machinery:
    // dim corrections and fact appends flow view-tick → rollup-tick
    val rollup = java.nio.file.Files
      .createTempDirectory("graft-jv-rollup").toString + "/r"
    graft.sources.IncrementalRollup.bootstrap(spark,
      JoinView.rowsDir(view), rollup, Seq("b_name"), "a_val"): Unit
    History.deleteKeysDV(spark, b, "k", Seq(9L)): Unit
    History.append(spark, a,
      Seq((8L, 300L, 1000L)).toDF("k", "a_id", "a_val"), key = "m1"): Unit
    JoinView.tick(spark, a, b, view, "k"): Unit
    graft.sources.IncrementalRollup.tick(spark,
      JoinView.rowsDir(view), rollup, Seq("b_name"), "a_val"): Unit
    val got = graft.sources.IncrementalRollup.read(spark, rollup)
      .select(col("b_name"), col("n_rows"), col("sum_a_val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = fresh(a, b).groupBy(col("b_name"))
      .agg(count(lit(1)).as("n"), sum(col("a_val")).cast("bigint").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === want,
      "agg-of-join must follow both sources through the composed ticks")
    assert(!got.exists(_._1 == "dim-9"))
  }

  test("randomized evolution fuzz: view equals fresh join after every tick") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    val rnd = new scala.util.Random(20260814L) // deterministic
    var nextId = 1000L
    (1 to 6).foreach { round =>
      // 1-3 random ops per window, on either side
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => // fact append (possibly under a dim-less key)
            val k = rnd.nextInt(25).toLong
            History.append(spark, a,
              Seq((k, nextId, rnd.nextInt(1000).toLong))
                .toDF("k", "a_id", "a_val"), key = s"fz-a-$nextId"): Unit
            nextId += 1
          case 1 => // dim takedown
            History.deleteKeysDV(spark, b, "k",
              Seq(rnd.nextInt(20).toLong)): Unit
          case 2 => // dim upsert (delete + append)
            val k = rnd.nextInt(20).toLong
            History.deleteKeysDV(spark, b, "k", Seq(k)): Unit
            History.append(spark, b,
              Seq((k, s"dim-$k-r$round")).toDF("k", "b_name"),
              key = s"fz-b-$round-$k"): Unit
          case 3 => // fact takedown
            History.deleteKeysDV(spark, a, "k",
              Seq(rnd.nextInt(25).toLong)): Unit
        }
      }
      JoinView.tick(spark, a, b, view, "k"): Unit
      assert(rows(JoinView.read(spark, view)) === rows(fresh(a, b)),
        s"fuzz round $round diverged")
    }
  }

  test("left-join views keep dim-less facts null-extended through ticks") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k", joinType = "left"): Unit
    // dim takedown: under LEFT the facts for key 6 must SURVIVE with a
    // null dim, not vanish; a fact under a never-dimmed key (77) must
    // appear null-extended too
    History.deleteKeysDV(spark, b, "k", Seq(6L)): Unit
    History.append(spark, a, Seq((77L, 500L, 1L)).toDF("k", "a_id", "a_val"),
      key = "lj1"): Unit
    JoinView.tick(spark, a, b, view, "k", joinType = "left"): Unit
    def leftRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("a_id"), col("b_name")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSet
    val got = leftRows(JoinView.read(spark, view))
    val want = leftRows(History.readPinned(spark, a)
      .join(History.readPinned(spark, b), Seq("k"), "left"))
    assert(got === want)
    assert(got.exists(t => t._1 == 6L && t._3 == null),
      "facts for the taken-down dim must survive null-extended")
    assert(got.exists(t => t._1 == 77L && t._3 == null))
  }

  test("a one-sided window ticks without touching the other feed") {
    import spark.implicits._
    val (a, b, view) = mkLakes()
    JoinView.bootstrap(spark, a, b, view, "k"): Unit
    History.append(spark, a, Seq((11L, 200L, 42L)).toDF("k", "a_id", "a_val"),
      key = "a-only"): Unit
    val (_, nKeys) = JoinView.tick(spark, a, b, view, "k")
    assert(nKeys === 1L)
    assert(rows(JoinView.read(spark, view)) === rows(fresh(a, b)))
  }
}
