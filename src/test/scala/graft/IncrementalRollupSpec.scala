package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{History, IncrementalRollup}

/** Incrementally-maintained materialized rollup: bootstrap once, then
  * every tick applies only the change feed of the commits since the
  * state's version — and at every step the state must equal the full
  * recompute over the lake's current contents. */
class IncrementalRollupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/x"

  private def docsLake(): String = {
    import spark.implicits._
    val lake = fresh("graft-rollup-lake")
    Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L), (4L, "fr", 40L))
      .toDF("doc_id", "lang", "n_chars")
      .coalesce(2).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    lake
  }

  private def stateOf(rollupDir: String): Set[(String, Long, Long)] =
    IncrementalRollup.read(spark, rollupDir).collect()
      .map(r => (r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("sum_n_chars")))).toSet

  private def recompute(lake: String): Set[(String, Long, Long)] =
    History.readPinned(spark, lake).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("bootstrap + ticks track append, delete, and merge exactly") {
    import spark.implicits._
    val lake = docsLake()
    val rollup = fresh("graft-rollup-state")
    val v0 = IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars")
    assert(IncrementalRollup.currentVersion(spark, rollup) === Some(v0))
    assert(stateOf(rollup) === recompute(lake))

    // append a batch (new lang + growth of an existing one)
    History.append(spark, lake,
      Seq((5L, "en", 50L), (6L, "zh", 60L)).toDF("doc_id", "lang", "n_chars"),
      key = "b1"): Unit
    assert(IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), "n_chars").isDefined)
    assert(stateOf(rollup) === recompute(lake))
    assert(stateOf(rollup).exists(_._1 == "zh"))

    // copy-on-write delete: retraction must subtract, not rescan
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    assert(IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), "n_chars").isDefined)
    assert(stateOf(rollup) === recompute(lake))

    // merge: corrections (same key, new value) + inserts in one commit
    History.mergeInto(spark, lake,
      Seq((3L, "de", 300L), (7L, "de", 70L)).toDF("doc_id", "lang", "n_chars"),
      Seq("doc_id")): Unit
    assert(IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), "n_chars").isDefined)
    assert(stateOf(rollup) === recompute(lake))
  }

  test("tick is a no-op when current; bootstrap is idempotent") {
    val lake = docsLake()
    val rollup = fresh("graft-rollup-state")
    val v0 = IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars")
    // second bootstrap must NOT rescan or move the version
    assert(IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars") === v0)
    assert(IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), "n_chars").isEmpty)
    // a replayed tick after catching up converges to the same state
    import spark.implicits._
    History.append(spark, lake, Seq((9L, "en", 90L))
      .toDF("doc_id", "lang", "n_chars"), key = "b2"): Unit
    val r1 = IncrementalRollup.tick(spark, lake, rollup, Seq("lang"), "n_chars")
    assert(r1.isDefined)
    val s1 = stateOf(rollup)
    assert(IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), "n_chars").isEmpty)
    assert(stateOf(rollup) === s1)
  }

  test("hll measures: append-only ticks converge on the full-scan sketch") {
    import spark.implicits._
    import graft.functions.HyperLogLog
    val lake = docsLake()
    val rollup = fresh("graft-rollup-hll")
    IncrementalRollup.bootstrap(spark, lake, rollup, Seq("lang"),
      Seq("n_chars"), distinctCols = Seq("doc_id")): Unit
    History.append(spark, lake,
      Seq((5L, "en", 50L), (1L, "en", 10L), (6L, "zh", 60L))
        .toDF("doc_id", "lang", "n_chars"), key = "hb1"): Unit
    History.append(spark, lake, Seq((7L, "en", 70L))
      .toDF("doc_id", "lang", "n_chars"), key = "hb2"): Unit
    IncrementalRollup.tick(spark, lake, rollup, Seq("lang"),
      Seq("n_chars"), distinctCols = Seq("doc_id")): Unit
    // sketch BYTES equal the full recompute's (register max is
    // order-independent), so estimates can never drift either
    val got = IncrementalRollup.read(spark, rollup)
      .select(col("lang"), col("hll_doc_id")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val want = History.readPinned(spark, lake).groupBy(col("lang"))
      .agg(HyperLogLog.hll_sketch(col("doc_id")).as("s")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, b) =>
      assert(java.util.Arrays.equals(b, want(k)), s"sketch drift for $k") }
    // and the read-side estimate matches the exact distinct count here
    val est = IncrementalRollup.read(spark, rollup)
      .select(col("lang"),
        HyperLogLog.hll_estimate(col("hll_doc_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = History.readPinned(spark, lake).groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact)
  }

  test("hll measures: a range containing deletes fails loudly") {
    val lake = docsLake()
    val rollup = fresh("graft-rollup-hll")
    IncrementalRollup.bootstrap(spark, lake, rollup, Seq("lang"),
      Seq("n_chars"), distinctCols = Seq("doc_id")): Unit
    val v = IncrementalRollup.currentVersion(spark, rollup)
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    intercept[IllegalStateException] {
      IncrementalRollup.tick(spark, lake, rollup, Seq("lang"),
        Seq("n_chars"), distinctCols = Seq("doc_id"))
    }
    // nothing was published — the rollup still reflects its last version
    assert(IncrementalRollup.currentVersion(spark, rollup) === v)
  }

  test("randomized op sequences: ticked state always equals full recompute") {
    import spark.implicits._
    for (seed <- Seq(11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val lake = docsLake()
      val rollup = fresh("graft-rollup-state")
      IncrementalRollup.bootstrap(spark, lake, rollup,
        Seq("lang"), "n_chars"): Unit
      var nextId = 1000L
      (0 until 8).foreach { i =>
        rnd.nextInt(3) match {
          case 0 => // append 1-3 rows across random langs
            val rows = (0 to rnd.nextInt(2)).map { _ =>
              nextId += 1
              (nextId, Seq("en", "de", "fr", "zh")(rnd.nextInt(4)),
                rnd.nextInt(100).toLong)
            }
            History.append(spark, lake,
              rows.toDF("doc_id", "lang", "n_chars"),
              key = s"fz$seed-$i"): Unit
          case 1 => // delete a random id slice (possibly matching nothing)
            History.deleteWhere(spark, lake,
              col("doc_id") % 7 === rnd.nextInt(7).toLong): Unit
          case 2 => // upsert: correct one id, insert one new
            nextId += 1
            History.mergeInto(spark, lake,
              Seq((1L + rnd.nextInt(4).toLong, "en", 500L),
                (nextId, "de", 7L)).toDF("doc_id", "lang", "n_chars"),
              Seq("doc_id")): Unit
        }
        // tick only sometimes, so some ticks span multiple commits
        if (rnd.nextBoolean() || i == 7) {
          IncrementalRollup.tick(spark, lake, rollup,
            Seq("lang"), "n_chars"): Unit
          assert(IncrementalRollup.currentVersion(spark, rollup) ===
            Some(graft.sources.History.versions(spark, lake).last))
          assert(stateOf(rollup) === recompute(lake),
            s"seed=$seed op=$i state diverged from recompute")
        }
      }
    }
  }

  test("crashed stage leftovers are overwritten, never accumulated") {
    import spark.implicits._
    val lake = docsLake()
    val rollup = fresh("graft-rollup-state")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars"): Unit
    History.append(spark, lake, Seq((9L, "en", 90L))
      .toDF("doc_id", "lang", "n_chars"), key = "cb1"): Unit
    // simulate a crash: a stale stage dir for the version the next
    // tick will publish (deterministic name — the retry must replace
    // it, not leak a parallel copy)
    val v = graft.sources.History.versions(spark, lake).last
    val fs = new org.apache.hadoop.fs.Path(rollup)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(rollup, s"_staging/state-v$v")
    fs.mkdirs(stale): Unit
    IncrementalRollup.tick(spark, lake, rollup, Seq("lang"), "n_chars"): Unit
    assert(stateOf(rollup) === recompute(lake))
    val staging = new org.apache.hadoop.fs.Path(rollup, "_staging")
    val leftovers =
      if (!fs.exists(staging)) Array.empty[String]
      else fs.listStatus(staging).map(_.getPath.getName)
    assert(leftovers.isEmpty || leftovers.forall(_ == s"state-v$v"),
      leftovers.mkString(", "))
  }

  test("column names colliding with derived state columns fail loudly") {
    val lake = docsLake()
    val rollup = fresh("graft-rollup-state")
    intercept[IllegalArgumentException] {
      IncrementalRollup.bootstrap(spark, lake, rollup,
        Seq("lang"), Seq("n_rows"))
    }
    intercept[IllegalArgumentException] {
      IncrementalRollup.bootstrap(spark, lake, rollup,
        Seq("lang"), Seq("n_chars", "n_chars"))
    }
  }

  test("multiple sum columns maintain in one state table / one delta scan") {
    import spark.implicits._
    val lake = fresh("graft-rollup-multi")
    Seq((1L, "en", 10L, 2L), (2L, "en", 20L, 3L), (3L, "de", 30L, 5L))
      .toDF("doc_id", "lang", "n_chars", "n_tokens")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val rollup = fresh("graft-rollup-state")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), Seq("n_chars", "n_tokens")): Unit
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    IncrementalRollup.tick(spark, lake, rollup,
      Seq("lang"), Seq("n_chars", "n_tokens")): Unit
    val state = IncrementalRollup.read(spark, rollup)
      .select("lang", "n_rows", "sum_n_chars", "sum_n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(state === Set(("en", 1L, 10L, 2L), ("de", 1L, 30L, 5L)))
  }

  test("a NULL group key merges null-safely instead of forking the group") {
    import spark.implicits._
    val lake = fresh("graft-rollup-nullkey")
    Seq((1L, Some("en"), 10L), (2L, None, 20L), (3L, None, 30L))
      .toDF("doc_id", "lang", "n_chars")
      .coalesce(1).write.parquet(lake)
    History.enableManifests(spark, lake): Unit
    val rollup = fresh("graft-rollup-state")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars"): Unit
    // retract one of the null-key rows: the delta's null key must find
    // the state's null-key row (equi-join semantics would miss it and
    // leave a phantom (null, 2, 50) beside a new (null, 1, 30))
    History.deleteWhere(spark, lake, col("doc_id") === 2L): Unit
    IncrementalRollup.tick(spark, lake, rollup, Seq("lang"), "n_chars"): Unit
    val nullRows = IncrementalRollup.read(spark, rollup)
      .filter(col("lang").isNull).collect()
    assert(nullRows.length === 1, nullRows.mkString(", "))
    assert(nullRows.head.getLong(1) === 1L)
    assert(nullRows.head.getLong(2) === 30L)
    assert(stateOf(rollup).filter(_._1 != null) === Set(("en", 1L, 10L)))
  }

  test("a key retracted to zero leaves the state; old states are pruned") {
    val lake = docsLake()
    val rollup = fresh("graft-rollup-state")
    IncrementalRollup.bootstrap(spark, lake, rollup,
      Seq("lang"), "n_chars"): Unit
    // fr has exactly one row — deleting it must remove the key entirely
    History.deleteWhere(spark, lake, col("lang") === "fr"): Unit
    IncrementalRollup.tick(spark, lake, rollup, Seq("lang"), "n_chars"): Unit
    assert(!stateOf(rollup).exists(_._1 == "fr"))
    assert(stateOf(rollup) === recompute(lake))
    // drive more commits than the retention tail and count state dirs
    import spark.implicits._
    (0 until IncrementalRollup.keepStates + 2).foreach { i =>
      History.append(spark, lake, Seq((100L + i, "en", 1L))
        .toDF("doc_id", "lang", "n_chars"), key = s"b$i"): Unit
      IncrementalRollup.tick(spark, lake, rollup, Seq("lang"), "n_chars"): Unit
    }
    val fs = new org.apache.hadoop.fs.Path(rollup)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val states = fs.listStatus(new org.apache.hadoop.fs.Path(rollup))
      .map(_.getPath.getName).filter(_.startsWith("state-v"))
    assert(states.length <= IncrementalRollup.keepStates,
      states.mkString(", "))
    assert(stateOf(rollup) === recompute(lake))
  }
}
