package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Degenerate-corpus robustness: one null, empty, whitespace, or
  * single-word document must never fail a whole 100 TB job. Every text
  * operator is evaluated over the pathological rows and must produce a
  * row (not throw) for each. */
class TextRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val pathological = {
    import spark.implicits._
    Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "word"),
      (5L, "two words"), (6L, "a b c d e f normal document here"))
      .toDF("doc_id", "text")
  }

  test("text operators survive null/empty/whitespace/single-word docs") {
    val df = pathological.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.predictedLang(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.redactPii(col("text")).as("redacted"),
      TextAnalysis.wordShingles(col("text"), 3).as("grams"),
      TextAnalysis.tokenChunks(col("text"), 4, 1).as("chunks"))
    val rows = df.collect()
    assert(rows.length === 6) // nothing threw, every doc produced a row
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // null text: chunks guarded to empty (the round-2 advisory bug:
    // sequence(0, -2, step) threw and failed the job on one null doc)
    assert(byId(1L).getAs[Seq[String]]("chunks") === Seq.empty)
    // short docs chunk to one whole-text chunk, never throw
    assert(byId(4L).getAs[Seq[String]]("chunks") === Seq("word"))
    // repetitionRatio over the projected gram column survives the
    // degenerate rows too (null grams for null text)
    val rep = pathological
      .select(col("doc_id"),
        TextAnalysis.wordShingles(col("text"), 2).as("g"))
      .select(col("doc_id"), TextAnalysis.repetitionRatio(col("g")).as("r"))
      .collect()
    assert(rep.length === 6)
  }

  test("two-level token sharding ≡ single-window on seeded random data") {
    import spark.implicits._
    // one giant key + two small ones — the few-keys shape where a
    // single running-sum window would serialize; block sizes chosen to
    // exercise mid-block cuts, block-boundary cuts, and empty blocks
    // (sparse ord ids)
    val rnd = new scala.util.Random(23)
    val rows = (0 until 500).filter(_ => rnd.nextDouble() < 0.7).map { i =>
      val key = if (i % 10 == 0) "small" + (i % 3) else "giant"
      (key, i.toLong, rnd.nextInt(900).toLong + 100L)
    }
    val df = rows.toDF("source", "doc_id", "n_tok").repartition(7)
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .select("source", "doc_id", "n_tok", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    val plain = canon(graft.ext.TextAnalysis.tokenShards(
      df, "source", "doc_id", "n_tok", budget = 2000.0))
    // shards are contiguous and budget-packed on the plain path
    assert(plain.map(_._4).max >= 2) // the giant key spans several shards
    for (block <- Seq(1L, 16L, 128L, 1000000L)) {
      val chunked = canon(graft.ext.TextAnalysis.tokenShards(
        df, "source", "doc_id", "n_tok", budget = 2000.0,
        blockOrds = Some(block)))
      assert(chunked === plain, s"blockOrds=$block diverged")
    }
  }

  test("as-of join: at-or-before semantics, ties, and missing matches") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 100L, 20L), (1L, 40L, 21L), (1L, 90L, 22L))
      .toDF("user_id", "ts", "event_id")
    val out = graft.ext.AsOf.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_event_id"))).toMap
    assert(out(10L) === Some(20L)) // tie: view AT the click's ts is taken
    assert(out(11L) === Some(21L)) // 40 <= 50 < 90: earlier view wins
    assert(out(12L) === None)      // user 2 has no views at all
  }

  test("interval join: boundary inclusivity, bucket spans, and plan shape") {
    import spark.implicits._
    val pts = Seq((1L, 0L), (2L, 100L), (3L, 150L), (4L, 151L), (5L, 250L))
      .toDF("pid", "ts")
    // interval [100, 150] crosses the bucket-100 grid boundary
    val ivs = Seq((10L, 100L, 150L), (11L, 240L, 260L))
      .toDF("iid", "lo", "hi")
    val out = graft.ext.RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi",
      bucketWidth = 100L)
    val got = out.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100 and 150 are both INSIDE (inclusive bounds); 151 is not; the
    // cross-bucket point 150 is found because the interval exploded
    // into both buckets; 250 lands in [240,260]
    assert(got === Set((2L, 10L), (3L, 10L), (5L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("interval join: width smaller than the longest interval stays correct") {
    import spark.implicits._
    // a small width only costs more interval replicas — it must not
    // drop matches (the explode covers the FULL lo..hi bucket range)
    val pts = Seq((1L, 5L), (2L, 450L), (3L, 999L)).toDF("pid", "ts")
    val ivs = Seq((10L, 0L, 1000L)).toDF("iid", "lo", "hi") // spans 101 buckets
    val got = graft.ext.RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi",
      bucketWidth = 10L).select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("interval join: an inverted interval (hi < lo) fails loudly") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "ts")
    val ivs = Seq((10L, 100L, 50L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      graft.ext.RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi", 100L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("inverted interval")), msgs(e).mkString)
  }

  test("as-of join ≡ naive per-row argmax on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val lefts = (1 to 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val rights = (101 to 180).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val got = graft.ext.AsOf.asofJoin(
        lefts.toDF("k", "ts", "lid"), rights.toDF("k", "ts", "rid"),
        "k", "ts", Seq("rid")).collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_rid")))
        .toMap
      // reference: latest right at-or-before, ties to the LAST in window
      // order (ts asc, then rid via input order) — compute max (ts, rid)
      val want = lefts.map { case (k, lts, lid) =>
        val c = rights.filter(r => r._1 == k && r._2 <= lts)
        lid -> (if (c.isEmpty) None
                else Some(c.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got.keySet === want.keySet)
      // where right (k, ts) is unique the match is exact; duplicated
      // (k, ts) pairs are documented as order-resolved — skip those
      val dupTs = rights.groupBy(r => (r._1, r._2))
        .filter(_._2.size > 1).keySet
      want.foreach { case (lid, w) =>
        val lt = lefts.find(_._3 == lid).get
        val ambiguous = w.exists(rid => {
          val r = rights.find(_._3 == rid).get; dupTs.contains((r._1, r._2))
        })
        if (!ambiguous) assert(got(lid) === w, s"lid=$lid")
      }
    }
  }

  test("salted as-of join ≡ unsalted on seeded random data with a hot key") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // key 0 is hot: ~10x the rows of other keys; right (k, ts) are made
    // UNIQUE so both paths' tie resolution is immaterial
    val lefts = (1 to 300).map { i =>
      val k = if (i % 3 != 0) 0L else rnd.nextInt(4).toLong + 1
      (k, rnd.nextInt(5000).toLong, i.toLong)
    }
    val rights = scala.util.Random.shuffle(
      (0 to 4999).toList).take(400).zipWithIndex.map { case (ts, i) =>
      val k = if (i % 3 != 0) 0L else rnd.nextInt(4).toLong + 1
      (k, ts.toLong, (1000 + i).toLong)
    }
    def run(width: Option[Long]) = graft.ext.AsOf.asofJoin(
      lefts.toDF("k", "ts", "lid"), rights.toDF("k", "ts", "rid"),
      "k", "ts", Seq("rid"), saltBucketWidth = width).collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_rid")))
      .toMap
    val unsalted = run(None)
    // several widths, including one far smaller than the time span
    // (forces carry across many right-free gap buckets)
    for (w <- Seq(50L, 500L, 10000L))
      assert(run(Some(w)) === unsalted, s"width=$w")
    // null keys and null times must survive salting identically too (the
    // unsalted window groups them like any value; a plain equi-join in
    // the salted path would silently drop those left rows)
    val nl: Seq[(Option[Long], Option[Long], Long)] =
      lefts.take(290).map(t => (Some(t._1), Some(t._2), t._3)) ++
        Seq((None, Some(100L), 901L), (Some(0L), None, 902L))
    val nr: Seq[(Option[Long], Option[Long], Long)] =
      rights.take(390).map(t => (Some(t._1), Some(t._2), t._3)) :+
        ((None: Option[Long], Some(50L), 1901L))
    def runNull(width: Option[Long]) = graft.ext.AsOf.asofJoin(
      nl.toDF("k", "ts", "lid"), nr.toDF("k", "ts", "rid"),
      "k", "ts", Seq("rid"), saltBucketWidth = width).collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_rid")))
      .toMap
    assert(runNull(Some(500L)) === runNull(None))
    assert(runNull(None).size === nl.size) // no dropped left rows
    // and the heavy window really shards on (key, bucket)
    val plan = graft.ext.AsOf.asofJoin(
      lefts.toDF("k", "ts", "lid"), rights.toDF("k", "ts", "rid"),
      "k", "ts", Seq("rid"), saltBucketWidth = Some(500L))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_bkt"), plan.take(1500))
  }

  test("salted as-of degenerate-width diagnostic: flags too-narrow, passes sane") {
    import spark.implicits._
    // one key, times spread over [1000, 50000] → width 1 yields ~100
    // (key, bucket) shards for that key; bound 10/key flags it
    val lefts = (1 to 50).map(i => (1L, i * 1000L, i.toLong))
      .toDF("k", "ts", "lid")
    val rights = (1 to 50).map(i => (1L, i * 1000L - 5L, (100 + i).toLong))
      .toDF("k", "ts", "rid")
    def diag(width: Long, bound: Long): graft.ext.AsOf.SaltDiagnostic = {
      val seen = new java.util.concurrent.LinkedBlockingQueue[
        graft.ext.AsOf.SaltDiagnostic]()
      graft.ext.AsOf.asofJoin(lefts, rights, "k", "ts", Seq("rid"),
        saltBucketWidth = Some(width), degenerateBucketsPerKey = bound,
        onSaltDiagnostic = Some(d => { seen.add(d); () })).collect(): Unit
      val d = seen.poll(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(d != null, s"salt diagnostic never fired (width=$width)")
      d
    }
    val bad = diag(width = 1L, bound = 10L)
    assert(bad.degenerate, bad.toString)
    assert(bad.nBuckets > 10L * bad.nKeys)
    // a width sized by the doc formula (range / 10^2) stays healthy
    val ok = diag(width = 500L, bound = 10000L)
    assert(!ok.degenerate, ok.toString)
    // and the guard did not perturb results: same as unsalted
    val unsalted = graft.ext.AsOf.asofJoin(lefts, rights, "k", "ts",
      Seq("rid")).collect().map(_.toSeq).toSet
    val salted = graft.ext.AsOf.asofJoin(lefts, rights, "k", "ts",
      Seq("rid"), saltBucketWidth = Some(1L),
      degenerateBucketsPerKey = 10L).collect().map(_.toSeq).toSet
    assert(salted === unsalted)
  }

  test("interval join ≡ naive cross filter on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val pts = (1 to 80).map(i => (i.toLong, rnd.nextInt(2000).toLong))
      val ivs = (201 to 240).map { i =>
        val lo = rnd.nextInt(2000).toLong
        (i.toLong, lo, lo + rnd.nextInt(100).toLong) // len ≤ 100 = width
      }
      val got = graft.ext.RangeJoin.intervalJoin(
        pts.toDF("pid", "ts"), "ts",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi", bucketWidth = 100L)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, ts) <- pts
        (iid, lo, hi) <- ivs
        if ts >= lo && ts <= hi
      } yield (pid, iid)).toSet
      assert(got === want,
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("dedup pipeline survives a corpus containing degenerate docs") {
    import graft.ext.Dedup
    val shingled = pathological.select(col("doc_id"),
      explode(TextAnalysis.wordShingles(col("text"), 2)).as("shingle"))
    val sigs = Dedup.minhashSignatures(shingled, "doc_id", 4)
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(sigs, "doc_id", 4, 2), "doc_id")
    assert(pairs.count() >= 0) // runs end-to-end, no throw
  }
}
