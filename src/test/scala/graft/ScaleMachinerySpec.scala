package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Skew}

/** Scale machinery: salted aggregation equivalence and bucketed
  * (shuffle-free) co-located joins. */
class ScaleMachinerySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("salted two-phase aggregate ≡ direct aggregate (incl. hot key)") {
    import spark.implicits._
    // 90% of rows on one hot key
    val rows = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "HOT", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(df, "k", "v", salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === direct)
  }

  test("salting spreads a hot key whose rows all share ONE value") {
    import spark.implicits._
    // round-1 regression: salt was derived from the value column, so a
    // hot key with a constant value collapsed into a single salt bucket
    val rows = (1 to 10000).map(i =>
      if (i % 10 == 0) (s"key${i % 7}", i.toDouble) else ("HOT", 0.0))
    val df = rows.toDF("k", "v")
    // phase-1 groups actually formed for the hot key
    val hotSaltGroups = df
      .withColumn("_salt", Skew.salt(16))
      .filter($"k" === "HOT")
      .select($"_salt").distinct().count()
    assert(hotSaltGroups > 1, s"hot key collapsed to $hotSaltGroups salt bucket(s)")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(df, "k", "v", salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === direct)
  }

  test("LSH mega-bucket cap bounds candidate pairs") {
    import spark.implicits._
    // one degenerate band key shared by 10k docs (the boilerplate-footer
    // scenario) plus a small genuine bucket of 3 docs
    val mega = (1L to 10000L).map(id => (id, 0, "BOILERPLATE"))
    val small = Seq((20001L, 1, "REAL"), (20002L, 1, "REAL"), (20003L, 1, "REAL"))
    val bands = (mega ++ small).toDF("doc_id", "band", "bkey")
    val capped = Dedup.lshCandidatePairs(bands, "doc_id", maxBucket = 256)
    // uncapped the mega bucket alone would emit ~50M pairs; capped, only
    // the genuine bucket's 3 pairs survive
    assert(capped.count() === 3L)
    assert(Dedup.oversizedBuckets(bands, 256).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq === Seq(("BOILERPLATE", 10000L)))
    // default cap passes small buckets through untouched
    val justSmall = small.toDF("doc_id", "band", "bkey")
    assert(Dedup.lshCandidatePairs(justSmall, "doc_id").count() === 3L)
  }

  test("blockedPairs drops runaway blocks above the cap") {
    import spark.implicits._
    import graft.ext.Similarity
    // one 100-member block (10k pairs uncapped) + one 3-member block
    val rows = (1 to 100).map(i => (i.toLong, Array(1.0f, 0.0f), "BIG")) ++
      Seq((201L, Array(1.0f, 0.0f), "ok"), (202L, Array(0.5f, 0.5f), "ok"),
        (203L, Array(0.0f, 1.0f), "ok"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val capped = Similarity.blockedPairs(df, "vec_id", "embedding", "label",
      maxBlock = 50)
    assert(capped.count() === 3) // only the ok-block's 3 pairs survive
    // default cap leaves gate-scale blocks untouched
    assert(Similarity.blockedPairs(df, "vec_id", "embedding", "label")
      .count() === 100L * 99 / 2 + 3)
  }

  test("streaming dropDuplicates mirrors the e05 first-event dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val deduped = input.toDF()
      .toDF("event_id", "event_type", "user_id")
      .dropDuplicates("user_id", "event_type")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      input.addData((1L, "click", 7L), (2L, "click", 7L), (3L, "view", 7L))
      q.processAllAvailable()
      // redelivery of (7, click) in a later batch is dropped by state
      input.addData((4L, "click", 7L), (5L, "click", 8L))
      q.processAllAvailable()
      val got = spark.table("stream_dedup")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 3L, 5L)) // first arrival per key only
    } finally q.stop()
  }

  test("LSH sample mode keeps a bounded deterministic subset of mega-buckets") {
    import spark.implicits._
    val mega = (1L to 1000L).map(id => (id, 0, "BOILERPLATE"))
    val bands = mega.toDF("doc_id", "band", "bkey")
    val sampled = Dedup.lshCandidatePairs(bands, "doc_id",
      maxBucket = 16, sampleOversized = true)
    // 16-member sample → exactly C(16,2) pairs, same set on every run
    assert(sampled.count() === 16L * 15 / 2)
    assert(sampled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Dedup.lshCandidatePairs(bands, "doc_id", 16, sampleOversized = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("resolveClusters reliable mode checkpoints to stable storage, " +
      "releases superseded rounds' files, and eviction empties the dir") {
    import spark.implicits._
    def ckptFiles(dir: String): Set[String] = {
      val b = Set.newBuilder[String]
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) { b += p.toString; () }
      }
      b.result()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("a_id", "b_id")
    val result = Dedup.resolveClusters(pairs, reliable = true)
    val clusters = result
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // lineage actually went through the reliable checkpoint dir, and
    // only the LIVE checkpoints remain (pair seed released on return,
    // superseded label rounds released as they were supplanted): the
    // chain runs ≥3 label rounds but at most the final one keeps files
    val live = ckptFiles(dir)
    assert(live.nonEmpty)
    val liveDirs = live.map(f =>
      java.nio.file.Paths.get(f).getParent.toString)
    assert(liveDirs.size <= 1, s"superseded rounds leaked: $liveDirs")
    // releasing the backing RDD (what memo eviction does) deletes the rest
    org.apache.spark.sql.graftbridge.DatasetBridge.backingRdds(result)
      .foreach(org.apache.spark.sql.graftbridge.DatasetBridge.releaseRdd(_))
    assert(ckptFiles(dir).isEmpty,
      s"final checkpoint files leaked: ${ckptFiles(dir)}")
  }

  test("bucketed ANN recall vs brute-force ground truth is quantified") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 3))
    def lshRecall(bits: Int): Double = {
      val l = pairs(Similarity.lshTopK(emb, queries,
        "vec_id", "embedding", bits, 3))
      (l & truth).size.toDouble / truth.size
    }
    // the tuning knob the docstring promises, measured: bucket bits must
    // scale with log2(corpus / target cell size). At 500 vectors, 2 bits
    // (~125/bucket) recalls ~0.47 of the true top-3; 8 bits (~2/bucket)
    // collapses to ~0.03. Everything is deterministic, so the curve is
    // exactly reproducible.
    val r2 = lshRecall(2)
    val r8 = lshRecall(8)
    assert(r2 > r8, s"recall must fall as buckets shrink: $r2 vs $r8")
    assert(r2 >= 0.4, s"2-bit LSH recall $r2")
    val centroids = emb.filter(col("vec_id") % 97 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, centroids,
      "vec_id", "embedding", 3))
    val ivfRecall = (ivf & truth).size.toDouble / truth.size
    assert(ivfRecall >= 0.25, s"IVF recall $ivfRecall")
    // multiprobe is a recall-RECOVERY lever: probing 2 cells must never
    // lose pairs found at nprobe=1 (the nprobe=1 cell is always probed)
    val ivf2 = pairs(Similarity.ivfTopKProbed(emb, queries, centroids,
      "vec_id", "embedding", 3, 2))
    val ivf2Recall = (ivf2 & truth).size.toDouble / truth.size
    assert(ivf2Recall >= ivfRecall,
      s"nprobe=2 recall $ivf2Recall < nprobe=1 recall $ivfRecall")
    info(f"recall@3 — lsh(2b): $r2%.2f lsh(8b): $r8%.2f " +
      f"ivf: $ivfRecall%.2f ivf(nprobe=2): $ivf2Recall%.2f")
  }

  test("k-means centroid training is deterministic and lifts IVF recall " +
      "over the arbitrary-subset quantizer") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions.{broadcast, col}
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val t1 = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2)
    val t2 = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toVector)).toSet
    val c1 = key(t1)
    assert(c1 === key(t2)) // bit-identical across runs
    assert(c1.size <= 8 && c1.forall(_._2.size === 64))
    // recall@3 vs brute-force ground truth: trained centroids must beat
    // (or match) the arbitrary mod-97 subset s03 uses
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val truth = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 3)
      .select("query_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cent: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopK(emb, queries, broadcast(cent),
        "vec_id", "embedding", 3)
        .select("query_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val subset = emb.filter(col("vec_id") % 97 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val rTrained = recall(t1)
    val rSubset = recall(subset)
    assert(rTrained >= rSubset,
      s"trained recall $rTrained < subset recall $rSubset")
  }

  test("trained quantizer round-trips through save/load (train once, serve many)") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.saveCentroids(trained, root)
    val loaded = Similarity.loadCentroids(spark, root)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toVector)).toSet
    assert(key(loaded) === key(trained)) // bit-identical index
    // an index RESOLVED BEFORE a republish stays readable after it (the
    // pointer flips; the predecessor version survives one prune cycle) —
    // the frame is resolved now, collected only after the republish
    val pinned = Similarity.loadCentroids(spark, root)
    // republish (retrain cadence): pointer flip is old-or-new atomic
    Similarity.saveCentroids(trained.filter(col("c_id") =!= key(trained)
      .head._1), root)
    assert(key(Similarity.loadCentroids(spark, root)).size ===
      key(trained).size - 1)
    assert(pinned.collect().length === key(trained).size,
      "predecessor version unreadable after the republish")
    // a THIRD publish prunes the first version; only two remain + pointer
    Similarity.saveCentroids(trained, root)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("quantizer-"))
    assert(dirs.length === 2, dirs.map(_.getName).mkString(","))
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.endsWith(".tmp"))) // no pointer staging leftovers
    // a PRODUCT quantizer round-trips with its subspace tags intact
    val pq = Similarity.trainProductQuantizer(emb, "vec_id", "embedding",
      dim = 64, m = 4, kSub = 4, iters = 1)
    val pqRoot = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.saveCentroids(pq, pqRoot)
    val pqLoaded = Similarity.loadCentroids(spark, pqRoot)
    assert(pqLoaded.columns.toSeq === Seq("sub", "c_id", "c_emb"))
    def pqKey(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toVector)).toSet
    assert(pqKey(pqLoaded) === pqKey(
      pq.select(col("sub").cast("int"), col("c_id"), col("c_emb"))))
  }

  test("fused PQ training ≡ independent per-subspace k-means; ADC recall sane") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val (dim, m, kSub) = (64, 4, 8)
    val pq = Similarity.trainProductQuantizer(emb, "vec_id", "embedding",
      dim, m, kSub, iters = 1)
    def cents(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(r.fieldIndex("c_id")),
        r.getSeq[Double](r.fieldIndex("c_emb")).toVector)).toSet
    // the fused single-pipeline trainer must reproduce what m separate
    // trainCentroids runs on the slices produce — that equivalence is
    // what makes the one-scan-per-round optimization safe
    for (s <- 0 until m) {
      val sliced = emb.select(col("vec_id"),
        slice(col("embedding"), s * (dim / m) + 1, dim / m).as("embedding"))
      val solo = Similarity.trainCentroids(sliced, "vec_id", "embedding",
        kSub, 1)
      assert(cents(pq.filter(col("sub") === s)) === cents(solo),
        s"subspace $s diverged from the per-slice trainer")
    }
    // codes: every vector gets exactly m cells, all from the trained set
    val asn = Similarity.pqAssignments(emb, "vec_id", "embedding", pq, dim, m)
    assert(asn.groupBy(col("vec_id")).count()
      .filter(col("count") =!= m).count() === 0)
    // compact code rows assemble the same assignments in subspace order
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", pq, dim, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bySub = asn.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(codes === bySub)
    assert(codes.values.forall(_.length == m))
    // ADC approximate top-5 vs exact inner-product top-5: far above
    // chance (|corpus| = 500, so random recall ~1%)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val adc = Similarity.adcTopK(asn, queries, pq, "vec_id", "embedding",
      dim, m, k = 5).select("query_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = {
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))
      val scored = emb.join(broadcast(q), col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("b_id"),
          Similarity.dot(col("q_emb"), col("embedding")).as("s"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("s").desc, col("b_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("query_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = adc.intersect(exact).size.toDouble / exact.size
    // compressed-domain ADC alone: coarse (8 cells/subspace) but far
    // above the ~1% chance floor
    assert(recall >= 0.05, s"ADC recall@5 $recall — PQ degenerated?")
    // the full two-stage pipeline (ADC shortlist@50 → exact re-rank)
    // must recover most of the exact top-5: the ADC error confines
    // itself to shortlist membership, not final ordering
    val reranked = Similarity.pqSearch(asn, queries, pq, emb,
      "vec_id", "embedding", dim, m, k = 5, shortlist = 100)
      .select("query_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerankRecall = reranked.intersect(exact).size.toDouble / exact.size
    assert(rerankRecall >= 0.5,
      s"re-ranked recall@5 $rerankRecall (raw ADC $recall)")
    assert(rerankRecall > recall) // the re-rank stage must add recall
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val s = spark
    // one key carries ~all left rows; thresholds lowered so the tiny
    // test dataset still trips the skew detector
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val left = (1 to 40000)
        .map(i => (if (i % 100 == 0) i.toLong % 7 else 0L, s"pad-$i"))
        .toDF("k", "payload")
      val right = (0L to 6L).map(k => (k, s"dim-$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // execute THIS query execution (count() would plan a separate one
      // and the join's own AQE final plan would never materialize)
      assert(joined.collect().length === 40000)
      // AQE marks the rewritten sort-merge join as skew-handled
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val o = Tables.orders(s, "/root/testdata/sf0.001")
      val l = Tables.lineitem(s, "/root/testdata/sf0.001")
      o.write.mode("overwrite")
        .option("path", s"$wh/orders_b").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      l.write.mode("overwrite")
        .option("path", s"$wh/lineitem_b").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")
      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the sort-merge join reads bucketed files directly —
      // no ShuffleExchange on either side
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"), plan.take(1200))
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
