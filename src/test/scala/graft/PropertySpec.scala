package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.TopKAggregator.{Scored, TopK}
import graft.sources.{PayloadTransport, ReconnectingReader}

/** ScalaCheck properties over the pure-logic cores (no Spark session):
  * top-k aggregator laws and reconnect-reader delivery invariants. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val genScored: Gen[List[Scored]] = Gen.listOf(
    Gen.zip(Gen.choose(0L, 30L), Gen.choose(-100, 100))
      .map { case (id, s) => Scored(id, s.toDouble) })

  test("deletion-vector sidecars round-trip any position multiset") {
    // write(unsorted, duplicated positions) → read must yield the
    // sorted distinct set — the RLE encoder/decoder pair is the one
    // place a position could silently shift, and a shifted position is
    // a wrong-row delete
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val lake = java.nio.file.Files
      .createTempDirectory("graft-dv-prop").toString
    val genPositions: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(0L, 30L), // dense: exercises run coalescing
      Gen.choose(0L, 1000000000L))) // sparse: exercises singletons
    var i = 0
    check(Prop.forAll(genPositions) { positions =>
      i += 1
      val name = graft.sources.DeletionVector.write(fs, lake,
        s"part-$i.parquet", positions.toArray, version = i.toLong)
      graft.sources.DeletionVector.evictCache() // force a physical read
      val back = graft.sources.DeletionVector.read(fs, lake, name)
      back.toSeq == positions.distinct.sorted
    })
  }

  test("Md5Prefix.hash ≡ numeric value of the md5 hex prefix") {
    // the native expression must stay bit-identical to the composed
    // conv(substring(md5(x),1,n),16,10) form every DuckDB oracle
    // computes — any drift silently breaks the KMV/MinHash/bucket gates
    val genBytes = Gen.oneOf(
      Gen.alphaNumStr.map(_.getBytes("UTF-8")),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))
    check(Prop.forAll(genBytes, Gen.oneOf(2, 4, 6, 8, 10, 12, 14)) {
      (bytes, n) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        val expected = java.lang.Long.parseLong(hex.take(n), 16)
        graft.functions.Md5Prefix.hash(bytes, n) == expected
    })
  }

  // ----- SchemaLog laws: the evolution relation is a partial order and
  // writers survive evolutions (pure logic, no Spark session) -----

  private val genPrim: Gen[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Gen.oneOf(ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, StringType, BooleanType, DateType)
  }

  private def genStruct(names: Seq[String])
      : Gen[org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types._
    Gen.sequence[Seq[StructField], StructField](names.map(n =>
      genPrim.map(t => StructField(n, t, nullable = true))))
      .map(fs => StructType(fs))
  }

  /** Constructive enumerations of the widening lattice (a `suchThat`
    * over random picks exhausts — e.g. only StringType widens to
    * StringType). */
  private def narrowersOf(t: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    t match {
      case ShortType => Seq(ByteType, ShortType)
      case IntegerType => Seq(ByteType, ShortType, IntegerType)
      case LongType => Seq(ByteType, ShortType, IntegerType, LongType)
      case DoubleType => Seq(FloatType, DoubleType)
      case other => Seq(other)
    }
  }

  private def widersOf(t: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType => Seq(ByteType, ShortType, IntegerType, LongType)
      case ShortType => Seq(ShortType, IntegerType, LongType)
      case IntegerType => Seq(IntegerType, LongType)
      case FloatType => Seq(FloatType, DoubleType)
      case other => Seq(other)
    }
  }

  test("widensTo is a partial order on the primitive lattice") {
    import graft.sources.SchemaLog.widensTo
    check(Prop.forAll(genPrim, genPrim, genPrim) { (a, b, c) =>
      val refl = widensTo(a, a)
      val trans = !(widensTo(a, b) && widensTo(b, c)) || widensTo(a, c)
      val antisym = !(widensTo(a, b) && widensTo(b, a)) || a.sql == b.sql
      refl && trans && antisym
    })
  }

  test("any batch legal before an evolution stays legal after it") {
    // THE compatibility law: evolving the table never breaks a
    // deployed writer. A batch is a sub-struct with equal-or-narrower
    // types; an evolution widens types and adds nullable columns —
    // validateWrite must still accept the old batch against the new
    // declaration.
    import org.apache.spark.sql.types._
    import graft.sources.SchemaLog
    val names = Seq("a", "b", "c", "d")
    val genCase = for {
      declared <- genStruct(names)
      // a legal batch: subset of columns, equal-or-narrower types
      keep <- Gen.someOf(declared.fields.toSeq)
      batch <- Gen.sequence[Seq[StructField], StructField](keep.map { f =>
        Gen.oneOf(narrowersOf(f.dataType)).map(t => f.copy(dataType = t))
      })
      // a legal evolution: widen some fields, add a nullable column
      evolved <- Gen.sequence[Seq[StructField], StructField](
        declared.fields.toSeq.map { f =>
          Gen.oneOf(widersOf(f.dataType)).map(t => f.copy(dataType = t))
        })
      extra <- genPrim.map(t => StructField("e", t, nullable = true))
    } yield (declared, StructType(batch), StructType(evolved :+ extra))
    check(Prop.forAll(genCase) { case (declared, batch, evolved) =>
      SchemaLog.validateEvolution(declared, evolved) // legal by construction
      SchemaLog.validateWrite(declared, batch) // legal by construction
      SchemaLog.validateWrite(evolved, batch) // MUST remain legal
      true
    })
  }

  test("evolutions compose: old -> a legal and a -> b legal => old -> b legal") {
    import org.apache.spark.sql.types._
    import graft.sources.SchemaLog
    val genChain = for {
      old <- genStruct(Seq("a", "b", "c"))
      a <- Gen.sequence[Seq[StructField], StructField](
        old.fields.toSeq.map { f =>
          Gen.oneOf(widersOf(f.dataType)).map(t => f.copy(dataType = t))
        })
      b <- Gen.sequence[Seq[StructField], StructField](
        a.map { f =>
          Gen.oneOf(widersOf(f.dataType)).map(t => f.copy(dataType = t))
        })
      extraA <- Gen.option(genPrim.map(t => StructField("d", t)))
    } yield (old, StructType(a ++ extraA.toSeq),
      StructType(b ++ extraA.toSeq))
    check(Prop.forAll(genChain) { case (old, a, b) =>
      SchemaLog.validateEvolution(old, a)
      SchemaLog.validateEvolution(a, b)
      SchemaLog.validateEvolution(old, b) // transitivity
      true
    })
  }

  test("TopK.reduce fold ≡ global sort.take(k)") {
    check(Prop.forAll(genScored, Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopK(k)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      val want = xs.sortBy(s => (-s.score, s.id)).take(k)
      got == want
    })
  }

  test("TopK.merge of any split ≡ fold of the whole (shuffle-safety)") {
    check(Prop.forAll(genScored, Gen.choose(1, 8), Gen.choose(0, 100)) {
      (xs, k, cut) =>
        val agg = new TopK(k)
        val (l, r) = xs.splitAt(cut % (xs.size + 1))
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        merged == xs.foldLeft(agg.zero)(agg.reduce)
    })
  }

  /** Transport following a generated per-connection plan: `failNow` throws
    * at connect; otherwise the connection yields `span ≥ 1` docs then
    * breaks (unless exhausted). */
  private class PlannedTransport(docs: Vector[String],
      plan: Iterator[(Boolean, Int)]) extends PayloadTransport {
    override def available(): Long = docs.length.toLong
    override def read(from: Long, until: Long): Iterator[String] = {
      val (failNow, span) = if (plan.hasNext) plan.next() else (false, Int.MaxValue)
      if (failNow) throw new java.io.IOException("connect failed")
      val chunk = docs.slice(from.toInt, until.toInt)
      val keep = math.max(1, span)
      new Iterator[String] {
        private var i = 0
        override def hasNext: Boolean = i < chunk.length
        override def next(): String = {
          if (i >= keep && i < chunk.length)
            throw new java.io.IOException("mid-stream drop")
          val d = chunk(i); i += 1; d
        }
      }
    }
  }

  private val genPlan: Gen[List[(Boolean, Int)]] = Gen.listOf(
    Gen.zip(Gen.prob(0.3), Gen.choose(1, 5)))

  test("ReconnectingReader: exactly-once in-order delivery under any plan within budget") {
    val docs = (0 until 12).map(i => s"doc$i").toVector
    check(Prop.forAll(genPlan) { plan =>
      // budget property: the reader dies only on >3 consecutive connect
      // failures; otherwise every doc arrives exactly once, in order
      val reader = new ReconnectingReader(
        new PlannedTransport(docs, plan.iterator), maxReconnects = 3)
      try {
        val got = reader.read(0, docs.length).toList
        got == docs.toList
      } catch {
        case _: java.io.IOException =>
          // acceptable only if the plan contains 4+ consecutive failures
          // somewhere (connect failures and mid-stream drops both count
          // against the budget until a doc succeeds)
          plan.exists(_._1)
      }
    })
  }

  test("ReconnectingReader: failure-free plans always deliver everything") {
    val docs = (0 until 20).map(i => s"d$i").toVector
    check(Prop.forAll(Gen.listOf(Gen.choose(1, 4))) { spans =>
      val plan = spans.map(s => (false, s))
      val got = new ReconnectingReader(
        new PlannedTransport(docs, plan.iterator), maxReconnects = 3)
        .read(0, docs.length).toList
      got == docs.toList
    })
  }

  // ----- Bloom pure-core laws (graft.functions.Bloom) -----

  private def bloomBytes(words: Array[Long], k: Int): Array[Byte] = {
    // the BloomBuildAgg.eval layout: [int32 numHashes][int64 × words]
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * words.length)
    bb.putInt(k)
    words.foreach(bb.putLong)
    bb.array()
  }

  private val genBloomCase: Gen[(List[Long], Int, Int)] = for {
    vals <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    nWords <- Gen.choose(1, 16)
    k <- Gen.choose(1, 9)
  } yield (vals, nWords, k)

  test("Bloom: no false negatives for ANY buffer size / hash count / input") {
    check(Prop.forAll(genBloomCase) { case (vals, nWords, k) =>
      val words = new Array[Long](nWords)
      vals.foreach(v => graft.functions.Bloom.setBits(words, k, v))
      val bytes = bloomBytes(words, k)
      vals.forall(v => graft.functions.Bloom.mightContain(bytes, v))
    })
  }

  test("Bloom: split-build + word-OR merge ≡ whole build, bit for bit") {
    check(Prop.forAll(genBloomCase, Gen.choose(0, 100)) {
      case ((vals, nWords, k), cut) =>
        val (a, b) = vals.splitAt(cut % (vals.size + 1))
        val wa = new Array[Long](nWords)
        val wb = new Array[Long](nWords)
        a.foreach(v => graft.functions.Bloom.setBits(wa, k, v))
        b.foreach(v => graft.functions.Bloom.setBits(wb, k, v))
        val merged = wa.zip(wb).map { case (x, y) => x | y }
        val whole = new Array[Long](nWords)
        vals.foreach(v => graft.functions.Bloom.setBits(whole, k, v))
        java.util.Arrays.equals(merged, whole)
    })
  }

  test("Bloom: an unset buffer answers definitely-absent for everything") {
    check(Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
        Gen.choose(1, 16), Gen.choose(1, 9)) { (probes, nWords, k) =>
      val bytes = bloomBytes(new Array[Long](nWords), k)
      probes.forall(v => !graft.functions.Bloom.mightContain(bytes, v))
    })
  }

  // ----- Count-Min pure-core laws (graft.functions.CountMin) -----

  private def cmsBytes(counters: Array[Long], depth: Int,
                       width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(depth); bb.putInt(width)
    counters.foreach(bb.putLong)
    bb.array()
  }

  private def cmsInsert(counters: Array[Long], depth: Int, width: Int,
                        h: Long): Unit = {
    var d = 0
    while (d < depth) {
      counters(d * width + graft.functions.CountMin.pos(h, d, width)) += 1
      d += 1
    }
  }

  test("CMS: never an underestimate, for ANY depth/width/input") {
    check(Prop.forAll(Gen.listOf(Gen.choose(-50L, 50L)),
        Gen.choose(1, 6), Gen.choose(1, 64)) { (vals, depth, width) =>
      val c = new Array[Long](depth * width)
      vals.foreach(cmsInsert(c, depth, width, _))
      val bytes = cmsBytes(c, depth, width)
      val truth = vals.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (v, n) =>
        graft.functions.CountMin.estimate(bytes, v) >= n
      }
    })
  }

  test("CMS: split-build + element-wise-sum merge ≡ whole build") {
    check(Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
        Gen.choose(1, 6), Gen.choose(1, 64), Gen.choose(0, 100)) {
      (vals, depth, width, cut) =>
        val (a, b) = vals.splitAt(cut % (vals.size + 1))
        val ca = new Array[Long](depth * width)
        val cb = new Array[Long](depth * width)
        a.foreach(cmsInsert(ca, depth, width, _))
        b.foreach(cmsInsert(cb, depth, width, _))
        val merged = ca.zip(cb).map { case (x, y) => x + y }
        val whole = new Array[Long](depth * width)
        vals.foreach(cmsInsert(whole, depth, width, _))
        java.util.Arrays.equals(merged, whole)
    })
  }

  // ----- mergeBytes algebra (the cms_merge / bloom_merge cores) -----
  // A shard roll-up folds sketches in whatever order and grouping the
  // shuffle delivers — the result is only well-defined if the fold is
  // a commutative monoid. These laws pin that algebra on the exact
  // serialized-bytes functions the aggregates call.

  private def cmsOf(vals: List[Long], depth: Int, width: Int): Array[Byte] = {
    val c = new Array[Long](depth * width)
    vals.foreach(cmsInsert(c, depth, width, _))
    cmsBytes(c, depth, width)
  }

  private val genCmsTriple: Gen[(List[Long], List[Long], List[Long], Int, Int)] =
    for {
      a <- Gen.listOf(Gen.choose(-40L, 40L))
      b <- Gen.listOf(Gen.choose(-40L, 40L))
      c <- Gen.listOf(Gen.choose(-40L, 40L))
      depth <- Gen.choose(1, 6)
      width <- Gen.choose(1, 64)
    } yield (a, b, c, depth, width)

  test("CMS mergeBytes: commutative + associative + zero-sketch identity") {
    check(Prop.forAll(genCmsTriple) { case (va, vb, vc, d, w) =>
      val M = graft.functions.CountMin.mergeBytes _
      val (a, b, c) = (cmsOf(va, d, w), cmsOf(vb, d, w), cmsOf(vc, d, w))
      val zero = cmsOf(Nil, d, w)
      java.util.Arrays.equals(M(a, b), M(b, a)) &&
        java.util.Arrays.equals(M(M(a, b), c), M(a, M(b, c))) &&
        java.util.Arrays.equals(M(a, zero), a)
    })
  }

  test("CMS mergeBytes: merged estimate dominates the shard estimates") {
    // counts add element-wise, so min-over-rows of the sums is at least
    // the sum of the per-shard minima — the merged sketch can only grow
    // estimates, and the one-sided (never-under) contract survives the
    // merge for the COMBINED true counts
    check(Prop.forAll(genCmsTriple) { case (va, vb, _, d, w) =>
      val merged = graft.functions.CountMin.mergeBytes(
        cmsOf(va, d, w), cmsOf(vb, d, w))
      val (ba, bb) = (cmsOf(va, d, w), cmsOf(vb, d, w))
      val truth = (va ++ vb).groupBy(identity).view.mapValues(_.size.toLong)
      (va ++ vb).distinct.forall { v =>
        val em = graft.functions.CountMin.estimate(merged, v)
        val ea = graft.functions.CountMin.estimate(ba, v)
        val eb = graft.functions.CountMin.estimate(bb, v)
        em >= ea + eb && em >= truth(v)
      }
    })
  }

  test("CMS mergeBytes: shape mismatch fails loudly, never answers") {
    check(Prop.forAll(Gen.choose(1, 6), Gen.choose(1, 6),
        Gen.choose(1, 32), Gen.choose(1, 32)) { (d1, d2, w1, w2) =>
      (d1 == d2 && w1 == w2) || {
        val thrown = try {
          graft.functions.CountMin.mergeBytes(
            cmsOf(List(1L), d1, w1), cmsOf(List(1L), d2, w2))
          false
        } catch { case _: IllegalArgumentException => true }
        thrown
      }
    })
  }

  private def bloomOf(vals: List[Long], nWords: Int, k: Int): Array[Byte] = {
    val words = new Array[Long](nWords)
    vals.foreach(v => graft.functions.Bloom.setBits(words, k, v))
    bloomBytes(words, k)
  }

  test("Bloom mergeBytes: commutative + associative + idempotent + " +
       "empty-filter identity") {
    check(Prop.forAll(genBloomCase, Gen.listOf(Gen.choose(-99L, 99L)),
        Gen.listOf(Gen.choose(-99L, 99L))) {
      case ((va, nWords, k), vb, vc) =>
        val M = graft.functions.Bloom.mergeBytes _
        val (a, b, c) =
          (bloomOf(va, nWords, k), bloomOf(vb, nWords, k), bloomOf(vc, nWords, k))
        java.util.Arrays.equals(M(a, b), M(b, a)) &&
          java.util.Arrays.equals(M(M(a, b), c), M(a, M(b, c))) &&
          java.util.Arrays.equals(M(a, a), a) &&
          java.util.Arrays.equals(M(a, bloomOf(Nil, nWords, k)), a)
    })
  }

  test("Bloom mergeBytes: the union filter holds every shard's members") {
    check(Prop.forAll(genBloomCase, Gen.listOf(Gen.choose(Long.MinValue,
        Long.MaxValue))) { case ((va, nWords, k), vb) =>
      val merged = graft.functions.Bloom.mergeBytes(
        bloomOf(va, nWords, k), bloomOf(vb, nWords, k))
      (va ++ vb).forall(graft.functions.Bloom.mightContain(merged, _))
    })
  }

  test("Bloom mergeBytes: k or width mismatch fails loudly") {
    check(Prop.forAll(Gen.choose(1, 9), Gen.choose(1, 9),
        Gen.choose(1, 8), Gen.choose(1, 8)) { (k1, k2, n1, n2) =>
      (k1 == k2 && n1 == n2) || {
        try {
          graft.functions.Bloom.mergeBytes(
            bloomOf(List(1L), n1, k1), bloomOf(List(1L), n2, k2))
          false
        } catch { case _: IllegalArgumentException => true }
      }
    })
  }
}
