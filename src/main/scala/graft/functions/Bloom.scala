package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Bloom-filter surface for join pruning at corpus scale:
  * `bloom_build` (an aggregate producing a serialized filter over a
  * 64-bit hash column) + `bloom_might_contain` (a codegen probe that
  * reads bits straight off the serialized bytes, no per-row
  * deserialization).
  *
  * The target pattern is the 100 TB membership pre-filter: build the
  * filter over the SMALL side's keys (one bounded-buffer aggregation —
  * partials are fixed-size bit arrays, the shuffle carries one word
  * array per partition), broadcast the single-row result, and probe the
  * BIG side BEFORE its expensive shuffle (distinct / join) so rows that
  * cannot match never leave their input partition. False positives are
  * removed by the exact join that follows, so the composed operator
  * stays exact — the filter only prunes, never decides
  * (gate `t18_bloom_decontaminate`; reference analog: the corpus
  * decontamination scan of `t11`, same contract, scale-safe plan).
  *
  * Hashing: callers feed an already-mixed 64-bit hash
  * (`xxhash64(col)`); bit positions derive Guava-style by double
  * hashing the two 32-bit halves — k probes cost two int ops each, no
  * re-hash of the value.
  *
  * Serialized layout (BinaryType): `[int32 numHashes][int64 × words]`,
  * big-endian; numBits = 64 × words. Sizing via [[Bloom.optimalNumBits]]
  * / [[Bloom.optimalNumHashes]] (the standard  m = −n·lnp ⁄ ln²2,
  * k = m⁄n·ln2 ).
  */
object Bloom {

  /** m = ceil(−n ln p ⁄ ln²2), clamped to [64, 2³¹⁻¹] and rounded up to
    * a whole 64-bit word. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0, s"bloom expectedItems must be > 0: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"bloom fpp must be in (0,1): $fpp")
    val raw = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2)))
    val capped = math.min(raw, (Int.MaxValue - 63).toDouble).toLong
    val bits = math.max(64L, capped)
    (((bits + 63L) / 64L) * 64L).toInt
  }

  /** k = round(m⁄n · ln2), at least 1. */
  def optimalNumHashes(expectedItems: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  // ----- bit probing shared by eval, codegen, and the aggregate -----

  import SketchBytes.{readInt, readLong}

  /** Probe a serialized filter. Static so generated code can call it —
    * the probe stays inside whole-stage codegen as one invoke.
    *
    * Malformed input (not produced by [[bloom_build]] — too short, bad
    * header) answers TRUE, not false: in the prune-then-verify pattern
    * a spurious "absent" silently drops matching rows (the one
    * corrupting failure mode), while a spurious "might contain" just
    * forwards the row to the exact verify join. A VALID empty filter
    * (built over zero rows) still answers false everywhere — its bits
    * are simply all unset. */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    if (filter.length < 12) return true // header + >=1 word, else malformed
    val k = readInt(filter, 0)
    if (k <= 0) return true
    val numBits = ((filter.length - 4) >> 3) << 6
    // re-mix: a raw id or narrow int has a zero upper half, which would
    // make h2 = 0 and collapse all k probes onto one bit (k-fold worse
    // fpp). Must mirror setBits exactly.
    val m = SketchBytes.fmix64(hash)
    val h1 = m.toInt
    val h2 = (m >>> 32).toInt
    var i = 0
    var combined = h1
    while (i < k) {
      var pos = combined % numBits
      if (pos < 0) pos = ~pos % numBits // fold negatives back into range
      val word = readLong(filter, 4 + ((pos >>> 6) << 3))
      if ((word & (1L << (pos & 63))) == 0L) return false
      combined += h2
      i += 1
    }
    true
  }

  /** Set the k bit positions of `hash` in a word buffer (aggregate
    * update path). Must mirror [[mightContain]]'s position sequence. */
  private[graft] def setBits(words: Array[Long], numHashes: Int,
                             hash: Long): Unit = {
    val numBits = words.length << 6
    val m = SketchBytes.fmix64(hash)
    val h1 = m.toInt
    val h2 = (m >>> 32).toInt
    var i = 0
    var combined = h1
    while (i < numHashes) {
      var pos = combined % numBits
      if (pos < 0) pos = ~pos % numBits
      words(pos >>> 6) |= 1L << (pos & 63)
      combined += h2
      i += 1
    }
  }

  /** Word-wise OR of two serialized filters — the union surface: shard
    * filters built with the SAME (expectedItems, fpp) — hence the same
    * bit width and k — merge into the filter of the union set. Shape
    * mismatch (different k or byte length) fails loudly: filters from
    * different configurations probe different position sequences and a
    * silent OR would answer garbage. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length && a.length >= 12 &&
      readInt(a, 0) == readInt(b, 0),
      s"unmergeable bloom filters: ${a.length}B " +
        s"k=${if (a.length >= 4) readInt(a, 0) else -1} vs ${b.length}B " +
        s"k=${if (b.length >= 4) readInt(b, 0) else -1}")
    val out = new Array[Byte](a.length)
    System.arraycopy(a, 0, out, 0, 4)
    val bb = java.nio.ByteBuffer.wrap(out)
    var off = 4
    while (off < a.length) {
      bb.putLong(off, readLong(a, off) | readLong(b, off))
      off += 8
    }
    out
  }

  // ----- Column API -----

  /** `bloom_build(hashCol, expectedItems, fpp)` → one BinaryType filter
    * over the group's non-null 64-bit hashes. Feed `xxhash64(col)`. */
  def bloom_build(hash: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = optimalNumBits(expectedItems, fpp)
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(hash), bits,
        optimalNumHashes(expectedItems, bits))
        .toAggregateExpression())
  }

  /** `bloom_might_contain(filter, hashCol)` — true iff the hash MIGHT be
    * in the set the filter was built over (false → definitely absent). */
  def bloom_might_contain(filter: Column, hash: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(filter), ColumnBridge.expression(hash)))

  /** `bloom_merge(filterCol)` → ONE filter = the word-wise OR of the
    * group's filters ([[mergeBytes]] as an aggregate) — shard filters
    * (same build parameters) roll up into the union-set filter without
    * touching rows. */
  def bloom_merge(filter: Column): Column =
    ColumnBridge.column(
      BloomMergeAgg(ColumnBridge.expression(filter)).toAggregateExpression())

  // ----- SQL registry builders (shared by GraftExtensions / Views) -----

  def buildSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"bloom_build(hash, expectedItems, fpp) takes 3 arguments, got ${exprs.length}")
    require(exprs(1).foldable && exprs(2).foldable,
      "bloom_build's expectedItems and fpp must be literals")
    val n = exprs(1).eval() match {
      case x: Number => x.longValue()
      case other => throw new IllegalArgumentException(
        s"bloom_build expectedItems must be numeric, got $other")
    }
    val p = exprs(2).eval() match {
      case x: Number => x.doubleValue()
      case x: Decimal => x.toDouble
      case other => throw new IllegalArgumentException(
        s"bloom_build fpp must be numeric, got $other")
    }
    val bits = optimalNumBits(n, p)
    BloomBuildAgg(exprs.head, bits, optimalNumHashes(n, bits))
      .toAggregateExpression()
  }

  def probeSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bloom_might_contain(filter, hash) takes 2 arguments, got ${exprs.length}")
    BloomMightContain(exprs(0), exprs(1))
  }

  def mergeSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"bloom_merge(filter) takes 1 argument, got ${exprs.length}")
    BloomMergeAgg(exprs.head).toAggregateExpression()
  }
}

/** Aggregate form of [[Bloom.mergeBytes]] — the buffer is the running
  * word-wise OR (empty until the first non-null filter); inputs must
  * share one build shape. Null when the group held no filters. */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_merge expects a serialized bloom filter (binary), got " +
          other.catalogString)
    }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def fold(buf: Array[Byte], next: Array[Byte]): Array[Byte] =
    if (next == null || next.isEmpty) buf
    else if (buf.isEmpty) next.clone()
    else Bloom.mergeBytes(buf, next)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    fold(buf, child.eval(input).asInstanceOf[Array[Byte]])

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    fold(b1, b2)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMergeAgg =
    copy(child = newChildren.head)
}

/** The build side: a `TypedImperativeAggregate` whose buffer is the bit
  * array itself — fixed size regardless of input rows, so partials are
  * O(numBits) and merge is a word-wise OR. Output layout documented on
  * [[Bloom]]. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"bloom numBits must be a positive multiple of 64: $numBits")
  require(numHashes > 0, s"bloom numHashes must be > 0: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build needs a 64-bit hash column (use xxhash64), got " +
          other.catalogString)
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, numHashes, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(numHashes)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length >>> 3)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** Byte/hash primitives shared by the serialized-sketch family
  * ([[Bloom]], [[CountMin]]) — ONE copy of the big-endian readers and
  * the input re-mix, so the mirrored designs can't drift. */
private[functions] object SketchBytes {

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def readLong(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 56) | ((b(off + 1) & 0xffL) << 48) |
      ((b(off + 2) & 0xffL) << 40) | ((b(off + 3) & 0xffL) << 32) |
      ((b(off + 4) & 0xffL) << 24) | ((b(off + 5) & 0xffL) << 16) |
      ((b(off + 6) & 0xffL) << 8) | (b(off + 7) & 0xffL)

  /** MurmurHash3 fmix64 finalizer: re-mix the caller-supplied 64-bit
    * value so inputs that are NOT already well mixed — raw ids, widened
    * narrow ints, whose upper half is all zeros — still spread their
    * entropy across both 32-bit halves the double-hashing schemes
    * split. Idempotent on already-mixed xxhash64 quality. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

/** The probe side: codegen-friendly membership test over the serialized
  * filter bytes. One static call inside whole-stage codegen; bits are
  * read directly off the byte array (no allocation, no deserialize). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, integral-hash), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(f: Any, h: Any): Any =
    Bloom.mightContain(f.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.Bloom.mightContain($f, (long) $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
