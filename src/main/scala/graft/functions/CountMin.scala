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

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * aggregate + point-estimate expression — the per-item FREQUENCY
  * companion to the suite's membership (Bloom), distinct-count (HLL /
  * KMV), and candidate (Misra–Gries) sketches: `cms_build` aggregates a
  * 64-bit hash column into a depth×width counter matrix (fixed-size
  * partials, element-wise-sum merge — the shuffle carries d·w longs per
  * group no matter the input), and `cms_estimate` answers "how many
  * times did this key appear" from the serialized bytes with one-sided
  * error: NEVER an underestimate, overestimate ≤ N·e/width with
  * probability 1 − e^−depth. The 100 TB use: per-key frequency lookups
  * over a vocabulary-sized stream without the vocabulary-sized shuffle
  * an exact GROUP BY would pay — when EXACT answers for frequent items
  * are needed, [[graft.ext.FrequentItems.heavyHitters]] is the
  * two-pass operator; the sketch serves the long tail.
  *
  * Hashing mirrors [[Bloom]]: feed `xxhash64(col)`, rows derive per-row
  * positions Guava-style from the two 32-bit halves (h1 + d·h2, folded
  * non-negative, mod width) — build and probe share [[CountMin.pos]]
  * so the sequences can never drift.
  *
  * Serialized layout (BinaryType): `[int32 depth][int32 width]
  * [int64 × depth·width]`, big-endian.
  */
object CountMin {

  import SketchBytes.{readInt, readLong}

  /** Row-d position of `hash` in a width-`w` row. Shared by build and
    * probe — the single source of the position sequence. The input is
    * re-mixed ([[SketchBytes.fmix64]]) so raw ids / widened ints, whose
    * upper half is zero, don't collapse every depth row onto the same
    * position (which would silently void the 1 − e^−depth bound). */
  def pos(hash: Long, d: Int, w: Int): Int = {
    val m = SketchBytes.fmix64(hash)
    val h1 = m.toInt
    val h2 = (m >>> 32).toInt
    var p = (h1 + d * h2) % w
    if (p < 0) p = ~p % w
    p
  }

  /** Point estimate from a serialized sketch. Static so generated code
    * calls it as one invoke inside whole-stage codegen.
    *
    * Malformed input (not produced by [[cms_build]]) answers
    * `Long.MaxValue` — the conservative direction for every caller
    * shape (a threshold filter keeps the row and an exact pass decides;
    * an underestimate would silently drop it), and loud enough to spot
    * in output. */
  def estimate(sketch: Array[Byte], hash: Long): Long = {
    if (sketch.length < 8) return Long.MaxValue
    val depth = readInt(sketch, 0)
    val width = readInt(sketch, 4)
    // overflow-proof capacity check: compare counter COUNTS (array
    // bytes bound the right side), never 8·depth·width which a crafted
    // header can wrap past Long range via huge ints
    if (depth <= 0 || depth > 16 || width <= 0 ||
        depth.toLong * width > ((sketch.length - 8) >> 3).toLong)
      return Long.MaxValue
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      // offset fits Int: depth·width ≤ (length−8)/8 < 2³¹ was just checked
      val c = readLong(sketch,
        8 + ((d.toLong * width + pos(hash, d, width)) << 3).toInt)
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** Element-wise sum of two serialized sketches — the linear-sketch
    * merge, off the bytes: `estimate(merge(a,b), k) ≥ estimate(a,k)`
    * and counts add exactly, so a stream can fold per-batch sketches
    * into a persisted one ([[graft.stream.StreamingCountMin]]) and land
    * on the SAME bytes a single batch build over all rows produces.
    * Shapes must match — a (depth, width) mismatch is a caller bug
    * (sketches from different configurations are not mergeable) and
    * fails loudly rather than answering garbage. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length && a.length >= 8 &&
      readInt(a, 0) == readInt(b, 0) && readInt(a, 4) == readInt(b, 4),
      s"unmergeable sketches: ${a.length}B d=${if (a.length >= 8) readInt(a, 0) else -1} " +
        s"w=${if (a.length >= 8) readInt(a, 4) else -1} vs ${b.length}B " +
        s"d=${if (b.length >= 8) readInt(b, 0) else -1} w=${if (b.length >= 8) readInt(b, 4) else -1}")
    val out = new Array[Byte](a.length)
    System.arraycopy(a, 0, out, 0, 8)
    val bb = ByteBuffer.wrap(out)
    var off = 8
    while (off < a.length) {
      bb.putLong(off, readLong(a, off) + readLong(b, off))
      off += 8
    }
    out
  }

  // ----- Column API -----

  /** `cms_build(hashCol, depth, width)` → one BinaryType sketch over
    * the group's non-null 64-bit hashes. Feed `xxhash64(col)`. */
  def cms_build(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(hash), depth, width)
        .toAggregateExpression())

  /** `cms_estimate(sketch, hashCol)` → the key's estimated frequency
    * (never an underestimate). */
  def cms_estimate(sketch: Column, hash: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(hash)))

  /** `cms_merge(sketchCol)` → ONE sketch = the element-wise sum of the
    * group's sketches ([[mergeBytes]] as an aggregate) — the linearity
    * surface for pre-sketched shards: per-partition/per-source/per-day
    * sketches roll up without touching rows, and the merged estimate
    * equals the estimate of one global build over all the shards'
    * inputs. */
  def cms_merge(sketch: Column): Column =
    ColumnBridge.column(
      CmsMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  // ----- SQL registry builders -----

  def buildSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"cms_build(hash, depth, width) takes 3 arguments, got ${exprs.length}")
    require(exprs(1).foldable && exprs(2).foldable,
      "cms_build's depth and width must be literals")
    (exprs(1).eval(), exprs(2).eval()) match {
      case (d: Number, w: Number) =>
        CountMinAgg(exprs.head, d.intValue(), w.intValue())
          .toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"cms_build's depth/width must be integer literals, got $other")
    }
  }

  def estimateSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"cms_estimate(sketch, hash) takes 2 arguments, got ${exprs.length}")
    CmsEstimate(exprs(0), exprs(1))
  }

  def mergeSqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"cms_merge(sketch) takes 1 argument, got ${exprs.length}")
    CmsMergeAgg(exprs.head).toAggregateExpression()
  }
}

/** Aggregate form of [[CountMin.mergeBytes]]: the buffer is the running
  * element-wise sum (empty until the first non-null sketch arrives);
  * inputs must share one (depth, width) shape — a mismatch fails loudly
  * mid-aggregation rather than answering garbage. Null when the group
  * held no sketches. */
case class CmsMergeAgg(
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
        s"cms_merge expects a serialized cms sketch (binary), got " +
          other.catalogString)
    }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def fold(buf: Array[Byte], next: Array[Byte]): Array[Byte] =
    if (next == null || next.isEmpty) buf
    else if (buf.isEmpty) next.clone()
    else CountMin.mergeBytes(buf, next)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    fold(buf, child.eval(input).asInstanceOf[Array[Byte]])

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    fold(b1, b2)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

/** Build side: buffer IS the depth×width counter matrix — fixed size
  * regardless of input rows, merge = element-wise sum (exactly the
  * linear-sketch property that makes CMS mergeable). */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, s"cms depth must be in [1,16]: $depth")
  require(width > 0, s"cms width must be positive: $width")
  // guard the PRODUCT too: depth*width can wrap Int and allocate a
  // wrongly-sized buffer that crashes mid-aggregation; 2²⁷ counters
  // (1 GiB) is far past any sane sketch
  require(depth.toLong * width <= (1L << 27),
    s"cms sketch too large: $depth x $width counters (max ${1L << 27})")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_build needs a 64-bit hash column (use xxhash64), got " +
          other.catalogString)
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Number].longValue()
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.pos(h, d, width)) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.length)
    bb.putInt(depth)
    bb.putInt(width)
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

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Probe side: min over the key's depth counters, read straight off the
  * serialized bytes inside whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, integral-hash), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(s: Any, h: Any): Any =
    CountMin.estimate(s.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) =>
      s"graft.functions.CountMin.estimate($s, (long) $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
