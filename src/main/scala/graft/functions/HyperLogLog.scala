package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate`
  * (SURVEY.md §7.4 extension surface; the mutable-buffer aggregate class the
  * build brief lists for sketches).
  *
  * Buffer = 2^p byte registers; update hashes the child with xxhash64 and
  * keeps the max leading-zero rank per register; merge is register-wise max,
  * so partial (map-side) aggregation works and the shuffle carries 2^p
  * bytes per group regardless of input size — the whole point of a sketch
  * at 100 TB. Standard bias corrections: linear counting for the small
  * range, the 2^64 correction for the large range.
  *
  * p = 12 → 4096 registers, ~1.6% standard error.
  */
case class HyperLogLogAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p
  private val alpha = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HyperLogLog.add(buf, XxHash64Function.hash(v, child.dataType, 42L), p)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    HyperLogLog.unionInto(b1, b2)

  override def eval(buf: Array[Byte]): Any = HyperLogLog.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperLogLogAgg =
    copy(child = newChildren.head)
}

/** Sketch-returning sibling of [[HyperLogLogAgg]]: same registers, same
  * merge, but eval yields the BUFFER — the mergeable artifact an
  * incrementally-maintained rollup stores per key so later appends can
  * union in without revisiting old rows ([[HllUnion]] is the pairwise
  * combine, [[HllEstimate]] the read-side estimator). */
case class HyperLogLogSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HyperLogLog.add(buf, XxHash64Function.hash(v, child.dataType, 42L), p)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    HyperLogLog.unionInto(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HyperLogLogSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HyperLogLogSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperLogLogSketchAgg =
    copy(child = newChildren.head)
}

/** Pairwise sketch union (register-wise max) — null-safe scalar, both
  * sides must be same-shape sketches. */
case class HllUnion(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hll_union expects (binary, binary), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HyperLogLog.union(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HyperLogLog.union($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllUnion =
    copy(left = newLeft, right = newRight)
}

/** Read-side estimator over a stored sketch. */
case class HllEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_estimate expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(b: Any): Any =
    HyperLogLog.estimate(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.HyperLogLog.estimate($b)")

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimate = copy(child = newChild)
}

object HyperLogLog {
  /** Column-API surface: `hll_distinct(col)` aggregate. */
  def hll_distinct(c: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HyperLogLogAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  /** `hll_sketch(col)` — the mergeable bytes, for stored rollups. */
  def hll_sketch(c: Column, p: Int = 12): Column =
    ColumnBridge.column(HyperLogLogSketchAgg(
      ColumnBridge.expression(c), p).toAggregateExpression())

  def hll_union(a: Column, b: Column): Column =
    ColumnBridge.column(
      HllUnion(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hll_estimate(c: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(c)))

  /** One hashed member into the register file (mutating) — the ONE
    * update body both aggregates share, so the rank math can never
    * drift between the estimate- and sketch-returning surfaces. */
  def add(buf: Array[Byte], h: Long, p: Int): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    // rank = leading zeros of the remaining bits + 1 (capped)
    val rank = (if (rest == 0) 64 - p
      else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
  }

  /** Register-wise max into b1 (mutating) — the aggregate's merge. */
  def unionInto(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    require(b1.length == b2.length,
      s"hll union shape mismatch: ${b1.length} vs ${b2.length} registers")
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  /** Pairwise union into a FRESH buffer — the scalar surface (inputs
    * may be shared row bytes; never mutate them). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    unionInto(a.clone(), b)

  /** The standard HLL estimator with small/large-range corrections —
    * shared by the estimate-returning aggregate and the read-side
    * scalar so the two can never drift. */
  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else if (raw > (1.0 / 30.0) * math.pow(2.0, 64))
        -math.pow(2.0, 64) * math.log1p(-raw / math.pow(2.0, 64))
      else raw
    math.round(est)
  }
}
