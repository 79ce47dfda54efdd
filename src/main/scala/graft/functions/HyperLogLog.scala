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
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      // rank = leading zeros of the remaining bits + 1 (capped)
      val rank = (if (rest == 0) 64 - p
        else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
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

object HyperLogLog {
  /** Column-API surface: `hll_distinct(col)` aggregate. */
  def hll_distinct(c: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HyperLogLogAgg(ColumnBridge.expression(c), p).toAggregateExpression())
}
