package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Distinct bottom-k of a LONG column as a `TypedImperativeAggregate` —
  * the KMV sketch reduction (`graft/ext/KMV`) on the same native
  * aggregate surface as [[HyperLogLogAgg]]: the update path evaluates
  * the child expression directly on `InternalRow`s (no typed-Dataset
  * encoder round-trip per row, which profiled ~4× slower at gate
  * scale), partial buffers stay bounded at k longs, and merge is a
  * bounded set-union — so the shuffle carries ≤ k longs per group no
  * matter the input size.
  *
  * Buffer = a sorted distinct set (TreeSet): O(log k) insert with
  * immediate eviction of the largest once size exceeds k. Output: the
  * ascending array of the k smallest distinct values.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "bottom_k needs k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // analysis-time contract (SQL surface): reject non-integral children
  // with a clear error instead of a per-row ClassCastException mid-job;
  // narrower integrals widen in update. An ARRAY<LONG> child folds each
  // element into the buffer (r21: lets a tokenized corpus feed the
  // sketch as one row per DOC — no Generate/explode materializing every
  // token as a row before the aggregate; null elements are skipped like
  // null scalars).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k needs an integral or array<bigint> column, " +
            s"got ${other.catalogString}")
    }

  // lazy: child.dataType is unresolvable at construction time on the
  // SQL-registry path (analysis resolves it before any eval)
  private lazy val isArrayInput = child.dataType.isInstanceOf[ArrayType]

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // skip values already ≥ the current k-th smallest (strict <: a
  // duplicate of the boundary value must not occupy a second slot)
  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h): Unit }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(): Unit } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (isArrayInput) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) insert(buf, arr.getLong(i))
          i += 1
        }
      } else insert(buf, v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k) b1.add(h)
      else if (h < b1.last()) { if (b1.add(h)) b1.pollLast() }
      else return b1 // b2 iterates ascending: the rest can't enter
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren.head)
}

object BottomK {
  /** Column-API surface: `bottom_k(col, k)` → ascending array of the k
    * smallest distinct longs. */
  def bottom_k(c: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** SQL-registry builder shared by [[graft.GraftExtensions]] and
    * `Views.registerSqlFunctions` — one place for the arity/literal
    * validation so the two registrations can't diverge. */
  def sqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bottom_k(col, k) takes 2 arguments, got ${exprs.length}")
    require(exprs(1).foldable, "bottom_k's k must be a literal")
    exprs(1).eval() match {
      case n: Number => BottomKAgg(exprs(0), n.intValue())
        .toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"bottom_k's k must be an integer literal, got $other")
    }
  }
}
