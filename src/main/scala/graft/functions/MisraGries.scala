package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries bounded-counter summary (Misra & Gries 1982; mergeable
  * per Agarwal et al., "Mergeable Summaries", PODS 2012) as a native
  * `TypedImperativeAggregate` — the same candidate contract as the typed
  * summary [[graft.ext.FrequentItems.MisraGries]] without the encoder
  * round-trip and the per-row immutable-`Map` rebuild (the KMV/BottomK
  * lesson: the typed path costs ~4× at gate scale, and a 100 TB
  * vocabulary scan hammers exactly this per-row hot path).
  *
  * Buffer = one mutable `HashMap[UTF8String, Cell]` capped at `k`
  * entries: an increment mutates the cell in place (zero allocation),
  * the overflow path decrements every counter once via the entry
  * iterator (amortized O(1) per input row — each decrement is paid for
  * by a prior increment), and merge runs the summary-merge (sum,
  * subtract the (k+1)-th largest, keep positives). The shuffle carries
  * ≤ k counters per group no matter the input size.
  *
  * Guarantee: every item with true frequency > N/k survives in the
  * output candidate array (counts are deliberately NOT exposed — the
  * verify pass recounts exactly). Output: the surviving items, sorted
  * in binary (UTF-8 byte) order for determinism.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      java.util.HashMap[UTF8String, MisraGriesFn.Cell]] {

  require(k > 0, "misra_gries needs at least one counter slot")

  import MisraGriesFn.Cell

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  // An ARRAY<STRING> child folds each element into the summary (r21,
  // the BottomK/KMV array lesson): a tokenized corpus feeds the sketch
  // as one row per DOC — no Generate/explode materializing every token
  // as a row before the bounded aggregate; null elements are skipped
  // like null scalars, and element order within the array matches the
  // exploded row order, so the per-partition summary is identical.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries needs a string or array<string> column " +
            s"(cast first), got " + other.catalogString)
    }

  // lazy: child.dataType is unresolvable at construction time on the
  // SQL-registry path (analysis resolves it before any eval)
  private lazy val isArrayInput = child.dataType.isInstanceOf[ArrayType]

  override def createAggregationBuffer()
      : java.util.HashMap[UTF8String, Cell] =
    new java.util.HashMap[UTF8String, Cell]()

  private def updateOne(buf: java.util.HashMap[UTF8String, Cell],
                        item: UTF8String): Unit = {
    val cell = buf.get(item)
    if (cell != null) cell.n += 1
    // clone: the UTF8String may point into a reused row/array buffer
    else if (buf.size < k) buf.put(item.clone(), new Cell(1L))
    else {
      // full and item absent: decrement every counter, drop zeros
      // (the new item's implicit +1 and −1 cancel)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue.n -= 1
        if (e.getValue.n == 0) it.remove()
      }
    }
  }

  override def update(buf: java.util.HashMap[UTF8String, Cell],
                      input: InternalRow)
      : java.util.HashMap[UTF8String, Cell] = {
    val v = child.eval(input)
    if (v != null) {
      if (isArrayInput) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) updateOne(buf, arr.getUTF8String(i))
          i += 1
        }
      } else updateOne(buf, v.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(b1: java.util.HashMap[UTF8String, Cell],
                     b2: java.util.HashMap[UTF8String, Cell])
      : java.util.HashMap[UTF8String, Cell] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = b1.get(e.getKey)
      if (c != null) c.n += e.getValue.n
      else b1.put(e.getKey, e.getValue) // b2 is discarded after merge
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from all, keep positives:
      // keeps ≤ k entries and preserves the ≤ N/k error bound
      val counts = new Array[Long](b1.size)
      var i = 0
      val vi = b1.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next().n; i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      val ei = b1.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        e.getValue.n -= cut
        if (e.getValue.n <= 0) ei.remove()
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, Cell]): Any = {
    val arr = buf.keySet().toArray(new Array[UTF8String](buf.size))
    java.util.Arrays.sort(arr,
      java.util.Comparator.naturalOrder[UTF8String]())
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { out(i) = arr(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Cell])
      : Array[Byte] = {
    var bytes = 4
    val si = buf.keySet().iterator()
    while (si.hasNext) bytes += 12 + si.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue.n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[UTF8String, Cell] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[UTF8String, Cell](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(UTF8String.fromBytes(b), new Cell(bb.getLong))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesFn {
  /** Mutable counter cell — increments mutate in place, so the per-row
    * hot path allocates nothing. */
  final class Cell(var n: Long)

  /** Column-API surface: `misra_gries(col, k)` → the ≤ k surviving
    * candidate items (every item with frequency > N/k is guaranteed
    * present), sorted in binary order. */
  def misra_gries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** SQL-registry builder shared by [[graft.GraftExtensions]] and
    * `Views.registerSqlFunctions`. */
  def sqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"misra_gries(col, k) takes 2 arguments, got ${exprs.length}")
    require(exprs(1).foldable, "misra_gries's k must be a literal")
    exprs(1).eval() match {
      case n: Number => MisraGriesAgg(exprs(0), n.intValue())
        .toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"misra_gries's k must be an integer literal, got $other")
    }
  }
}
