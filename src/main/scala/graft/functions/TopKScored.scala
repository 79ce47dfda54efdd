package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k of (id, score) pairs as a native
  * `TypedImperativeAggregate` — the same RANKING contract as
  * [[graft.ext.TopKAggregator]] (score desc, ties to the smallest id)
  * without the typed-Dataset encoder round-trip per input row (the
  * KMV/BottomK lesson: the encoder path costs ~4× at gate scale).
  * Partial buffers are bounded at k entries, so the shuffle carries k
  * rows per group — the heap path for per-group top-k at scale.
  *
  * ONE deliberate divergence from the Seq-buffered TopKAggregator: the
  * buffer is a SET over (score, id), so exact duplicate input pairs
  * collapse into one slot (TopKAggregator would emit both). All engine
  * call sites aggregate one row per candidate id before ranking, where
  * the two are identical; feed pre-aggregated rows, not raw multi-row
  * candidates.
  *
  * Output: `array<struct<id: bigint, score: double>>` ranked best-first.
  */
case class TopKScoredAgg(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, "top_k_scored needs k > 0")

  // worst-first ordering: lower score first; among equal scores the
  // LARGER id first (ties prefer the smaller id, so the larger is the
  // evictable one). TreeSet.first() is then always the eviction victim.
  private object WorstFirst extends java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (id.dataType, score.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (i, s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_scored needs (integral id, double score), got " +
            s"(${i.catalogString}, ${s.catalogString})")
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](WorstFirst)

  private def insert(buf: java.util.TreeSet[(Double, Long)],
                     e: (Double, Long)): Unit =
    if (buf.size < k) { buf.add(e): Unit }
    else if (WorstFirst.compare(e, buf.first()) > 0) {
      if (buf.add(e)) { buf.pollFirst(): Unit }
    }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null)
      insert(buf, (s.asInstanceOf[Double],
        i.asInstanceOf[Number].longValue()))
    buf
  }

  override def merge(b1: java.util.TreeSet[(Double, Long)],
                     b2: java.util.TreeSet[(Double, Long)])
      : java.util.TreeSet[(Double, Long)] = {
    // iterate b2 best-first: once a candidate can't beat b1's worst
    // (and b1 is full), none of the remaining (worse) ones can
    val it = b2.descendingIterator()
    while (it.hasNext) {
      val e = it.next()
      if (b1.size < k) b1.add(e): Unit
      else if (WorstFirst.compare(e, b1.first()) > 0) {
        if (b1.add(e)) { b1.pollFirst(): Unit }
      } else return b1
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // best-first
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](id, s))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[(Double, Long)](WorstFirst)
    var i = 0
    while (i < n) { s.add((bb.getDouble, bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoredAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoredAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoredAgg =
    copy(id = newChildren(0), score = newChildren(1))
}

object TopKScored {
  /** Column-API surface: `top_k_scored(id, score, k)` → best-first
    * `array<struct<id, score>>` (score desc, ties to smallest id). */
  def top_k_scored(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(TopKScoredAgg(
      ColumnBridge.expression(id), ColumnBridge.expression(score), k)
      .toAggregateExpression())

  /** SQL-registry builder shared by [[graft.GraftExtensions]] and
    * `Views.registerSqlFunctions` — one place for the arity/literal
    * validation so the two registrations can't diverge. */
  def sqlBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"top_k_scored(id, score, k) takes 3 arguments, got ${exprs.length}")
    require(exprs(2).foldable, "top_k_scored's k must be a literal")
    exprs(2).eval() match {
      case n: Number =>
        TopKScoredAgg(exprs(0), exprs(1), n.intValue()).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"top_k_scored's k must be an integer literal, got $other")
    }
  }
}
