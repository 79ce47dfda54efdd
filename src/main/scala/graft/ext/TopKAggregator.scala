package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §7.4: `Aggregator[IN,BUF,OUT]`
  * surface): keeps the k best (score desc, id asc) per group in a bounded
  * buffer, so the shuffle carries k rows per group instead of the whole
  * group — the heap-based alternative to `Window.partitionBy + row_number`
  * for per-group top-k at scale (no per-group sort of the full data).
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      // cheap bound: only re-sort when the candidate can enter the top-k
      if (b.size < k || a.score > b.last.score ||
        (a.score == b.last.score && a.id < b.last.id)) best(b :+ a) else b
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      best(x ++ y)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
