package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a typed `Aggregator` — the partial-aggregatable
  * alternative to `row_number() OVER (...) <= k`.
  *
  * The window form shuffles and sorts EVERY row of every group; this
  * aggregator keeps a bounded k-element buffer per group, so map-side
  * combine reduces each task's contribution to k rows before the exchange —
  * at 100 TB that's the difference between shuffling the corpus and
  * shuffling k × tasks rows. Ordering: score descending, then id ascending
  * (deterministic ties).
  */
class TopKAggregator(k: Int)
  extends Aggregator[TopKAggregator.Scored, Seq[TopKAggregator.Scored], Seq[TopKAggregator.Scored]] {
  import TopKAggregator.Scored

  private def trim(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = trim(buf :+ x)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)
  override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** One scored row: (ordering score, unique id, carried payload). */
  case class Scored(score: Double, id: Long)

  def apply(k: Int): TopKAggregator = new TopKAggregator(k)
}
