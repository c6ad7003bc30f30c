package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building the sorted distinct-id set — the typed-API
  * mirror of the reference's adder/subtractor reduce (kafka_streams.clj:72-80)
  * for the batch path, where retraction has already been applied by
  * latest-per-key and only the union side remains.
  *
  * Buffer is a Set (merge = union, so partial aggregation on the map side is
  * exact); output is sorted for deterministic equality (SURVEY.md §7 risk 4).
  * Usable with `Dataset.groupByKey(...).agg(SetAggregator.toColumn)` or as a
  * registered UDAF via `spark.udf.register("set_agg", udaf(SetAggregator))`.
  */
object SetAggregator extends Aggregator[String, Set[String], Seq[String]] {
  override def zero: Set[String] = Set.empty
  override def reduce(buf: Set[String], id: String): Set[String] = buf + id
  override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 union b2
  override def finish(buf: Set[String]): Seq[String] = buf.toSeq.sorted
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
