package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch upsert-view operator: latest row per key by an ordering column set.
  *
  * This is the batch analog of the reference's KTable materialization of a
  * compacted topic (kafka_streams.clj:64): latest-per-key wins; callers drop
  * tombstones afterwards.
  *
  * Implementation note (scale): we use `max_by(struct(payload), struct(ord))`
  * rather than `row_number() OVER (...) = 1`. `max_by` is a hash aggregate
  * with map-side partial aggregation — one shuffle of pre-combined partial
  * maxima — while the window form must shuffle *every* row and sort each
  * partition. At 100 TB with high key cardinality the partial-agg form is
  * strictly better; with heavy per-key skew AQE cannot split an agg, but the
  * map-side combine already collapses hot keys before the exchange.
  */
object LatestPerKey {

  /** Keep the single latest row per `keys`, ordering by `ordering`
    * (lexicographic on the ordering columns, latest = max). Preserves the
    * original column set of `df`.
    */
  def apply(df: DataFrame, keys: Seq[String], ordering: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toIndexedSeq
    val ordStruct = struct(ordering.map(col): _*)
    val payloadStruct = struct(payload.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payloadStruct, ordStruct).as("__latest"))
      .select(keys.map(col) ++ payload.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
