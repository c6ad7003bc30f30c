package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's one composite query (kafka_streams.clj:60-81), batch form:
  *
  *   share-holders changelog
  *     -> latest-per-key (KTable materialization, kafka_streams.clj:64)
  *     -> drop tombstones (nil value deletes, fake_producer.clj:26-29)
  *     -> filter exchange = 'NASDAQ' (kafka_streams.clj:65-67)
  *     -> group by client, set of position ids (kafka_streams.clj:68-80)
  *
  * Empty sets are absent by construction in batch (no surviving rows => no
  * group), matching the reference's nil-on-empty deletion
  * (kafka_streams.clj:77-79). Sets are emitted sorted for determinism
  * (Clojure sets are unordered; SURVEY.md §7 risk 4).
  */
object ShareHolders {

  /** changelog columns: seq, key, client, ticker, exchange, tombstone */
  def nasdaqPositionsByClient(changelog: DataFrame): DataFrame = {
    val latest = LatestPerKey(changelog, keys = Seq("key"), ordering = Seq("seq"))
    latest
      .filter(!col("tombstone") && col("exchange") === "NASDAQ")
      .groupBy(col("client"))
      .agg(sort_array(collect_set(col("key"))).as("nasdaq_position_ids"))
      .orderBy(col("client"))
  }
}
