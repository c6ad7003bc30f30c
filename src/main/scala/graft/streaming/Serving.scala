package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import KTableStream.ClientView

/** Serving layer ≈ the reference's queryable state store + interactive query
  * (kafka_streams.clj:80,83-89): `foreachBatch` upserts the change stream into
  * an in-memory table, queried via [[snapshot]] / a temp view.
  *
  * Deliberate upgrade over the reference (SURVEY.md §3.2): the served view is
  * COMPLETE — the reference's `GET /local-state` returns only the partitions
  * local to one of the 3 instances. In a cluster deployment `foreachBatch`
  * would upsert into Delta/JDBC instead; the in-memory TrieMap keeps the demo
  * self-contained.
  */
class Serving(viewName: String = "us_share_holders") {
  private val store = TrieMap.empty[String, Seq[String]]
  // the session whose catalog serves interactive queries; foreachBatch runs
  // with a CLONED session, so views registered there would be invisible
  @volatile private var servingSession: Option[SparkSession] = None

  /** Apply one micro-batch of view changes (idempotent per key), then
    * refresh the SQL-visible view so `spark.table(viewName)` — the
    * interactive-query surface (kafka_streams.clj:83-89) — always serves
    * the current state.
    */
  def upsertBatch(batch: Dataset[ClientView]): Unit = {
    batch.collect().foreach { cv =>
      if (cv.deleted) store.remove(cv.client)
      else store.put(cv.client, cv.nasdaq_position_ids)
    }
    val session = servingSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(batch.sparkSession)
    snapshot(session).createOrReplaceTempView(viewName)
  }

  def start(spark: SparkSession, views: Dataset[ClientView], checkpointDir: String): StreamingQuery = {
    servingSession = Some(spark)
    views.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[ClientView], _: Long) => upsertBatch(batch) }
      .queryName(viewName)
      .start()
  }

  /** The complete materialized view, as a DataFrame (interactive query). */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    store.toSeq.map { case (c, ids) => (c, ids) }
      .toDF("client", "nasdaq_position_ids")
      .orderBy("client")
  }

  def asMap: Map[String, Seq[String]] = store.toMap
}
