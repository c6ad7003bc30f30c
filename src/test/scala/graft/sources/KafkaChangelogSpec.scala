package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.KTableStream.ShareUpdate

class KafkaChangelogSpec extends SparkSpec {

  /** Static frame shaped like Kafka's (key/value binary, offset). */
  private def kafkaFrame(rows: Seq[(String, Option[String], Long)]) = {
    val schema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType, nullable = true),
      StructField("offset", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v, o) =>
        Row(k.getBytes("UTF-8"), v.map(_.getBytes("UTF-8")).orNull, o)
      }),
      schema)
  }

  test("parse: upsert json and null-value tombstone") {
    val frame = kafkaFrame(Seq(
      ("daniel:::AAPL",
        Some("""{"client":"daniel","id":"daniel:::AAPL","ticker":"AAPL","exchange":"NASDAQ","amount":99}"""),
        0L),
      ("daniel:::AAPL", None, 1L)))
    val got = KafkaChangelog.parse(spark, frame).collect().sortBy(_.seq)
    assert(got(0) == ShareUpdate("daniel:::AAPL",
      Some(graft.streaming.KTableStream.Position("daniel", "daniel:::AAPL", "AAPL", "NASDAQ", 99)), 0L))
    assert(got(1) == ShareUpdate("daniel:::AAPL", None, 1L))
  }

  test("producer helper: amount=0 encodes a tombstone (fake_producer.clj:26-29)") {
    assert(KafkaChangelog.update("c", "T", "NASDAQ", 0, 5L).value.isEmpty)
    assert(KafkaChangelog.update("c", "T", "NASDAQ", 7, 6L).value.exists(_.amount == 7))
  }

  test("encode: upserts roundtrip through parse; tombstones are genuine nulls") {
    import spark.implicits._
    val updates = Seq(
      KafkaChangelog.update("daniel", "AAPL", "NASDAQ", 99, 0L),
      KafkaChangelog.update("daniel", "AAPL", "NASDAQ", 0, 1L)).toDS()
    val frame = KafkaChangelog.encode(updates).collect()
    val byKeyNull = frame.map(r => r.isNullAt(1))
    assert(byKeyNull.count(_ == false) == 1 && byKeyNull.count(_ == true) == 1,
      "one JSON upsert, one genuine null tombstone")

    // produced bytes parse back to the original typed changelog
    val reframed = KafkaChangelog.encode(updates)
      .withColumn("key", $"key".cast("binary"))
      .withColumn("value", $"value".cast("binary"))
      .withColumn("offset", monotonically_increasing_id())
    val roundtrip = KafkaChangelog.parse(spark, reframed)
      .collect().map(u => (u.key, u.value.map(_.amount))).toSet
    assert(roundtrip == Set(("daniel:::AAPL", Some(99)), ("daniel:::AAPL", None)))
  }

  /** No broker exists in this container, so this e2e drives the EXACT chain
    * the Kafka path uses — raw binary key/value/offset frames -> `parse` ->
    * stateful KTable -> distributed serving store — through a file-backed
    * streaming source instead of `format("kafka")`. Only the source format
    * differs from production; every transformation downstream of `load()` is
    * the production code path. (Broker endpoints themselves remain
    * integration-untested here; documented in README.)
    */
  test("file-backed changelog streaming e2e: parse -> KTable -> serving") {
    import java.nio.file.Files
    import graft.streaming.{KTableStream, ParquetServing}

    val srcDir = Files.createTempDirectory("changelog-src").toString
    val schema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType, nullable = true),
      StructField("offset", LongType)))

    def writeBatchFile(rows: Seq[(String, Option[String], Long)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, v, o) =>
          Row(k.getBytes("UTF-8"), v.map(_.getBytes("UTF-8")).orNull, o)
        }), schema)
        .write.mode("append").parquet(srcDir)

    def valueJson(client: String, ticker: String, exchange: String, amount: Int): String =
      s"""{"client":"$client","id":"$client:::$ticker","ticker":"$ticker","exchange":"$exchange","amount":$amount}"""

    // the reference REPL scenario (fake_producer.clj:50-52) + a second client
    writeBatchFile(Seq(
      ("daniel:::AAPL", Some(valueJson("daniel", "AAPL", "NASDAQ", 99)), 0L),
      ("daniel:::BT.A", Some(valueJson("daniel", "BT.A", "LON", 1)), 1L),
      ("kima:::MSFT", Some(valueJson("kima", "MSFT", "NASDAQ", 45)), 2L),
      ("daniel:::AAPL", None, 3L))) // tombstone: daniel's NASDAQ set empties

    val rawStream = spark.readStream.schema(schema).parquet(srcDir)
    val updates = KafkaChangelog.parse(spark, rawStream) // the production parse
    val views = KTableStream.usShareHolders(spark, updates)
    val serving = new ParquetServing(
      Files.createTempDirectory("changelog-store").toString,
      viewName = "us_share_holders_file_e2e")
    val q = serving.start(spark,
      views, Files.createTempDirectory("changelog-ckpt").toString)
    q.awaitTermination()
    assert(serving.asMap == Map("kima" -> Seq("kima:::MSFT")))

    // a second changelog file lands later: a fresh run over the same source
    // dir replays the full (now longer) changelog into a fresh store
    writeBatchFile(Seq(
      ("daniel:::AAPL", Some(valueJson("daniel", "AAPL", "NASDAQ", 7)), 4L)))
    val serving2 = new ParquetServing(
      Files.createTempDirectory("changelog-store2").toString,
      viewName = "us_share_holders_file_e2e2")
    val q2 = serving2.start(spark,
      KTableStream.usShareHolders(spark,
        KafkaChangelog.parse(spark, spark.readStream.schema(schema).parquet(srcDir))),
      Files.createTempDirectory("changelog-ckpt2").toString)
    q2.awaitTermination()
    assert(serving2.asMap == Map(
      "daniel" -> Seq("daniel:::AAPL"), "kima" -> Seq("kima:::MSFT")))
  }
}
