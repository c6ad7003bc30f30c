package graft.sources

import org.apache.spark.sql.Row
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
}
