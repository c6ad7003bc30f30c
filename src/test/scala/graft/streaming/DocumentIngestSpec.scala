package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DocumentIngestSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 09:$minute%02d:00")

  test("streaming ingest: exact dedup + quality gate on a document stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = DocumentIngest.pipeline(
      input.toDF().toDF("doc_id", "text", "ts"), minTokens = 3, maxStopRatio = 0.5)
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ingest").toString)
      .format("memory").queryName("ingested")
      .start()

    input.addData(
      (1L, "fast column scan with vector units", ts(0)),
      (2L, "fast column scan with vector units", ts(1)), // exact duplicate
      (3L, "too short", ts(2)),                          // < 3 tokens
      (4L, "the a of to in is", ts(3)),                  // all stopwords
      (5L, "hash join probe side build", ts(4)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ingested").collect()
      .map(r => r.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 5L)) // dup, short, and stopword-heavy docs dropped

    val row = spark.table("ingested").filter($"doc_id" === 1L).head()
    assert(row.getInt(4) == 6)          // n_tokens
    assert(row.getDouble(5) == 1.0 / 6) // "with" is the only en stopword
  }

  test("ingest dedup state survives a restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("ingest-restart").toString
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Unit]

    def start(input: MemoryStream[(Long, String, Timestamp)]) =
      DocumentIngest.pipeline(input.toDF().toDF("doc_id", "text", "ts"), minTokens = 1)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.put(r.getLong(0), ()))
        }
        .start()

    val in1 = MemoryStream[(Long, String, Timestamp)]
    val q1 = start(in1)
    in1.addData((1L, "unique document text alpha", ts(0)))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.keySet == Set(1L))

    // new query, same checkpoint: the duplicate must STILL be dropped,
    // which requires the dedup state store to have been restored
    val in2 = MemoryStream[(Long, String, Timestamp)]
    val q2 = start(in2)
    in2.addData((1L, "unique document text alpha", ts(0))) // committed batch replay
    in2.addData((2L, "unique document text alpha", ts(5)), (3L, "a different doc", ts(6)))
    q2.processAllAvailable()
    q2.stop()
    assert(seen.keySet == Set(1L, 3L),
      s"restored state must reject the duplicate, got ${seen.keySet}")
  }
}
