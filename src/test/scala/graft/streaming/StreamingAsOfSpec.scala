package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingAsOfSpec extends SparkSpec {

  test("stream as-of matches the batch as-of on the same fixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val buildIn = MemoryStream[(Long, Long, String)] // k, bt, v
    val probeIn = MemoryStream[(Long, Long, Long)]   // id, k, pt
    val out = StreamingAsOf.asOfStream(
      probeIn.toDF().toDF("id", "k", "pt"),
      buildIn.toDF().toDF("k", "bt", "v"),
      "k", "pt", "bt")
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-stream").toString)
      .format("memory").queryName("asof_stream").start()

    // micro-batch 1: initial builds only
    buildIn.addData((1L, 10L, "a"), (3L, 5L, "z"))
    q.processAllAvailable()
    // micro-batch 2: probes AND a later build together — intra-batch
    // event-time ordering must hold (probe@15 sees "a", not the batch-mate
    // build@20; probe@10 matches the equal-time build, builds sort first)
    probeIn.addData((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 15L))
    buildIn.addData((1L, 20L, "b"))
    q.processAllAvailable()
    // micro-batch 3: probes against state carried across batches
    probeIn.addData((103L, 1L, 25L), (104L, 2L, 50L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_stream").collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    // identical to the batch fixture expectation: probe@5 unmatched (drop),
    // @10 equal-time "a", @15 "a", @25 "b", key 2 never built (drop)
    assert(got == Map(101L -> "a", 102L -> "a", 103L -> "b"))

    // and literally equal to the batch operator over the same rows
    val build = Seq((1L, 10L, "a"), (1L, 20L, "b"), (3L, 5L, "z"))
      .toDF("k", "bt", "v")
    val probe = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 15L),
      (103L, 1L, 25L), (104L, 2L, 50L)).toDF("id", "k", "pt")
    val batch = graft.operators.AsOfJoin.asOf(probe, build, "k", "pt", "bt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val stream = spark.table("asof_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(stream == batch, s"stream $stream != batch $batch")
  }

  test("stream as-of: running state never regresses; tolerance drops far matches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val buildIn = MemoryStream[(Long, Long, String)]
    val probeIn = MemoryStream[(Long, Long, Long)]
    val out = StreamingAsOf.asOfStream(
      probeIn.toDF().toDF("id", "k", "pt"),
      buildIn.toDF().toDF("k", "bt", "v"),
      "k", "pt", "bt", toleranceMicros = Some(5000000L)) // 5 s in µs
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-tol").toString)
      .format("memory").queryName("asof_tol").start()

    buildIn.addData((1L, 20L, "b"))
    q.processAllAvailable()
    // an older build arriving later must NOT regress the running state
    buildIn.addData((1L, 10L, "stale"))
    q.processAllAvailable()
    // probe@24: gap 4 s <= tol, matches "b" (not "stale");
    // probe@99: gap 79 s > tol, dropped despite a valid backward match
    probeIn.addData((200L, 1L, 24L), (201L, 1L, 99L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_tol").collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got == Map(200L -> "b"))
  }
}
