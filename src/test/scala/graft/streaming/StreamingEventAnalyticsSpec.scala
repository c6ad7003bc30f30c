package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class StreamingEventAnalyticsSpec extends SparkSpec {

  import StreamingEventAnalytics.Ev

  test("streaming transition steps == batch transitionMatrix on the events fixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the real fixture, fed in three chronological chunks — global
    // (ts, event_id) order implies per-user in-order arrival, the
    // documented stream==batch contract
    val events = Tables.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id").as("tie"))
      .orderBy("t", "tie")
      .as[Ev].collect().toSeq
    val chunks = events.grouped(math.max(1, events.length / 3 + 1)).toSeq

    val in = MemoryStream[Ev]
    val q = StreamingEventAnalytics.transitionSteps(spark, in.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("evtrans").toString)
      .format("memory").queryName("ev_steps").start()
    chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()

    // roll the step log up to the matrix and compare against the batch
    // operator on the SAME fixture — row-identical, not just same totals
    // (rollup in plain Scala: the memory-sink view self-join trips Spark's
    // conflicting-reference resolution, and the math is 5 lines)
    val stepRows = spark.table("ev_steps")
      .as[(Long, String, String)].collect().map(t => (t._2, t._3)).toSeq
    val nSteps = stepRows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outTot = stepRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = nSteps.map { case ((p, n), c) =>
      (p, n, c, c * 1000L / outTot(p)) }.toSet
    val want = graft.operators.EventAnalytics.transitionMatrix(
        Tables.table(spark, sf0001, "events"), "user_id", "event_type", "ts",
        tieCol = "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty && got == want,
      s"stream matrix != batch matrix: only-stream=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
  }

  test("streaming transition: in-batch disorder sorted away; state bounded by users") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StreamingEventAnalytics.transitionSteps(spark, in.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("evtrans2").toString)
      .format("memory").queryName("ev_steps2").start()
    // batch 1 arrives SHUFFLED within the batch: (ts,tie) sort must recover
    // a->b->c; equal-time events tie on `tie`
    in.addData(Ev(1L, "c", 30L, 0L), Ev(1L, "a", 10L, 0L), Ev(1L, "b", 20L, 0L),
      Ev(2L, "x", 10L, 1L), Ev(2L, "y", 10L, 2L))
    q.processAllAvailable()
    // batch 2 continues from carried state: c->d for user 1
    in.addData(Ev(1L, "d", 40L, 0L))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    val got = spark.table("ev_steps2").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (1L, "c", "d"), (2L, "x", "y")))
    assert(stateRows <= 2, s"state must be one row per user, got $stateRows")
  }

  test("streaming transition sustains >= 10k events/s") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val nUsers = 500
    val nEvents = 60000
    def attempt(round: Int): (Double, Long, Long) = {
      val in = MemoryStream[Ev]
      val q = StreamingEventAnalytics.transitionSteps(spark, in.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("evtrans-rate").toString)
        .format("memory").queryName(s"ev_rate_$round").start()
      // untimed warmup: stream start + state-store init + first-batch codegen
      in.addData(Ev(-1L, "warm", 0L, 0L))
      q.processAllAvailable()
      val types = Array("view", "click", "purchase", "refund")
      val evs = (0 until nEvents).map(i =>
        Ev((i % nUsers).toLong, types(i % types.length), (i / nUsers * 10).toLong, i.toLong))
      val t0 = System.nanoTime()
      in.addData(evs)
      q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val emitted = spark.table(s"ev_rate_$round").count()
      q.stop()
      (nEvents / dt, stateRows, emitted)
    }
    // best-of-2: the gate asserts operator capability, not box load (the
    // StreamingAsOfSpec discipline) — one retry absorbs a transient spike
    val first = attempt(0)
    if (first._1 < 10000)
      info(f"first attempt: ${first._1}%.0f events/s (below gate, retrying once)")
    val (rate, stateRows, emitted) = if (first._1 >= 10000) first else attempt(1)
    info(f"sustained $rate%.0f events/s over $nEvents events (gate: >= 10000), " +
      s"$stateRows state rows, $emitted steps")
    // every event after a user's first emits exactly one step
    assert(emitted == (nEvents - nUsers).toLong, s"step count: $emitted")
    assert(rate >= 10000, f"rate $rate%.0f below 10k events/s")
    assert(stateRows <= nUsers + 1, s"state must be bounded by user count, got $stateRows")
  }
}
