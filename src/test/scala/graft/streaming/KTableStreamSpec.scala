package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.ShareHolders
import KTableStream.{Position, ShareUpdate}

class KTableStreamSpec extends SparkSpec {

  private def upsert(seq: Long, client: String, ticker: String, exchange: String,
                     amount: Int = 1): ShareUpdate = {
    val key = s"$client:::$ticker"
    ShareUpdate(key, Some(Position(client, key, ticker, exchange, amount)), seq)
  }
  private def tombstone(seq: Long, client: String, ticker: String): ShareUpdate =
    ShareUpdate(s"$client:::$ticker", None, seq)

  /** Drive a changelog through the KTable pipeline step by step; returns the
    * serving view after each step. `impl` selects the stateful engine:
    * flatMapGroupsWithState (default) or the transformWithState processor.
    */
  private def run(steps: Seq[Seq[ShareUpdate]],
                  serving: ServingSink = new Serving,
                  checkpoint: String = Files.createTempDirectory("ktable").toString,
                  impl: (org.apache.spark.sql.SparkSession, org.apache.spark.sql.Dataset[ShareUpdate]) => org.apache.spark.sql.Dataset[KTableStream.ClientView] = KTableStream.usShareHolders)
      : Seq[Map[String, Seq[String]]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[ShareUpdate]
    val views = impl(spark, input.toDS())
    val q = views.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[KTableStream.ClientView], id: Long) =>
        serving.upsertBatch(b, id)
      }
      .start()
    val out = steps.map { batch =>
      input.addData(batch)
      q.processAllAvailable()
      serving.asMap
    }
    q.stop()
    out
  }

  test("canonical smoke scenario (FIXTURES.md A / fake_producer.clj:50-52)") {
    val states = run(Seq(
      Seq(upsert(0, "daniel", "AAPL", "NASDAQ", 99)),
      Seq(upsert(1, "daniel", "BT.A", "LON")),
      Seq(tombstone(2, "daniel", "AAPL"))))
    assert(states(0) == Map("daniel" -> Seq("daniel:::AAPL")))
    assert(states(1) == Map("daniel" -> Seq("daniel:::AAPL"))) // LON filtered
    assert(states(2) == Map.empty) // set emptied => row deleted (kafka_streams.clj:77-79)
  }

  test("filter retraction on exchange flip (kafka_streams.clj:65-67)") {
    val states = run(Seq(
      Seq(upsert(0, "c1", "AAPL", "NASDAQ"), upsert(1, "c1", "MSFT", "NASDAQ")),
      Seq(upsert(2, "c1", "AAPL", "LON")), // NASDAQ -> LON retracts the id
      Seq(upsert(3, "c1", "AAPL", "NASDAQ")))) // and back
    assert(states(0) == Map("c1" -> Seq("c1:::AAPL", "c1:::MSFT")))
    assert(states(1) == Map("c1" -> Seq("c1:::MSFT")))
    assert(states(2) == Map("c1" -> Seq("c1:::AAPL", "c1:::MSFT")))
  }

  test("re-insert after tombstone; multiple clients isolated") {
    val states = run(Seq(
      Seq(upsert(0, "a", "T1", "NASDAQ"), upsert(1, "b", "T1", "NASDAQ")),
      Seq(tombstone(2, "a", "T1")),
      Seq(upsert(3, "a", "T1", "NASDAQ"))))
    assert(states(1) == Map("b" -> Seq("b:::T1")))
    assert(states(2) == Map("a" -> Seq("a:::T1"), "b" -> Seq("b:::T1")))
  }

  test("same-key rapid updates within one batch: last write wins") {
    val states = run(Seq(Seq(
      upsert(0, "c", "X", "NASDAQ"),
      upsert(1, "c", "X", "LON"),
      upsert(2, "c", "Y", "NASDAQ"),
      tombstone(3, "c", "Y"),
      upsert(4, "c", "Y", "NASDAQ"))))
    assert(states(0) == Map("c" -> Seq("c:::Y")))
  }

  test("restart from checkpoint equals uninterrupted run") {
    // the tombstone for c:::T1 only produces the correct retraction if c's
    // positions map was restored from the checkpointed state store
    val all = Seq(
      Seq(upsert(0, "c", "T1", "NASDAQ"), upsert(1, "c", "T2", "NASDAQ"),
        upsert(2, "b", "T9", "LON")),
      Seq(tombstone(3, "c", "T1"), upsert(4, "b", "T9", "NASDAQ")),
      Seq(upsert(5, "a", "T3", "NASDAQ")))

    val uninterrupted = run(all).last
    assert(uninterrupted == Map(
      "a" -> Seq("a:::T3"), "b" -> Seq("b:::T9"), "c" -> Seq("c:::T2")))

    // interrupted: batch 1 with one query; then a NEW query over the same
    // checkpoint + serving store (persistent-sink analog). The source replays
    // the full changelog — the checkpoint skips already-committed batches, so
    // batches 2-3 run against the RESTORED state, not a rebuilt one.
    val checkpoint = Files.createTempDirectory("ktable-restart").toString
    val serving = new Serving
    run(Seq(all.head), serving, checkpoint)
    val resumed = run(all, serving, checkpoint).last
    assert(resumed == uninterrupted)
  }

  test("serving view is queryable through spark.table / SQL (M4 gate)") {
    run(Seq(
      Seq(upsert(0, "daniel", "AAPL", "NASDAQ", 99), upsert(1, "kima", "MSFT", "NASDAQ"))))
    val viaSql = spark.sql(
      "SELECT client, nasdaq_position_ids FROM us_share_holders ORDER BY client")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == Map(
      "daniel" -> Seq("daniel:::AAPL"), "kima" -> Seq("kima:::MSFT")))
  }

  test("distributed parquet serving sink: M4 gate (canonical scenario via spark.table)") {
    val store = Files.createTempDirectory("serving-store").toString
    val serving = new ParquetServing(store, viewName = "us_share_holders_pq")
    val states = run(Seq(
      Seq(upsert(0, "daniel", "AAPL", "NASDAQ", 99)),
      Seq(upsert(1, "daniel", "BT.A", "LON")),
      Seq(tombstone(2, "daniel", "AAPL"), upsert(3, "kima", "MSFT", "NASDAQ"))),
      serving)
    assert(states(0) == Map("daniel" -> Seq("daniel:::AAPL")))
    assert(states(1) == Map("daniel" -> Seq("daniel:::AAPL"))) // LON filtered
    assert(states(2) == Map("kima" -> Seq("kima:::MSFT"))) // daniel's set emptied => deleted
    // interactive query through SQL over the registered view
    val viaSql = spark.sql(
      "SELECT client, nasdaq_position_ids FROM us_share_holders_pq ORDER BY client")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == Map("kima" -> Seq("kima:::MSFT")))
  }

  test("distributed parquet serving sink: restart replay is idempotent") {
    val store = Files.createTempDirectory("serving-store-restart").toString
    val checkpoint = Files.createTempDirectory("ktable-pq-restart").toString
    val all = Seq(
      Seq(upsert(0, "c", "T1", "NASDAQ"), upsert(1, "c", "T2", "NASDAQ"),
        upsert(2, "b", "T9", "LON")),
      Seq(tombstone(3, "c", "T1"), upsert(4, "b", "T9", "NASDAQ")),
      Seq(upsert(5, "a", "T3", "NASDAQ")))
    run(Seq(all.head), new ParquetServing(store), checkpoint)
    // a new query over the same checkpoint + store: the source replays the
    // full changelog; committed batches re-run through foreachBatch, and the
    // dynamic partition overwrite folds the replay onto its own batch
    // partition instead of duplicating rows
    val resumed = run(all, new ParquetServing(store), checkpoint).last
    assert(resumed == Map(
      "a" -> Seq("a:::T3"), "b" -> Seq("b:::T9"), "c" -> Seq("c:::T2")))
  }

  test("distributed serving snapshot plan has no driver-side materialization") {
    val store = Files.createTempDirectory("serving-store-plan").toString
    val serving = new ParquetServing(store)
    run(Seq(Seq(upsert(0, "a", "T1", "NASDAQ"))), serving)
    // read path = scan + partial/final agg (latest-per-key) + filter; the
    // write path appended executor-side. Nothing collects: the snapshot is a
    // plain distributed plan over the parquet changelog.
    val plan = serving.snapshot(spark).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"))
  }

  test("transformWithState processor: canonical scenario + retraction") {
    val states = run(Seq(
      Seq(upsert(0, "daniel", "AAPL", "NASDAQ", 99)),
      Seq(upsert(1, "daniel", "BT.A", "LON")),
      Seq(tombstone(2, "daniel", "AAPL"))),
      impl = KTableProcessor.usShareHolders)
    assert(states(0) == Map("daniel" -> Seq("daniel:::AAPL")))
    assert(states(1) == Map("daniel" -> Seq("daniel:::AAPL")))
    assert(states(2) == Map.empty)

    val flips = run(Seq(
      Seq(upsert(0, "c1", "AAPL", "NASDAQ"), upsert(1, "c1", "MSFT", "NASDAQ")),
      Seq(upsert(2, "c1", "AAPL", "LON"))),
      impl = KTableProcessor.usShareHolders)
    assert(flips(1) == Map("c1" -> Seq("c1:::MSFT")))
  }

  test("transformWithState == flatMapGroupsWithState on a random changelog") {
    val rnd = new scala.util.Random(11)
    val updates = (0 until 300).map { seq =>
      val c = s"client${rnd.nextInt(6)}"
      val t = Seq("AAPL", "MSFT", "BT.A")(rnd.nextInt(3))
      if (rnd.nextInt(4) == 0) tombstone(seq, c, t)
      else upsert(seq, c, t, Seq("NASDAQ", "LON")(rnd.nextInt(2)))
    }
    val a = run(updates.grouped(71).toSeq).last
    val b = run(updates.grouped(71).toSeq, impl = KTableProcessor.usShareHolders).last
    assert(a == b)
  }

  test("throughput sanity: sustains the self-imposed upsert rate (BASELINE.md)") {
    val clients = (1 to 200).map(i => s"c$i")
    val tickers = (1 to 20).map(i => s"T$i")
    val rnd = new scala.util.Random(7)
    val n = 60000
    val updates = (0 until n).map { seq =>
      val c = clients(rnd.nextInt(clients.size))
      val t = tickers(rnd.nextInt(tickers.size))
      if (rnd.nextInt(10) == 0) tombstone(seq, c, t)
      else upsert(seq, c, t, if (rnd.nextBoolean()) "NASDAQ" else "LON")
    }
    val t0 = System.nanoTime()
    run(Seq(updates)) // one big batch through the full stateful pipeline
    val rate = n / ((System.nanoTime() - t0) / 1e9)
    info(f"sustained $rate%.0f upserts/s (gate: >= 10000)")
    assert(rate >= 10000, f"rate $rate%.0f below 10k upserts/s")
  }

  test("property: streaming incremental state == batch recompute (KTable law)") {
    for (seed <- Seq(42, 7, 1234)) assertKTableLaw(seed)
  }

  private def assertKTableLaw(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val clients = (1 to 8).map(i => s"client$i")
    val tickers = Seq("AAPL", "MSFT", "GOOG", "BT.A", "VOD")
    val exchanges = Seq("NASDAQ", "LON", "NYSE")
    val updates = (0 until 400).map { seq =>
      val c = clients(rnd.nextInt(clients.size))
      val t = tickers(rnd.nextInt(tickers.size))
      if (rnd.nextInt(5) == 0) tombstone(seq, c, t)
      else upsert(seq, c, t, exchanges(rnd.nextInt(exchanges.size)), rnd.nextInt(100) + 1)
    }
    val streamed = run(updates.grouped(97).toSeq).last

    // batch recompute over the same changelog (the M1 operator)
    import spark.implicits._
    val changelogDf = updates.map { u =>
      (u.seq, u.key, KTableStream.clientOf(u.key),
        u.key.split(":::", 2)(1),
        u.value.map(_.exchange).orNull,
        u.value.isEmpty)
    }.toDF("seq", "key", "client", "ticker", "exchange", "tombstone")
    val batch = ShareHolders.nasdaqPositionsByClient(changelogDf)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    assert(streamed == batch)
  }
}
