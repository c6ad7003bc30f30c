package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import KTableStream.ClientView

/** ParquetServing compaction: folding old batch partitions must not change
  * read results, must keep tombstones effective, and must preserve the
  * replay-overwrites-its-own-partition idempotency for the one batch a
  * restart can legally replay (the max).
  */
class ServingCompactionSpec extends SparkSpec {

  private def views(rows: (String, Seq[String], Boolean)*) = {
    import spark.implicits._
    rows.map { case (c, ids, d) => ClientView(c, ids, d) }.toDS()
  }

  private def partitions(dir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(path).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") => n.stripPrefix("batch_id=").toLong }
      .sorted
  }

  test("compact folds history, keeps tombstones, survives replay of the max batch") {
    val dir = Files.createTempDirectory("serving-compact").toString
    val serving = new ParquetServing(dir, viewName = "compact_spec_view")

    serving.upsertBatch(views(
      ("alice", Seq("alice:::AAPL"), false),
      ("bob", Seq("bob:::MSFT"), false)), 0L)
    serving.upsertBatch(views(("alice", Seq.empty, true)), 1L) // tombstone
    serving.upsertBatch(views(("carol", Seq("carol:::NVDA"), false)), 2L)
    val lastBatch = views(("bob", Seq("bob:::MSFT", "bob:::AMZN"), false))
    serving.upsertBatch(lastBatch, 3L)

    val before = serving.asMap
    assert(before == Map(
      "bob" -> Seq("bob:::MSFT", "bob:::AMZN"), "carol" -> Seq("carol:::NVDA")))
    assert(partitions(dir) == Seq(0L, 1L, 2L, 3L))

    serving.compact(spark)
    // batches 0..2 folded into base partition 2; max batch 3 untouched
    assert(partitions(dir) == Seq(2L, 3L))
    assert(serving.asMap == before, "compaction must not change read results")
    // the tombstone survives INSIDE the base (not just by absence)
    val base = spark.read.parquet(dir).where("batch_id = 2")
    assert(base.where("client = 'alice' AND deleted").count() == 1)

    // restart replay: the max batch re-runs foreachBatch with the same id
    serving.upsertBatch(lastBatch, 3L)
    assert(serving.asMap == before, "replayed max batch must stay idempotent")

    // compaction is re-runnable and converges (crash-between-steps recovery)
    serving.compact(spark)
    assert(partitions(dir) == Seq(2L, 3L) && serving.asMap == before)

    // life goes on: a later batch deletes and re-adds
    serving.upsertBatch(views(("alice", Seq("alice:::TSLA"), false)), 4L)
    assert(serving.asMap == before + ("alice" -> Seq("alice:::TSLA")))
  }

  test("auto-compaction keeps the partition count bounded under a stream") {
    val dir = Files.createTempDirectory("serving-autocompact").toString
    val serving = new ParquetServing(dir, viewName = "autocompact_view", compactEvery = 2)
    (0L to 6L).foreach { i =>
      serving.upsertBatch(views((s"c$i", Seq(s"c$i:::T"), false)), i)
    }
    // folds ran at batches 2/4/6; partitions stay at (base, max) + at most
    // compactEvery recent ones instead of 7
    assert(partitions(dir).size <= 3, s"got ${partitions(dir)}")
    assert(serving.asMap == (0L to 6L).map(i => s"c$i" -> Seq(s"c$i:::T")).toMap)
  }

  test("compact is a no-op below three batch partitions") {
    val dir = Files.createTempDirectory("serving-compact2").toString
    val serving = new ParquetServing(dir, viewName = "compact_spec_view2")
    serving.compact(spark) // empty store: no crash
    serving.upsertBatch(views(("a", Seq("a:::T"), false)), 0L)
    serving.upsertBatch(views(("b", Seq("b:::T"), false)), 1L)
    serving.compact(spark)
    assert(partitions(dir) == Seq(0L, 1L), "nothing worth folding below the max")
    assert(serving.asMap == Map("a" -> Seq("a:::T"), "b" -> Seq("b:::T")))
  }
}
