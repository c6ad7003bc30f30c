package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(words: String*) = words.mkString(" ")

  test("near-dups rejected within a batch and across batches; history persists") {
    val dir = Files.createTempDirectory("neardup").toString
    val dedup = new IncrementalNearDup(dir, threshold = 0.5)

    val base = doc("fast", "column", "scan", "with", "vector", "units", "and", "simd", "gather", "ops")
    val mutated = base.split(" ").updated(9, "loads").mkString(" ") // ~0.7 jaccard on 3-grams
    val unrelated = doc("hash", "join", "probe", "side", "build", "partition", "radix", "bits", "tune", "it")

    // batch 1: base + its mutation + an unrelated doc
    val admitted1 = dedup.processBatch(spark,
      Seq((1L, base), (2L, mutated), (3L, unrelated)).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted1 == Set(1L, 3L), "later near-dup of an in-batch doc must be rejected")

    // batch 2: another mutation of base (cross-batch dup) + a fresh doc
    val mutated2 = base.split(" ").updated(0, "quick").mkString(" ")
    val fresh = doc("window", "frame", "running", "total", "rank", "dense", "lag", "lead", "tile", "x")
    val admitted2 = dedup.processBatch(spark,
      Seq((10L, mutated2), (11L, fresh)).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted2 == Set(11L), "near-dup of a HISTORY doc must be rejected")

    // batch 3: resubmitting an admitted doc's text is also rejected
    val admitted3 = dedup.processBatch(spark,
      Seq((20L, unrelated)).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted3 == Set.empty[Long])
  }

  test("a batch-built index (minhashIndexStore) seeds the streaming ingest loop") {
    import graft.operators.Dedup
    // same bands/sets layout: an index built by the scheduled-batch API is
    // directly consumable as streaming history, and vice versa
    val dir = Files.createTempDirectory("neardup-interop").toString
    val base = doc("fast", "column", "scan", "with", "vector", "units", "and", "simd", "gather", "ops")
    Dedup.minhashIndexStore(Seq((1L, base)).toDF("doc_id", "text"), dir, "doc_id", "text")
    val dedup = new IncrementalNearDup(dir, threshold = 0.5)
    val mutated = base.split(" ").updated(9, "loads").mkString(" ")
    val fresh = doc("window", "frame", "running", "total", "rank", "dense", "lag", "lead", "tile", "x")
    val admitted = dedup.processBatch(spark,
      Seq((10L, mutated), (11L, fresh)).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(11L),
      "a near-dup of a batch-indexed doc must be rejected by the streaming loop")
    // and the streaming-extended store serves the batch reporter: the fresh
    // doc now self-matches at jaccard 1.0
    val flagged = Dedup.dedupIncremental(spark, dir,
        Seq((11L, fresh)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(flagged == Set((11L, 11L, 1.0)), s"got $flagged")
  }
}
