package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("contaminated docs dropped per batch; clean docs pass; gate works in foreachBatch") {
    val dir = Files.createTempDirectory("decontam-index").toString
    val gate = new StreamingDecontaminate(dir, k = 5)

    val benchDoc = "the quick brown fox jumps over the lazy dog today"
    gate.buildIndex(Seq((1000L, benchDoc)).toDF("doc_id", "text"))

    // batch 1: one doc embedding a benchmark 5-gram, one clean doc
    val admitted1 = gate.processBatch(spark, Seq(
      (1L, "we observed the quick brown fox jumps over a fence"), // shares a 5-shingle
      (2L, "completely unrelated training text with many other words")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted1 == Set(2L))

    // batch 2 (fresh batch, same index): clean passes, short doc passes
    val admitted2 = gate.processBatch(spark, Seq(
      (10L, "short doc"),
      (11L, "fox jumps over the lazy dog today is in the benchmark")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted2 == Set(10L))

    // drive it through a real streaming query via foreachBatch
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Set.empty[Long]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("decontam-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= gate.processBatch(spark, b).collect().map(_.getLong(0))
        ()
      }
      .start()
    input.addData((20L, "the quick brown fox jumps over everything again"),
      (21L, "yet another perfectly clean training document right here"))
    q.processAllAvailable()
    q.stop()
    assert(out.toSet == Set(21L))
  }

  test("span gate: a long verbatim quote is dropped, an isolated shared k-gram passes") {
    val dir = Files.createTempDirectory("decontam-span-index").toString
    val gate = new StreamingDecontaminate(dir, k = 5)

    def toks(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val quote = (1 to 16).map(i => s"q$i").mkString(" ") // a 16-token benchmark span
    gate.buildIndex(Seq((1000L, s"${toks("h", 3)} $quote ${toks("t", 3)}")).toDF("doc_id", "text"))

    val admitted = gate.processBatchSpans(spark, Seq(
      // contains the full 16-token quote verbatim -> dropped at threshold 13
      (1L, s"${toks("a", 4)} $quote ${toks("b", 4)}"),
      // shares ONE isolated 5-gram (q1..q5) but no 13-token run -> tolerated
      (2L, s"${toks("c", 6)} q1 q2 q3 q4 q5 ${toks("d", 6)}"),
      // clean
      (3L, toks("e", 20))).toDF("doc_id", "text"), minSpanTokens = 13)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L, 3L), s"span gate admitted $admitted")

    // the flag-any-shingle gate would have dropped doc 2 as well — the span
    // rule is strictly more tolerant on sub-threshold overlap
    val strict = gate.processBatch(spark, Seq(
      (2L, s"${toks("c", 6)} q1 q2 q3 q4 q5 ${toks("d", 6)}")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(strict.isEmpty)
    gate.close()
  }

  test("span gate stitches only lockstep runs: scattered holdout fragments admit the doc") {
    val dir = Files.createTempDirectory("decontam-diag-index").toString
    val gate = new StreamingDecontaminate(dir, k = 5)
    // holdout holds train doc 1's three 5-grams at SCATTERED positions —
    // consecutive batch positions, non-consecutive counterparts: three
    // separate 5-token matches, no 6-token verbatim run exists
    gate.buildIndex(Seq(
      (1000L, "a1 a2 a3 a4 a5 x1 x2 a2 a3 a4 a5 a6 y1 y2 a3 a4 a5 a6 a7"),
      (1001L, "h1 h2 b1 b2 b3 b4 b5 b6 h3 h4")).toDF("doc_id", "text"))
    val admitted = gate.processBatchSpans(spark, Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7"),             // phantom 7-token "span": admit
      (2L, "f1 f2 b1 b2 b3 b4 b5 b6 f3 f4"),    // true 6-token quote: drop
      (3L, "c1 c2 c3 c4 c5 c6 c7")).toDF("doc_id", "text"), minSpanTokens = 6)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 3L), s"diagonal stitching wrong: admitted $admitted")
    gate.close()
  }

  test("an index written by an older format fails loudly with a rebuild message") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("decontam-stale-index").toString
    // the first index format: bare positional hashes, no shingle text
    Seq((1000L, 0, 42L)).toDF("hold_id", "hpos", "h")
      .write.mode("overwrite").parquet(dir)
    val gate = new StreamingDecontaminate(dir, k = 5)
    val batch = Seq((1L, "some training text")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      gate.processBatch(spark, batch).collect()
    }
    assert(e.getMessage.contains("re-run buildIndex"), e.getMessage)
    // rebuild repairs it in place
    gate.buildIndex(Seq((1000L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
    assert(gate.processBatch(spark, batch).collect().map(_.getLong(0)).toSet == Set(1L))
    gate.close()
  }

  test("span gate throughput: string-verified batches sustain >= 900 docs/s") {
    import org.apache.spark.sql.functions._
    // the round-8 exact-verify step re-derives k-gram text for the matched
    // remnant each batch; this gates that the added work stays remnant-sized
    // (a full-corpus re-tokenize or a quadratic verify would land far below
    // the bound even with 45% box noise). Floor calibration: idle-box
    // measurement is ~2060 docs/s (round 9), so 900 holds under the worst
    // measured load swing. The floor is docs/s rather than the 10k ev/s of
    // the stateless gates because each batch pays an index equi-join plus a
    // remnant-sized string verify, not a narrow projection.
    val dir = Files.createTempDirectory("decontam-rate-index").toString
    val gate = new StreamingDecontaminate(dir, k = 5)
    val nDocs = 5000
    def qblock(k: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(19)), j => concat_ws("_", lit("q"), k, j))
    gate.buildIndex(spark.range(10).select(
      (col("id") + 1000000L).as("doc_id"),
      array_join(qblock(col("id")), " ").as("text")))
    def batch = spark.range(nDocs).select(
      col("id").as("doc_id"),
      array_join(concat(
        transform(sequence(lit(0), lit(29)), j => concat_ws("_", lit("u"), col("id"), j)),
        when(col("id") % 100 < 2, qblock(pmod(col("id") / 100, lit(10)).cast("long")))
          .otherwise(transform(sequence(lit(30), lit(49)),
            j => concat_ws("_", lit("u"), col("id"), j)))
      ), " ").as("text"))
    gate.processBatchSpans(spark, batch.limit(200), minSpanTokens = 13).count() // warmup
    val t0 = System.nanoTime()
    val survivors = gate.processBatchSpans(spark, batch, minSpanTokens = 13).count()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(survivors == nDocs - 100, s"expected ${nDocs - 100} survivors, got $survivors")
    val rate = nDocs / dt
    info(f"span gate sustained $rate%.0f docs/s over $nDocs docs (gate: >= 900)")
    assert(rate >= 900, f"span-gate rate $rate%.0f docs/s below the 900 floor")
    gate.close()
  }

  test("span gate string-verifies: a hash collision cannot drop a clean document") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("decontam-collide-index").toString
    val doc = (1 to 14).map(i => s"v$i").mkString(" ") // 10 positional 5-grams
    // forge an index whose HASHES are the doc's real 5-gram hashes on a
    // perfect lockstep diagonal (hash-only stitching sees a 14-token span,
    // over the 13 threshold) but whose stored TEXT is something else — the
    // on-disk shape of a 60-bit collision. Only exact verification tells
    // the difference.
    graft.operators.Dedup.positionalShingleText(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 5)
      .select(lit(999L).as("hold_id"), col("pos").as("hpos"),
        graft.functions.Hashing.hash60(col("g")).as("h"),
        lit("entirely different benchmark text").as("hg"))
      .write.mode("overwrite").parquet(dir)
    val gate = new StreamingDecontaminate(dir, k = 5)
    val admitted = gate.processBatchSpans(spark,
      Seq((1L, doc)).toDF("doc_id", "text"), minSpanTokens = 13)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L),
      "a forged hash-collision diagonal dropped a clean document — string verification is not applied")
    gate.close()
  }
}
