package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** Streaming training-data ingest: the LLM-pipeline operators composed on a
  * document stream — content-hash exact dedup within a watermark, token/
  * quality gating, and per-doc signals, all as one declarative streaming
  * transform (no custom state: dropDuplicatesWithinWatermark carries the
  * dedup state, bounded by the watermark).
  *
  * At scale: dedup state is keyed by the 60-bit content hash (fixed-width,
  * uniformly distributed — no skew), and everything else is a narrow
  * codegen'd projection, so throughput is source-bound.
  */
object DocumentIngest {

  /** input: (doc_id LONG, text STRING, ts TIMESTAMP) streaming frame.
    * output: deduped, quality-filtered docs with ingest signals.
    */
  def pipeline(docs: DataFrame,
               watermark: String = "1 hour",
               minTokens: Int = 5,
               maxStopRatio: Double = 0.9): DataFrame = {
    val toks = Text.tokens(col("text"))
    val enStops = typedLit(Text.enStopwords)
    docs
      .withColumn("content_hash", Hashing.hash60(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          size(filter(toks, t => array_contains(enStops, t))).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(1.0)))
      .filter(col("n_tokens") >= minTokens && col("stop_ratio") <= maxStopRatio)
      .select("doc_id", "ts", "text", "content_hash", "n_tokens", "stop_ratio")
  }

  /** [[pipeline]] + context-length chunking: admitted docs split into
    * `chunkSize`-token chunks sharing `overlap` tokens — the streaming half
    * of the batch chunk→pack prep
    * ([[graft.operators.TextAnalysis.chunkDocuments]], same core, proven
    * equal in `DocumentIngestSpec`). Chunking is stateless and narrow
    * (tokenize + explode + slice, no sort, no added state), so it appends
    * cleanly after the watermarked dedup; each chunk row keeps the doc's
    * ingest signals (`ts`, `content_hash`).
    *
    * Packing stays batch-only by design: bin assignment is a sequential walk
    * over a sorted snapshot (`Packing.packSequences`), which an unbounded
    * append stream cannot provide — pack per landed partition downstream.
    */
  def chunked(docs: DataFrame,
              watermark: String = "1 hour",
              minTokens: Int = 5,
              maxStopRatio: Double = 0.9,
              chunkSize: Int = 64,
              overlap: Int = 16): DataFrame =
    graft.operators.TextAnalysis.chunkCore(
      pipeline(docs, watermark, minTokens, maxStopRatio),
      chunkSize, overlap, carry = Seq("ts", "content_hash"))
}
