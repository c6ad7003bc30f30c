package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Sequence packing — the step between chunking ([[TextAnalysis.chunkDocuments]])
  * and tokenization in an LLM training pipeline: pack variable-length chunks
  * into training examples of at most `budget` tokens, wasting as little of
  * each example's budget as possible, deterministically and in parallel.
  *
  * Reference scope: the reference engine's pipeline ends at per-key
  * aggregation (`kafka_streams.clj:72-80`); packing is part of the
  * training-data capability closure this engine adds on top (SURVEY.md §2.C).
  *
  * Algorithm — deterministic sharded NEXT-FIT:
  *
  *  1. Every chunk gets a 60-bit portable hash of its identity
  *     (`pack:<doc_id>:<chunk_idx>`, [[Hashing.hash60]]) and a shard
  *     `pack_h mod numShards`. Shards are the unit of parallelism: packing
  *     is order-dependent, so instead of one global sequential pass (a
  *     driver bottleneck) the corpus is split into `numShards` independent
  *     streams, each packed sequentially but all packed AT ONCE.
  *  2. Within a shard, chunks are walked in (pack_h, doc_id, chunk_idx)
  *     order — a total, engine-independent order — and packed next-fit:
  *     a chunk joins the current bin if it fits in the remaining budget,
  *     else it OPENS a new bin. Next-fit (vs first-fit) keeps per-stream
  *     state to a single open bin, which is what makes the pass streaming:
  *     O(1) memory regardless of corpus size, no lookback list.
  *
  * Shape at scale: one narrow projection (hash/shard ride the row), ONE
  * shuffle (`repartition` by shard) with a per-partition sort, then a
  * streaming `mapPartitions` that never materializes a group — state is two
  * ints reset on shard change. Chunk text does NOT travel: callers pack the
  * (doc_id, chunk_idx, n_tokens) metadata and join assignments back, so the
  * shuffle moves ~24 bytes/chunk even when chunks are kilobytes.
  * `numShards` sizes the parallelism: at 100 TB pick ≥ cluster cores
  * (each shard's pass is sequential); more shards = more parallelism and
  * marginally worse packing (one partially-filled trailing bin per shard).
  *
  * Guarantees (asserted in OperatorSpec):
  *  - full coverage: every input chunk appears in exactly one bin;
  *  - no overflow: per-bin token sum ≤ budget (a chunk larger than the
  *    whole budget is a caller error and raises);
  *  - bins are dense per shard (0..max, no gaps) and `pack_pos` is dense
  *    within a bin;
  *  - deterministic: the assignment is a pure function of (identity hash,
  *    budget, numShards) — independent of input partitioning or row order.
  *
  * Output: (doc_id, chunk_idx, n_tokens, shard, bin, pack_pos), ordered by
  * the walk order (shard, bin, pack_pos).
  */
object Packing {

  final case class ChunkMeta(doc_id: Long, chunk_idx: Int, n_tokens: Int,
                             pack_h: Long, shard: Int)
  final case class PackedChunk(doc_id: Long, chunk_idx: Int, n_tokens: Int,
                               shard: Int, bin: Int, pack_pos: Int)

  /** Pack chunk metadata into ≤ `budget`-token bins. `chunks` must carry
    * `doc_id`, `chunk_idx`, `n_tokens` (e.g. the output of
    * [[TextAnalysis.chunkDocuments]]); other columns are ignored.
    */
  def packChunks(spark: SparkSession, chunks: DataFrame, budget: Int = 512,
                 numShards: Int = 8): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import spark.implicits._

    val keyed: Dataset[ChunkMeta] = chunks
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens").cast("int").as("n_tokens"),
        Hashing.hash60(concat(lit("pack:"), col("doc_id"), lit(":"), col("chunk_idx")))
          .as("pack_h"))
      .withColumn("shard", pmod(col("pack_h"), lit(numShards)).cast("int"))
      .as[ChunkMeta]

    // One shuffle: co-locate each shard, then sort the partition so shards
    // are contiguous and internally in walk order. mapPartitions streams
    // the sorted iterator with next-fit state (open-bin fill + bin index)
    // that resets on shard change — no group is ever collected.
    val packed = keyed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pack_h"), col("doc_id"), col("chunk_idx"))
      .mapPartitions(it => packIterator(it, budget))

    packed.toDF().orderBy("shard", "bin", "pack_pos")
  }

  /** The streaming next-fit walk itself — pure over iterators (the Spark
    * operator maps partitions through it; PropertySpec law-tests it
    * directly). Input must be shard-contiguous and in walk order; state is
    * two ints, reset on shard change.
    */
  def packIterator(it: Iterator[ChunkMeta], budget: Int): Iterator[PackedChunk] = {
    var shard = -1; var bin = 0; var fill = 0; var pos = 0
    it.map { c =>
      if (c.n_tokens > budget)
        throw new IllegalArgumentException(
          s"chunk (${c.doc_id}, ${c.chunk_idx}) has ${c.n_tokens} tokens > budget $budget; " +
            "re-chunk with chunkSize <= budget before packing")
      if (c.shard != shard) { shard = c.shard; bin = 0; fill = 0; pos = 0 }
      else if (fill + c.n_tokens > budget) { bin += 1; fill = 0; pos = 0 }
      fill += c.n_tokens
      val out = PackedChunk(c.doc_id, c.chunk_idx, c.n_tokens, c.shard, bin, pos)
      pos += 1
      out
    }
  }

  /** Per-bin summary (size, fill, utilization) — the packing-quality view a
    * pipeline dashboards. Utilization is integer-derived (fill / budget in
    * per-mille) so both engines agree exactly.
    */
  def binStats(spark: SparkSession, chunks: DataFrame, budget: Int = 512,
               numShards: Int = 8): DataFrame = {
    packChunks(spark, chunks, budget, numShards)
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(col("n_tokens")).cast("int").as("fill"))
      // floor, not cast-of-division: DuckDB CAST(double AS INT) rounds while
      // Spark's truncates — floor agrees on both engines for positive fills
      .withColumn("util_permille", floor(col("fill") * 1000 / budget).cast("int"))
      .orderBy("shard", "bin")
  }
}
