package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming benchmark-decontamination gate: inside `foreachBatch`, drop any
  * incoming document that shares a word-k-shingle with the benchmark/holdout
  * index — dedup-at-ingest's sibling for eval-set hygiene.
  *
  * The index is built ONCE from the holdout corpus ([[buildIndex]]) and holds
  * only distinct 60-bit shingle hashes — fixed-width longs, tiny relative to
  * any corpus, partition-prunable, and exactly what would live in a
  * Delta/Iceberg table at 100 TB. Per batch the gate is one equi-join of the
  * batch's shingle hashes against the index (AQE broadcasts the index side
  * while it is small) followed by a left-anti join — never a doc×doc join,
  * no driver materialization.
  */
class StreamingDecontaminate(indexDir: String, k: Int = 5) {

  // the index is immutable after buildIndex, so it is read + cached once per
  // gate instead of paying listing/footer/scan every micro-batch; close()
  // releases the cache when the gate retires. The any-shingle gate only
  // needs the distinct hash set, cached separately so it isn't re-derived
  // from the positional index every micro-batch.
  @volatile private var cachedIndex: Option[DataFrame] = None
  @volatile private var cachedHashes: Option[DataFrame] = None

  /** Offline step: persist the holdout corpus's POSITIONAL shingle index —
    * (hold_id, hpos, h). Positions cost a few extra longs on a
    * tiny-by-definition benchmark set and are what lets the span gate
    * stitch TRUE verbatim runs (both sides advancing in lockstep) instead
    * of train-side position islands.
    */
  def buildIndex(holdout: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Dedup.positionalShingleIndex(holdout, idCol, textCol, k)
      .select(col("doc_id").as("hold_id"), col("pos").as("hpos"), col("h"))
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(indexDir)
    close() // a rebuilt index invalidates any cached copy
  }

  private def index(spark: SparkSession): DataFrame =
    cachedIndex.getOrElse(synchronized {
      cachedIndex.getOrElse {
        val idx = spark.read.parquet(indexDir).persist()
        idx.count()
        cachedIndex = Some(idx)
        idx
      }
    })

  private def hashIndex(spark: SparkSession): DataFrame =
    cachedHashes.getOrElse(synchronized {
      cachedHashes.getOrElse {
        val hx = index(spark).select("h").distinct().persist()
        hx.count()
        cachedHashes = Some(hx)
        hx
      }
    })

  /** Release the cached index (call when the gate retires). */
  def close(): Unit = synchronized {
    cachedIndex.foreach(_.unpersist())
    cachedIndex = None
    cachedHashes.foreach(_.unpersist())
    cachedHashes = None
  }

  /** One micro-batch of documents -> the uncontaminated survivors. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val contaminated = Dedup.shingleIndex(batch, idCol, textCol, k)
      .join(hashIndex(spark), "h")
      .select(col("doc_id").as("__contaminated_id"))
      .distinct()
    batch.join(contaminated, col(idCol) === col("__contaminated_id"), "left_anti")
  }

  /** SPAN-rule micro-batch gate — the Lee-et-al exact-substring rule at
    * ingest: drop only documents containing a verbatim run of at least
    * `minSpanTokens` tokens from the holdout; isolated shared k-grams below
    * the span threshold are tolerated (an exact quote is contamination, a
    * common phrase is not). Same shape as [[processBatch]] plus
    * gaps-and-islands run stitching computed only on the contaminated
    * remnant of the batch.
    *
    * TRUE-run semantics: a run requires the batch doc and one holdout doc
    * to advance in LOCKSTEP — islands along each (hold_id, pos − hpos)
    * diagonal. Stitching batch-side positions alone would glue back-to-back
    * matches of SCATTERED holdout fragments into one long phantom span and
    * drop clean documents whenever `minSpanTokens > k`.
    */
  def processBatchSpans(spark: SparkSession, batch: DataFrame, minSpanTokens: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, s"span threshold $minSpanTokens below the index k=$k")
    val diagged = Dedup.positionalShingleIndex(batch, idCol, textCol, k)
      .join(index(spark), "h")
      .select(col("doc_id"), col("pos"), col("hold_id"), col("hpos")).distinct()
      .withColumn("diag", col("pos") - col("hpos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "hold_id", "diag").orderBy("pos")
    val flagged = diagged
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("hold_id"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .filter(col("run") + lit(k - 1) >= minSpanTokens)
      .select(col("doc_id").as("__contaminated_id"))
      .distinct()
    batch.join(flagged, col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
