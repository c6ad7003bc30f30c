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
  // releases the cache when the gate retires
  @volatile private var cachedIndex: Option[DataFrame] = None

  /** Offline step: persist the holdout corpus's distinct shingle hashes. */
  def buildIndex(holdout: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Dedup.shingleIndex(holdout, idCol, textCol, k)
      .select("h").distinct()
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

  /** Release the cached index (call when the gate retires). */
  def close(): Unit = synchronized {
    cachedIndex.foreach(_.unpersist())
    cachedIndex = None
  }

  /** One micro-batch of documents -> the uncontaminated survivors. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val contaminated = Dedup.shingleIndex(batch, idCol, textCol, k)
      .join(index(spark), "h")
      .select(col("doc_id").as("__contaminated_id"))
      .distinct()
    batch.join(contaminated, col(idCol) === col("__contaminated_id"), "left_anti")
  }

  /** SPAN-rule micro-batch gate — the Lee-et-al exact-substring rule at
    * ingest: drop only documents containing a verbatim run of at least
    * `minSpanTokens` tokens from the holdout; isolated shared k-grams below
    * the span threshold are tolerated (an exact quote is contamination, a
    * common phrase is not). Same shape as [[processBatch]] plus per-doc
    * gaps-and-islands run stitching over matched POSITIONS, computed only
    * on the contaminated remnant of the batch.
    */
  def processBatchSpans(spark: SparkSession, batch: DataFrame, minSpanTokens: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, s"span threshold $minSpanTokens below the index k=$k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val flagged = Dedup.positionalShingleIndex(batch, idCol, textCol, k)
      .join(index(spark), "h")
      .select("doc_id", "pos").distinct()
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .filter(col("run") + lit(k - 1) >= minSpanTokens)
      .select(col("doc_id").as("__contaminated_id"))
      .distinct()
    batch.join(flagged, col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
