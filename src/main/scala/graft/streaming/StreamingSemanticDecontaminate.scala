package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming SEMANTIC decontamination gate — [[StreamingDecontaminate]]'s
  * embedding-space sibling: inside `foreachBatch`, drop any incoming vector
  * whose cosine against ANY holdout/benchmark embedding reaches `threshold`,
  * catching contamination that survives arbitrary token-level rewording (no
  * shared n-gram required — the mode every text-space ingest gate misses).
  *
  * The index is built ONCE from the holdout embeddings ([[buildIndex]]) —
  * tiny relative to any corpus (a benchmark set by definition) and cached
  * per gate instance. Per batch the gate is
  * [[graft.operators.Similarity.applySemanticDecontamination]]: bipartite
  * hyperplane-LSH banding with the holdout broadcast on the candidate AND
  * verify joins, exact-cosine verification, then a broadcast anti-join —
  * the batch is never shuffled, so throughput is source-bound like the text
  * gates. The load path validates the index schema so a directory written by
  * an incompatible version fails with a rebuild instruction instead of a
  * mid-batch AnalysisException.
  */
class StreamingSemanticDecontaminate(indexDir: String, threshold: Double = 0.9,
                                     nBits: Int = 16, bandBits: Int = 4) {

  @volatile private var cachedHoldout: Option[DataFrame] = None

  /** Offline step: persist the holdout embeddings — (vec_id, embedding). */
  def buildIndex(holdout: DataFrame): Unit = {
    holdout.select(col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(indexDir)
    close() // a rebuilt index invalidates any cached copy
  }

  private val indexColumns = Set("vec_id", "embedding")

  private def holdout(spark: SparkSession): DataFrame =
    cachedHoldout.getOrElse(synchronized {
      cachedHoldout.getOrElse {
        val raw = spark.read.parquet(indexDir)
        if (raw.columns.toSet != indexColumns)
          throw new IllegalStateException(
            s"holdout embedding index at $indexDir has columns " +
              s"${raw.columns.sorted.mkString("(", ", ", ")")} but this version expects " +
              s"${indexColumns.toSeq.sorted.mkString("(", ", ", ")")} — re-run buildIndex()")
        val idx = raw.persist()
        idx.count()
        cachedHoldout = Some(idx)
        idx
      }
    })

  /** Release the cached index (call when the gate retires). */
  def close(): Unit = synchronized {
    cachedHoldout.foreach(_.unpersist())
    cachedHoldout = None
  }

  /** One micro-batch of (vec_id, embedding, ...) rows -> the semantically
    * uncontaminated survivors (all input columns preserved).
    */
  def processBatch(spark: SparkSession, batch: DataFrame): DataFrame =
    Similarity.applySemanticDecontamination(
      batch, holdout(spark), threshold, nBits, bandBits)
}
