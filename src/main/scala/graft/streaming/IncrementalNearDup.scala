package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental MinHash-LSH near-duplicate filtering for streaming ingest:
  * each micro-batch is deduplicated against BOTH itself and the accumulated
  * history of previously admitted documents, then admitted docs extend the
  * history — the standard pattern for dedup-at-ingest over an unbounded
  * corpus.
  *
  * The history lives as two parquet indexes (band signatures + shingle sets),
  * NOT raw text: per admitted doc that is `bands` fixed-width rows plus one
  * hash array — tiny relative to the corpus, partition-prunable by band
  * signature, and exactly what a Delta/iceberg table would hold at 100 TB.
  * Inside `foreachBatch` this runs as plain batch Spark, so all the batch
  * operator's properties (no cross join, bounded-fan-out candidate keys,
  * exact verification) carry over.
  */
class IncrementalNearDup(
    historyDir: String,
    k: Int = 3,
    numPerm: Int = 64,
    bands: Int = 16,
    threshold: Double = 0.5,
    checkpointDir: Option[String] = None) {

  private def bandsDir = s"$historyDir/bands"
  private def setsDir = s"$historyDir/sets"

  // the previous batch's reliable-barrier path, rotated at the next
  // processBatch call (see below) so a long-running stream holds at most ONE
  // barrier dir instead of accumulating one per batch
  private var prevBarrierPath: Option[String] = None

  /** History existence via the Hadoop FileSystem API so the check honors the
    * configured filesystem (HDFS/S3 at scale, local in tests) — a
    * java.io.File probe would silently report "absent" on any non-local FS
    * and admit every cross-batch near-duplicate.
    */
  private def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) Some(spark.read.parquet(dir)) else None
  }

  /** Process one batch of (doc_id, text): returns the admitted doc ids
    * (near-dups of history or earlier-in-batch docs are rejected) and
    * appends their index entries to the history.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // rotate the reliable barrier: the returned frame lazily re-reads its
    // barrier file, so THIS batch's path cannot be deleted in-method — but
    // by the time the next batch arrives, the previous batch's frame has
    // been fully consumed (foreachBatch completes before the next batch is
    // scheduled), so its barrier files are deleted here. Growth is thereby
    // bounded at one barrier dir, not one per batch. Contract: the caller
    // must not hold the returned frame past its micro-batch (the
    // foreachBatch shape guarantees this).
    prevBarrierPath.foreach(p => graft.operators.Materialize.delete(batch, p))
    prevBarrierPath = None

    val ex0 = Dedup.shingleIndex(batch, idCol, textCol, k).persist()
    ex0.count()
    val batchSets = Dedup.shingleSets(ex0).persist()
    val batchBands = Dedup.bandedSignatures(ex0, numPerm, bands).persist()
    batchSets.count(); batchBands.count()

    val histBands = readIfExists(spark, bandsDir)
    val histSets = readIfExists(spark, setsDir)

    def jaccardOk(cand: DataFrame, setsA: DataFrame, setsB: DataFrame): DataFrame =
      cand
        .join(setsA.select(col("doc_id").as("doc_a"), col("hs").as("hsa"), col("sz").as("sza")), "doc_a")
        .join(setsB.select(col("doc_id").as("doc_b"), col("hs").as("hsb"), col("sz").as("szb")), "doc_b")
        .withColumn("common", size(array_intersect(col("hsa"), col("hsb"))))
        .filter(col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double") >= threshold)
        .select("doc_a", "doc_b")

    // within-batch dups: later doc_id rejected in favor of the earlier one
    val selfCand = batchBands.as("a").join(batchBands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val selfDups = jaccardOk(selfCand, batchSets, batchSets)
      .select(col("doc_b").as("doc_id")).distinct()

    // against-history dups: any batch doc near a previously admitted doc
    val histDups = (histBands, histSets) match {
      case (Some(hb), Some(hs)) =>
        val cand = hb.as("a").join(batchBands.as("b"),
            col("a.band_id") === col("b.band_id") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        jaccardOk(cand, hs, batchSets).select(col("doc_b").as("doc_id")).distinct()
      case _ => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    }

    // materialize + truncate lineage BEFORE extending the history: the lazy
    // plan reads the history parquet this method is about to append to, so a
    // re-evaluation after the append would see the batch's own entries.
    // Distributed either way (no driver collect): localCheckpoint by
    // default, or the executor-loss-safe parquet barrier when the
    // constructor's checkpointDir is set (the returned frame re-reads its
    // barrier file, so the caller owns the dir's lifetime).
    val admittedPlan = batch.select(col(idCol).as("doc_id")).distinct()
      .join(selfDups.union(histDups).distinct(), Seq("doc_id"), "left_anti")
    val admitted = checkpointDir match {
      case Some(dir) =>
        val (f, p) = graft.operators.Materialize.reliable(admittedPlan, dir)
        prevBarrierPath = Some(p) // deleted at the NEXT processBatch call
        f
      case None => admittedPlan.localCheckpoint()
    }

    // extend the history with the admitted docs' index entries
    batchBands.join(admitted, "doc_id")
      .write.mode(SaveMode.Append).parquet(bandsDir)
    batchSets.join(admitted, "doc_id")
      .write.mode(SaveMode.Append).parquet(setsDir)

    ex0.unpersist(); batchSets.unpersist(); batchBands.unpersist()
    admitted
  }
}
