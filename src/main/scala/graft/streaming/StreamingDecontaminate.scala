package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming benchmark-decontamination gate: inside `foreachBatch`, drop any
  * incoming document that shares a word-k-shingle with the benchmark/holdout
  * index — dedup-at-ingest's sibling for eval-set hygiene.
  *
  * The index is built ONCE from the holdout corpus ([[buildIndex]]) and holds
  * positional 60-bit shingle hashes plus the shingle text (for exact
  * verification in the span gate) — tiny relative to any corpus (the holdout
  * is a benchmark set by definition), partition-prunable, and exactly what
  * would live in a Delta/Iceberg table at 100 TB. Per batch the gate is one
  * equi-join of the batch's shingle hashes against the index (AQE broadcasts
  * the index side while it is small) followed by a left-anti join — never a
  * doc×doc join, no driver materialization. The load path validates the
  * index schema, so a directory written by an incompatible version fails
  * with a rebuild instruction instead of a mid-batch AnalysisException.
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
    * (hold_id, hpos, h, hg). Positions are what lets the span gate stitch
    * TRUE verbatim runs (both sides advancing in lockstep) instead of
    * train-side position islands; the shingle TEXT (hg) is what lets it
    * string-verify candidates so a 60-bit hash collision can never drop a
    * clean document. Both cost a few extra bytes per position on a
    * tiny-by-definition benchmark set.
    */
  def buildIndex(holdout: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Dedup.positionalShingleText(holdout, idCol, textCol, k)
      .select(col("doc_id").as("hold_id"), col("pos").as("hpos"),
        graft.functions.Hashing.hash60(col("g")).as("h"), col("g").as("hg"))
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(indexDir)
    close() // a rebuilt index invalidates any cached copy
  }

  /** The schema [[buildIndex]] writes. The load path validates against it
    * so a directory persisted by an OLDER format (the first version held
    * bare hashes) fails loudly with a rebuild instruction instead of an
    * unresolved-column AnalysisException mid-batch (span gate) or silently
    * serving the stale format (any-shingle gate).
    */
  private val indexColumns = Set("hold_id", "hpos", "h", "hg")

  private def index(spark: SparkSession): DataFrame =
    cachedIndex.getOrElse(synchronized {
      cachedIndex.getOrElse {
        val raw = spark.read.parquet(indexDir)
        if (raw.columns.toSet != indexColumns)
          throw new IllegalStateException(
            s"holdout index at $indexDir has columns ${raw.columns.sorted.mkString("(", ", ", ")")} " +
              s"but this version expects ${indexColumns.toSeq.sorted.mkString("(", ", ", ")")} — " +
              "it was written by an incompatible version; re-run buildIndex()")
        val idx = raw.persist()
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
    *
    * Candidates are string-VERIFIED like the batch path
    * ([[graft.operators.Dedup.exactSubstringContamination]]): k-gram text is
    * re-derived for the matched remnant of the batch only and compared
    * against the index's stored shingle text, so a 60-bit hash collision
    * aligned on a diagonal can never drop a clean document.
    */
  def processBatchSpans(spark: SparkSession, batch: DataFrame, minSpanTokens: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, s"span threshold $minSpanTokens below the index k=$k")
    val cand = Dedup.positionalShingleIndex(batch, idCol, textCol, k)
      .join(index(spark), "h")
      .select(col("doc_id"), col("pos"), col("hold_id"), col("hpos"), col("hg"))
      .distinct()
    // exact-text verification over the remnant: re-derive k-gram strings for
    // candidate batch docs only and require string equality with the index
    val remnant = cand.select(col("doc_id").as("__rid")).distinct()
    val batchText = Dedup.positionalShingleText(
      batch.join(broadcast(remnant), col(idCol) === col("__rid")).drop("__rid"),
      idCol, textCol, k)
    val diagged = cand
      .join(batchText, Seq("doc_id", "pos"))
      .filter(col("g") === col("hg"))
      .select("doc_id", "pos", "hold_id", "hpos")
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
