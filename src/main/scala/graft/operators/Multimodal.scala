package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads with typed metadata,
  * processed by a batched per-partition "decode" stage.
  *
  * The container has no image/audio codecs, so [[MediaCodec.decodeStub]] is a
  * clearly-marked deterministic fake; everything around it — binary column
  * handling, metadata struct, the `mapPartitions` batch shape (mirroring an
  * Arrow-batched pandas UDF), partitioning — is real and tested. Swapping in a
  * real decoder changes only the stub body.
  */
object Multimodal {

  /** Raw media record: payload is an opaque binary column. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], n_chars: Long)

  /** Decoded features: fixed-width vector per media item. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, feat: Array[Double])

  object MediaCodec {
    /** STUB — stands in for image/audio decode + feature extraction.
      * Deterministic: [byte length, char length, doc_id mod 7].
      */
    def decodeStub(row: MediaRow): MediaFeatures =
      MediaFeatures(
        row.doc_id,
        row.payload.length,
        Array(row.payload.length.toDouble, row.n_chars.toDouble, (row.doc_id % 7).toDouble))
  }

  /** Build a media table from `documents`: payload = UTF-8 bytes of the text
    * (standing in for image bytes), metadata carried alongside.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars"))

  /** Decode features via mapPartitions — one JVM-side "batch" per partition,
    * the same execution shape a vectorized (Arrow/pandas) UDF would have.
    * Batching matters at scale: a real codec amortizes model/codec init per
    * partition, not per row.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map(MediaCodec.decodeStub)
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("feat").as("mm_feat"))
      .orderBy("doc_id")
  }
}
