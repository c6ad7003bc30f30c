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

  /** Resized media: payload truncated in proportion (deterministic stub for
    * a real resampler), metadata updated.
    */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** One sampled frame of a "video" payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte], frame_mean: Double)

  /** Build a media table from `documents`: payload = UTF-8 bytes of the text
    * (standing in for image bytes), typed metadata (width/height derived
    * deterministically from doc_id) carried alongside.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars"),
      (lit(64) + col("doc_id") % 64).cast("int").as("width"),
      (lit(48) + col("doc_id") % 48).cast("int").as("height"))

  /** Decode features via mapPartitions — one JVM-side "batch" per partition,
    * the same execution shape a vectorized (Arrow/pandas) UDF would have.
    * Batching matters at scale: a real codec amortizes model/codec init per
    * partition, not per row.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select("doc_id", "payload", "n_chars")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map(MediaCodec.decodeStub)
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("feat").as("mm_feat"))
      .orderBy("doc_id")
  }

  /** Resize: STUB resampler — keeps a deterministic byte prefix proportional
    * to the target/original pixel ratio. The mapPartitions shape (batched,
    * metadata-aware) is what a real image resampler plugs into.
    */
  def resize(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, w, h) =>
          val ratio = (targetW.toLong * targetH).toDouble / (w.toLong * h)
          val keep = math.max(1, math.min(payload.length, (payload.length * ratio).toInt))
          ResizedMedia(id, targetW, targetH, payload.take(keep))
        }
      }
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"))
      .orderBy("doc_id")
  }

  /** Frame sampling: STUB decoder — treats the payload as fixed-size frame
    * blocks and emits every `stride`-th block with a cheap per-frame feature
    * (mean byte value). flatMap shape = one input row fanning out to frames.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select("doc_id", "payload", "n_chars")
      .as[MediaRow]
      .flatMap { row =>
        row.payload.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (block, i) =>
            val mean = if (block.isEmpty) 0.0
              else block.map(_ & 0xff).sum.toDouble / block.length
            Frame(row.doc_id, i, block, mean)
          }
      }
      .toDF()
      .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("n_bytes"),
        round(col("frame_mean"), 6).as("frame_mean"))
      .orderBy("doc_id", "frame_idx")
  }
}
