package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads with typed metadata,
  * processed by a batched per-partition "decode" stage.
  *
  * The JDK bundles real image codecs (PNG/BMP/GIF/JPEG/TIFF via ImageIO), so
  * the image-shaped operators — [[imageioFeatures]], [[imageioResize]],
  * [[imageioFrames]], [[mixedFeatures]] — decode GENUINE pixels through
  * [[ImageIoCodec]]: procedural PNG / multi-page-TIFF payloads are encoded
  * executor-side and round-tripped through the real decoder, with
  * closed-form pixel-sum oracles that a fake decode cannot reproduce. What
  * the JDK genuinely lacks is video (H.264/VP9/AV1) and audio decode;
  * [[StubCodec]] is the clearly-marked deterministic stand-in for those
  * modalities (it carries the non-image rows of [[mixedFeatures]]), and
  * everything around it — binary column handling, metadata struct, the
  * `mapPartitions` batch shape (mirroring an Arrow-batched pandas UDF),
  * partitioning — is real and tested. A real external decoder is a drop-in:
  * implement [[MediaCodec]] and pass it to the generic operators
  * ([[extractFeatures]] / [[resize]] / [[sampleFrames]]).
  */
object Multimodal {

  /** Raw media record: payload is an opaque binary column. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], n_chars: Long)

  /** Decoded features: fixed-width vector per media item. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, feat: Array[Double])

  /** Resized media: payload truncated in proportion (deterministic stub for
    * a real resampler), metadata updated.
    */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** One sampled frame of a "video" payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte], frame_mean: Double)

  /** The pluggable decode seam: the three per-record media operations the
    * engine needs, isolated from all Spark plumbing so a real image/audio
    * library implementation is a drop-in.
    *
    * Implementations ship to executors, hence `Serializable`; heavyweight
    * state (codec handles, model weights) belongs in `@transient lazy val`
    * fields so it initializes once per executor JVM, never on the driver.
    */
  trait MediaCodec extends Serializable {
    /** Decode + feature-extract one media item. */
    def features(row: MediaRow): MediaFeatures

    /** Resample payload to target dimensions. */
    def resize(id: Long, payload: Array[Byte], width: Int, height: Int,
               targetW: Int, targetH: Int): ResizedMedia

    /** Decode a "video" payload into sampled frames. */
    def frames(row: MediaRow, frameBytes: Int, stride: Int): Iterator[Frame]
  }

  /** STUB codec — the container has no media libraries, so each operation is
    * a deterministic fake of the right shape:
    *  - features: [byte length, char length, doc_id mod 7]
    *  - resize: keeps a byte prefix proportional to the pixel ratio
    *  - frames: fixed-size byte blocks, every `stride`-th, mean-byte feature
    */
  object StubCodec extends MediaCodec {
    def features(row: MediaRow): MediaFeatures =
      MediaFeatures(
        row.doc_id,
        row.payload.length,
        Array(row.payload.length.toDouble, row.n_chars.toDouble, (row.doc_id % 7).toDouble))

    def resize(id: Long, payload: Array[Byte], width: Int, height: Int,
               targetW: Int, targetH: Int): ResizedMedia = {
      val ratio = (targetW.toLong * targetH).toDouble / (width.toLong * height)
      val keep = math.max(1, math.min(payload.length, (payload.length * ratio).toInt))
      ResizedMedia(id, targetW, targetH, payload.take(keep))
    }

    def frames(row: MediaRow, frameBytes: Int, stride: Int): Iterator[Frame] =
      row.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (block, i) =>
          val mean = if (block.isEmpty) 0.0
            else block.map(_ & 0xff).sum.toDouble / block.length
          Frame(row.doc_id, i, block, mean)
        }
  }

  /** REAL codec over the JDK's bundled ImageIO plugins — PNG/BMP/GIF/JPEG/
    * TIFF readers and writers ship with Java 9+ and are headless-safe, so
    * this needs zero external dependencies:
    *
    *  - `features` / `resize` decode GENUINE pixels (resize renders through
    *    a bilinear `Graphics2D` pass and re-encodes lossless PNG);
    *  - `frames` reads a multi-page TIFF as the "video" container — each
    *    page is one frame, `stride`-sampled, re-encoded as PNG
    *    (`frameBytes` is ignored: real containers carry their own frame
    *    geometry).
    *
    * What the JDK genuinely lacks is a VIDEO codec (H.264/VP9/AV1) and all
    * audio decode — for those, plug an external library into the same
    * [[MediaCodec]] seam; [[StubCodec]] remains the stand-in where no real
    * decoder exists.
    */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // ImageIO's stream cache defaults to FILE-backed: every encode/decode
    // round-trips through a temp file, so a per-row codec pass does disk I/O
    // per row and its latency tracks box I/O load (measured as the worst
    // bench stddev on the board). All payloads here are in-memory byte
    // arrays — switch the cache to memory-backed once per JVM (object init
    // runs on first use in each executor JVM, so this holds on a cluster).
    ImageIO.setUseCache(false)

    private[operators] def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image (PNG/BMP/GIF/JPEG/TIFF)")
      img
    }

    /** Lossless PNG encode (deterministic bytes for a given pixel grid). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    /** Multi-page TIFF encode: the JDK's only bundled multi-frame container
      * with lossless RGB — the fixture format for [[frames]].
      */
    def encodeTiffPages(pages: Seq[BufferedImage]): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val baos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        pages.foreach(p =>
          writer.writeToSequence(new javax.imageio.IIOImage(p, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      baos.toByteArray
    }

    /** Constant-color RGB image — the fixture for [[imageioResize]]: any
      * correct resampler (bilinear included) maps a constant image to a
      * constant image, so the resized pixel sums are closed-form
      * (`channel * targetW * targetH`) while still requiring a REAL decode
      * of the input PNG to learn the color.
      */
    def solidImage(w: Int, h: Int, r: Int, g: Int, b: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      img
    }

    /** Deterministic procedural RGB image: every channel is a closed-form
      * integer function of (seed, x, y), so an oracle can recompute pixel
      * sums without decoding — the cross-check that proves [[features]]
      * reads real pixels.
      */
    def patternImage(seed: Long, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((seed + x * 7L + y * 13L) % 256).toInt
          val g = ((seed * 3L + x * 11L + y) % 256).toInt
          val b = ((seed * 5L + x + y * 17L) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    /** feat = [width, height, sum_r, sum_g, sum_b] over real decoded pixels
      * (exact integer sums, so cross-engine comparison needs no tolerance).
      */
    def features(row: MediaRow): MediaFeatures = {
      val img = decode(row.payload)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      MediaFeatures(row.doc_id, row.payload.length,
        Array(img.getWidth.toDouble, img.getHeight.toDouble,
          sr.toDouble, sg.toDouble, sb.toDouble))
    }

    def resize(id: Long, payload: Array[Byte], width: Int, height: Int,
               targetW: Int, targetH: Int): ResizedMedia = {
      val img = decode(payload)
      val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      ResizedMedia(id, targetW, targetH, encodePng(out))
    }

    def frames(row: MediaRow, frameBytes: Int, stride: Int): Iterator[Frame] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(row.payload))
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable multi-frame container")
      val reader = readers.next()
      // materialize eagerly: the reader must be disposed before returning
      val out = try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).filter(_ % stride == 0).map { i =>
          val img = reader.read(i)
          var lum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              lum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val mean = lum.toDouble / (3.0 * img.getWidth * img.getHeight)
          Frame(row.doc_id, i, encodePng(img), mean)
        }
      } finally { reader.dispose(); iis.close() }
      out.iterator
    }
  }

  /** Procedural-PNG corpus round-tripped through the REAL decoder: each doc
    * gets a deterministic RGB image (closed-form pixel function of
    * (doc_id, x, y)), encoded to genuine PNG bytes executor-side and decoded
    * back through [[ImageIoCodec]]. The oracle recomputes width/height and
    * the exact per-channel pixel sums in closed form — a decode that does
    * not read real pixels cannot reproduce them.
    */
  def imageioFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // the codec pass is CPU-heavy (PNG deflate per row); a single small
    // parquet file would otherwise run it serially on one partition
    PartitionUtil.spread(docs.select("doc_id"), "doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 + (id % 8).toInt
          val h = 8 + (id % 5).toInt
          val png = ImageIoCodec.encodePng(ImageIoCodec.patternImage(id, w, h))
          ImageIoCodec.features(MediaRow(id, png, 0L))
        }
      }
      .toDF()
      .select(col("doc_id"),
        col("feat").getItem(0).cast("int").as("width"),
        col("feat").getItem(1).cast("int").as("height"),
        col("feat").getItem(2).cast("long").as("sum_r"),
        col("feat").getItem(3).cast("long").as("sum_g"),
        col("feat").getItem(4).cast("long").as("sum_b"))
      .orderBy("doc_id")
  }

  /** Closed-form solid fixture color for a doc/frame — pure integer
    * arithmetic so the DuckDB oracle recomputes it without decoding.
    */
  def solidColor(id: Long, frame: Int = 0): (Int, Int, Int) = (
    ((id * 7L + frame * 31L + 3L) % 256).toInt,
    ((id * 11L + frame * 37L + 5L) % 256).toInt,
    ((id * 13L + frame * 41L + 7L) % 256).toInt)

  /** REAL-decode resize: each doc gets a solid-color PNG (color and geometry
    * closed-form in doc_id), resampled through [[ImageIoCodec.resize]]
    * (genuine decode → bilinear `Graphics2D` render → PNG re-encode), and the
    * RESIZED payload is decoded AGAIN to report its exact per-channel pixel
    * sums. Any correct resampler maps a constant image to the same constant,
    * so the oracle is `channel * targetW * targetH` — but producing it
    * requires really decoding the input to learn the color and really
    * rendering the output grid.
    */
  def imageioResize(spark: SparkSession, docs: DataFrame,
                    targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    PartitionUtil.spread(docs.select("doc_id"), "doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 9).toInt
          val h = 12 + (id % 7).toInt
          val (r, g, b) = solidColor(id)
          val png = ImageIoCodec.encodePng(ImageIoCodec.solidImage(w, h, r, g, b))
          val resized = ImageIoCodec.resize(id, png, w, h, targetW, targetH)
          ImageIoCodec.features(MediaRow(id, resized.payload, 0L))
        }
      }
      .toDF()
      .select(col("doc_id"),
        col("feat").getItem(0).cast("int").as("width"),
        col("feat").getItem(1).cast("int").as("height"),
        col("feat").getItem(2).cast("long").as("sum_r"),
        col("feat").getItem(3).cast("long").as("sum_g"),
        col("feat").getItem(4).cast("long").as("sum_b"))
      .orderBy("doc_id")
  }

  /** REAL-decode frame sampling: each doc gets a multi-page TIFF "video"
    * (2-5 solid-color pages, color closed-form in (doc_id, frame)), decoded
    * through [[ImageIoCodec.frames]] with stride sampling; each sampled frame
    * is decoded AGAIN for its exact per-channel pixel sums. flatMap shape =
    * one container row fanning out to frames, the real-pipeline geometry.
    */
  def imageioFrames(spark: SparkSession, docs: DataFrame,
                    stride: Int = 2): DataFrame = {
    import spark.implicits._
    PartitionUtil.spread(docs.select("doc_id"), "doc_id").as[Long]
      .flatMap { id =>
        val w = 8 + (id % 5).toInt
        val h = 6 + (id % 4).toInt
        val nFrames = 2 + (id % 4).toInt
        val pages = (0 until nFrames).map { f =>
          val (r, g, b) = solidColor(id, f)
          ImageIoCodec.solidImage(w, h, r, g, b)
        }
        val tiff = ImageIoCodec.encodeTiffPages(pages)
        ImageIoCodec.frames(MediaRow(id, tiff, 0L), frameBytes = 0, stride = stride)
          .map { fr =>
            val feats = ImageIoCodec.features(MediaRow(id, fr.frame, 0L))
            (id, fr.frame_idx, feats.feat(0).toInt, feats.feat(1).toInt,
              feats.feat(2).toLong, feats.feat(3).toLong, feats.feat(4).toLong)
          }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy("doc_id", "frame_idx")
  }

  /** Seed-mixed procedural 8×8 fixture image for the perceptual-hash
    * family: every pixel derives from the quadratic seed-mix
    * `v = (seed·64 + y·8 + x + 1) mod 16777213` then
    * `hv = (v² + 7919·v) mod 16777213` (prime; v < 16777213 keeps v² well
    * inside int64, so DuckDB — which ERRORS on BIGINT overflow rather than
    * wrapping — replays it exactly), r/g/b = byte slices of hv. The
    * quadratic step is load-bearing: see the inline comment (a linear
    * formula leaves the above/below-mean bits correlated across seeds).
    * Unlike [[ImageIoCodec.patternImage]] (whose
    * per-channel `% 256` makes all seeds congruent mod 256 collide), seeds
    * are injective mod the prime, so distinct doc_ids give distinct images
    * and the ONLY near-dup pairs are the planted ones.
    */
  private[operators] def mixedImage(seed: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // quadratic mixing: a LINEAR per-pixel formula leaves the 64
        // above/below-mean bits correlated across seeds (measured: 543
        // accidental hamming<=3 pairs in a 500-doc corpus); squaring the
        // pre-reduced pixel index decorrelates them (2 accidentals).
        // v < 16777213 keeps v*v < 2.9e14 — far inside BIGINT for the
        // DuckDB replay (which errors on overflow rather than wrapping).
        val v = (seed * 64L + y * 8L + x + 1L) % 16777213L
        val hv = (v * v + v * 7919L) % 16777213L
        val r = (hv % 256L).toInt
        val g = ((hv / 256L) % 256L).toInt
        val b = ((hv / 65536L) % 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** 64-bit AVERAGE-HASH (aHash) over REAL decoded pixels — the standard
    * cheap perceptual image fingerprint (resize-to-8×8 → luminance → bit i
    * set when pixel i is brighter than the image mean). The fixture is
    * already 8×8 ([[mixedImage]]), so the hash IS the canonical aHash with
    * the resample step elided; luminance is the integer ITU-R 601 form
    * `(299r + 587g + 114b) / 1000`, and the mean test is the exact integer
    * cross-multiplication `lum·64 > Σlum` (no division, no float).
    *
    * Dup planting (closed-form, so the DuckDB oracle recomputes the hash
    * WITHOUT decoding — while the engine must really decode the PNG to
    * reproduce it): docs with id % 10 == 0 reuse doc id+5's seed (exact
    * duplicate image); the id % 20 == 0 half additionally whites out pixel
    * (0,0) — a near-duplicate at small hamming distance.
    *
    * Shape at scale: spread partitions + one mapPartitions codec pass
    * (encode/decode is the honest per-row cost of a real image pipeline),
    * output one (id, hash) row per doc.
    */
  def imagePhash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    PartitionUtil.spread(docs.select("doc_id"), "doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val seed = if (id % 10 == 0) id + 5 else id
          val img0 = mixedImage(seed, 8, 8)
          if (id % 20 == 0) img0.setRGB(0, 0, 0xFFFFFF)
          val img = ImageIoCodec.decode(ImageIoCodec.encodePng(img0))
          val lums = new Array[Long](64)
          var s = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val rgb = img.getRGB(x, y)
              val l = (299L * ((rgb >> 16) & 255) + 587L * ((rgb >> 8) & 255) +
                114L * (rgb & 255)) / 1000L
              lums(y * 8 + x) = l
              s += l
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (lums(i) * 64 > s) hash |= (1L << i)
            i += 1
          }
          (id, hash)
        }
      }
      .toDF("doc_id", "phash")
      .orderBy("doc_id")
  }

  /** Perceptual-hash NEAR-DUP pairs: [[imagePhash]] hashes banded into 4
    * 16-bit chunks and equi-joined per chunk (pigeonhole: hamming ≤ 3 ⇒
    * some chunk equal, so recall is EXACT for `maxDist` < 4 while shuffling
    * only chunk-keyed rows — the [[Dedup.simHashPairs]] discipline applied
    * to images; 16-bit bands keep the per-bucket candidate fan-in at
    * |corpus|/65536, where byte-wide bands would collide every ~256 docs).
    * Exact `bit_count(xor)` verification closes the sweep. This is
    * image-level dedup — the multimodal sibling of the text
    * MinHash/SimHash family.
    */
  def phashPairs(spark: SparkSession, docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunks = 4
    require(maxDist < chunks, "pigeonhole recall requires maxDist < chunks")
    val hashed = imagePhash(spark, docs)
    val chunked = hashed.select(col("doc_id"), col("phash"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("phash"), c * 16).bitwiseAND(65535L)): _*))
        .as(Seq("chunk_id", "chunk_val")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Payload-sniffing codec: PNG magic bytes route to the real
    * [[ImageIoCodec]]; anything else (the audio/video stand-in rows) falls
    * back to [[StubCodec]] — the dispatch shape of a production pipeline
    * where one binary column carries several modalities.
    */
  object MixedCodec extends MediaCodec {
    private def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
    private def pick(p: Array[Byte]): MediaCodec =
      if (isPng(p)) ImageIoCodec else StubCodec
    def features(row: MediaRow): MediaFeatures = pick(row.payload).features(row)
    def resize(id: Long, payload: Array[Byte], width: Int, height: Int,
               targetW: Int, targetH: Int): ResizedMedia =
      pick(payload).resize(id, payload, width, height, targetW, targetH)
    def frames(row: MediaRow, frameBytes: Int, stride: Int): Iterator[Frame] =
      pick(row.payload).frames(row, frameBytes, stride)
  }

  /** Capability PROBE for one payload — the honest answer to "why is this
    * row stubbed": ask the JVM's ACTUAL installed-codec registry
    * (`ImageIO.getImageReaders` over the payload's magic bytes) whether any
    * reader claims it. A claimed payload reports `decoded:<format>`; an
    * unclaimed one reports `stubbed:no-installed-codec` — a REASON read
    * from the runtime environment, not a hardcoded label, so dropping a
    * real audio/video `MediaCodec` (or an ImageIO plugin jar) onto the
    * classpath changes the report without touching this code. On the
    * fixtures the probe is closed-form (PNG rows → `decoded:png`, text
    * stand-in rows → `stubbed:no-installed-codec`), so the oracle still
    * checks it exactly.
    */
  def probeStatus(payload: Array[Byte]): String = {
    val is = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(is)
      if (readers.hasNext)
        "decoded:" + readers.next().getFormatName.toLowerCase(java.util.Locale.ROOT)
      else "stubbed:no-installed-codec"
    } finally if (is != null) is.close()
  }

  /** Mixed-modality feature extraction over one binary column: every third
    * doc carries a non-image payload (UTF-8 text bytes standing in for
    * audio/video — no JDK decoder exists) handled by [[StubCodec]]; the rest
    * carry genuine procedural PNGs decoded pixel-by-pixel through
    * [[ImageIoCodec]] via the sniffing [[MixedCodec]]. Image rows report
    * `[width, height, sum_r, sum_g, sum_b]` (closed-form oracle), stub rows
    * `[n_bytes, n_chars, doc_id mod 7]`; every row carries the
    * [[probeStatus]] capability report alongside.
    */
  def mixedFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    PartitionUtil.spread(docs.select("doc_id", "text", "n_chars"), "doc_id")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val payload =
            if (id % 3 == 0) text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            else {
              val w = 8 + (id % 8).toInt
              val h = 8 + (id % 5).toInt
              ImageIoCodec.encodePng(ImageIoCodec.patternImage(id, w, h))
            }
          val f = MixedCodec.features(MediaRow(id, payload, nChars))
          val modality = if (id % 3 == 0) "text" else "image"
          (id, modality, probeStatus(payload), f.feat.map(_.toLong).mkString("|"))
        }
      }
      .toDF("doc_id", "modality", "codec_status", "mm_feat")
      .orderBy("doc_id")
  }

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
  def extractFeatures(spark: SparkSession, docs: DataFrame,
                      codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select("doc_id", "payload", "n_chars")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init happens in the codec's transient lazy state
        rows.map(codec.features)
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("feat").as("mm_feat"))
      .orderBy("doc_id")
  }

  /** Resize via the codec's resampler. The mapPartitions shape (batched,
    * metadata-aware) is what a real image resampler plugs into.
    */
  def resize(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int,
             codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, w, h) =>
          codec.resize(id, payload, w, h, targetW, targetH)
        }
      }
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"))
      .orderBy("doc_id")
  }

  /** Frame sampling via the codec's frame decoder. flatMap shape = one input
    * row fanning out to frames.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   frameBytes: Int = 16, stride: Int = 4,
                   codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select("doc_id", "payload", "n_chars")
      .as[MediaRow]
      .flatMap(row => codec.frames(row, frameBytes, stride))
      .toDF()
      .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("n_bytes"),
        round(col("frame_mean"), 6).as("frame_mean"))
      .orderBy("doc_id", "frame_idx")
  }
}
