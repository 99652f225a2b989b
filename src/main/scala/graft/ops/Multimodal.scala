package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata —
  * the schema discipline for image/audio/video columns at scale. */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                       width: Int, height: Int, duration_ms: Long)

/** Deterministic per-payload features; `decoder` records which decode path
  * ran ("image" = real javax.imageio decode, "bytes" = raw-byte fallback). */
case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                         histogram: Seq[Long], payload_hash: String,
                         decoder: String)

/** A sampled frame: `decoder` = "frames" when the payload REALLY decoded
  * into per-frame pixels (animated GIF / any multi-page format imageio
  * reads — no external dependency), "bytes" for the documented fallback
  * (true video: no codec library ships in this environment). Decoded
  * frames carry the luminance-histogram pixel count (`hist_sum` = w×h)
  * and the dominant luminance bin (`top_bin`, 0-15); fallback rows carry
  * hist_sum = slice length and top_bin = -1. */
case class FrameSample(media_id: Long, frame_index: Int, offset_ms: Long,
                       frame_hash: String, decoder: String, hist_sum: Long,
                       top_bin: Int)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Design: media travels as an opaque `binary` column + typed metadata
  * struct; all heavy per-record work runs in `mapPartitions` over a typed
  * Dataset so batches stream through executors without row-by-row
  * serialization overhead, and the decode library (not present in this
  * environment) is isolated behind [[decodeStub]]. The Spark-side shape —
  * schema, partitioning, batch iteration, feature/frame fan-out — is real
  * and tested; swap [[decodeStub]] for an actual codec to productionize.
  */
object Multimodal extends Serializable {

  /** Raw-byte fallback features: a 16-bin byte histogram — used for
    * payloads no available codec decodes (audio/video here; a production
    * stack would register codecs the same way imageio registers readers). */
  private[ops] def byteHistogram(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
    hist
  }

  /** 16-bin luminance histogram of a decoded image's pixels. */
  private def lumHistogram(img: java.awt.image.BufferedImage): Array[Long] = {
    val hist = new Array[Long](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1
        x += 1
      }
      y += 1
    }
    hist
  }

  /** REAL image decode via `javax.imageio` (PNG/GIF/BMP/JPEG readers ship
    * in the JDK — no external dependency): a 16-bin luminance histogram of
    * the decoded pixels. Returns None when no registered reader claims the
    * payload, or it is corrupt — callers fall back to [[byteHistogram]],
    * keeping the operator total over arbitrary binary columns. */
  private[ops] def decodeImageHistogram(payload: Array[Byte]): Option[Array[Long]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(lumHistogram(img))
    } catch { case _: Exception => None }

  /** REAL multi-frame decode: every frame/page of the payload (animated
    * GIF, multi-page TIFF-style formats — whatever a registered imageio
    * reader claims) as per-frame luminance histograms. `read(i)` returns
    * each RAW frame (no animation compositing — the per-frame content
    * discipline). None when no reader claims the payload or it is corrupt
    * — callers take the byte-slice fallback, keeping [[sampleFrames]]
    * total over arbitrary binary columns (true video stays a fallback:
    * no video codec library ships in this environment). */
  private[ops] def decodeFrameHistograms(payload: Array[Byte]): Option[IndexedSeq[Array[Long]]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map(i => lumHistogram(r.read(i))))
        } finally { r.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** Deterministic multi-frame (animated) GIF encoder via the JDK's own
    * imageio sequence writer — used to synthesize REAL decodable
    * multi-frame payloads with no external data or codec dependency. */
  private[ops] def encodeAnimatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def hashHex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Synthesize a deterministic media table from any (id, text) table —
    * text bytes stand in for encoded media payloads. */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(col(idCol).cast("long"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col(idCol).cast("long"), lit(48)) * 16 + 64).cast("int").as("height"),
      (length(col(textCol)).cast("long") * 10).as("duration_ms"))

  /** Feature extraction: streams each partition through the decoder — the
    * `mapPartitions` boundary is where a Pandas-UDF-style batch decode
    * would sit on a Python stack. Images decode for real (imageio); other
    * payloads take the byte-histogram fallback. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val decoded = if (m.kind == "image") decodeImageHistogram(m.payload) else None
      val (hist, dec) = decoded match {
        case Some(h) => (h, "image")
        case None => (byteHistogram(m.payload), "bytes")
      }
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
        hist.toSeq, hashHex(m.payload), dec)
    })
  }

  /** Frame sampling, capped at `maxFrames` per record — the 1→N fan-out
    * is a typed flatMap (generator shape). Payloads a registered imageio
    * reader claims decode for REAL: one row per decoded frame (luminance
    * histogram → frame_hash/hist_sum/top_bin, decoder="frames").
    * Everything else — true video/audio, no codec in this environment —
    * takes the documented byte-slice fallback every `everyMs` ms
    * (decoder="bytes"). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   everyMs: Long, maxFrames: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.flatMap { m =>
      decodeFrameHistograms(m.payload) match {
        case Some(frames) =>
          frames.take(maxFrames).iterator.zipWithIndex.map { case (hist, i) =>
            var top = 0
            var j = 1
            while (j < hist.length) { if (hist(j) > hist(top)) top = j; j += 1 }
            FrameSample(m.media_id, i, i * everyMs,
              hashHex(hist.map(_.toString).mkString(",").getBytes("UTF-8")),
              "frames", hist.sum, top)
          }
        case None =>
          val n = math.min(maxFrames, (m.duration_ms / math.max(1L, everyMs)).toInt)
          (0 until n).iterator.map { i =>
            val off = i * everyMs
            // fallback "frame decode": hash of (payload slice at offset)
            val sliceStart = (off % math.max(1L, m.payload.length.toLong)).toInt
            val slice = java.util.Arrays.copyOfRange(m.payload, sliceStart,
              math.min(m.payload.length, sliceStart + 64))
            FrameSample(m.media_id, i, off, hashHex(slice), "bytes",
              slice.length.toLong, -1)
          }
      }
    }
  }

  /** Deterministic animated-GIF media table from any id column: row `i`
    * gets `(i % 5) + 1` uniform-gray 8×8 frames, frame `f` filled with
    * gray `(i*31 + f*8) % 256` — so the DECODED per-frame dominant
    * luminance bin is `((i*31 + f*8) % 256) / 16`, an expression an ANSI
    * SQL oracle recomputes independently (a true end-to-end decode check,
    * not a staged hash). duration_ms is deliberately `nFrames × everyMs ×
    * 3`-shaped so a silent regression to the duration-based fallback
    * produces a DIFFERENT frame count and fails the oracle. */
  def synthesizeGifs(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val n = (math.floorMod(id, 5L) + 1L).toInt
      val frames = (0 until n).map { f =>
        val g = math.floorMod(id * 31 + f * 8, 256L).toInt
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        img
      }
      MediaRecord(id, "gif_anim", encodeAnimatedGif(frames), 8, 8, n * 1500L)
    }
  }

  /** "Resize" stub: real systems re-encode the payload; the plumbing here
    * rescales metadata and truncates the payload proportionally so
    * downstream schema/size accounting is exercised. */
  def resize(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    media.withColumn("scale", scale)
      .withColumn("payload", expr(
        "substring(payload, 1, greatest(1, cast(length(payload) * scale * scale as int)))"))
      .withColumn("width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("height", ceil(col("height") * col("scale")).cast("int"))
      .drop("scale")
  }
}
