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

/** A sampled frame reference (video/audio): offsets are real plumbing,
  * frame decoding is stubbed. */
case class FrameSample(media_id: Long, frame_index: Int, offset_ms: Long,
                       frame_hash: String)

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

  /** REAL image decode via `javax.imageio` (PNG/GIF/BMP/JPEG readers ship
    * in the JDK — no external dependency): a 16-bin luminance histogram of
    * the decoded pixels. Returns None when no registered reader claims the
    * payload, or it is corrupt — callers fall back to [[byteHistogram]],
    * keeping the operator total over arbitrary binary columns. */
  private[ops] def decodeImageHistogram(payload: Array[Byte]): Option[Array[Long]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
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
        Some(hist)
      }
    } catch { case _: Exception => None }

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

  /** Frame sampling: every `everyMs` milliseconds, capped at `maxFrames`
    * per record — the 1→N fan-out is a typed flatMap (generator shape). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   everyMs: Long, maxFrames: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.flatMap { m =>
      val n = math.min(maxFrames, (m.duration_ms / math.max(1L, everyMs)).toInt)
      (0 until n).iterator.map { i =>
        val off = i * everyMs
        // stub "frame decode": hash of (payload slice at offset)
        val sliceStart = (off % math.max(1L, m.payload.length.toLong)).toInt
        val slice = java.util.Arrays.copyOfRange(m.payload, sliceStart,
          math.min(m.payload.length, sliceStart + 64))
        FrameSample(m.media_id, i, off, hashHex(slice))
      }
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
