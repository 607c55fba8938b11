package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder brief): images/audio/video as
  * opaque BINARY payloads plus typed metadata, with decode / feature
  * extraction as batched partition-local transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real.
  * The IMAGE metadata codec is also real: [[decodeImageMeta]] parses
  * width/height/format/bands with the JDK's own `javax.imageio` (PNG,
  * JPEG, GIF, BMP — no external dependency). Pixel-raster, audio and
  * video codecs remain STUBBED ([[decodeStub]] derives deterministic
  * fake features from payload bytes) — swap them for a real codec
  * (JNI/JavaCV) without touching the surrounding plan; the
  * `mapPartitions` boundary is exactly where a vectorized/batched
  * decoder belongs (the Scala analog of a Pandas-UDF `mapInPandas`
  * batch).
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, sample_rate: Int)
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           header_sum: Long, mean_byte: Double, fingerprint: String)

  /** Deterministic fake assets derived from the `documents` table: the
    * payload is the UTF-8 text, metadata modulated by doc_id.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (lit(64) + pmod(col("doc_id"), lit(8)) * 16).cast("int").as("width"),
        (lit(64) + pmod(col("doc_id"), lit(4)) * 16).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0)).as("sample_rate"))
      .as[Asset]
  }

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation would decode pixels/samples here, batch-wise.
    */
  private[multimodal] def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    val header = a.payload.take(16).map(_.toLong & 0xffL).sum
    val mean = if (n == 0) 0.0 else a.payload.map(_.toLong & 0xffL).sum.toDouble / n
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(a.payload).map("%02x".format(_)).mkString
    AssetFeatures(a.asset_id, a.kind, n, header, mean, fp)
  }

  /** Batched partition-local feature extraction: one decoder instance per
    * partition (the expensive init lives outside the per-row loop), rows
    * streamed through it — the shape a vectorized codec needs.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      // real codec: init decoder/context here, once per partition
      it.map(decodeStub)
    }
  }

  /** Decoded image metadata (the REAL codec path). */
  case class ImageMeta(width: Int, height: Int, format: String, channels: Int)

  /** REAL image decode via the JDK's `javax.imageio` (no external
    * dependency): a header-level parse yielding width / height / format
    * name / band count WITHOUT materializing pixel rasters — what a
    * metadata pass over 100 TB of images wants (`getWidth/getHeight`
    * read the image header only). Returns None when no installed reader
    * recognizes the payload (exotic format, corrupt bytes, non-image) —
    * callers degrade to the declared metadata / [[decodeStub]].
    */
  private[multimodal] def decodeImageMeta(payload: Array[Byte]): Option[ImageMeta] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val types = r.getImageTypes(0)
          val bands = if (types.hasNext) types.next().getNumBands else 0
          Some(ImageMeta(r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT), bands))
        } catch {
          case _: java.io.IOException => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  case class AssetMeta(asset_id: Long, kind: String, n_bytes: Long, decoded: Boolean,
                       width: Int, height: Int, format: String, channels: Int)

  /** Batched metadata extraction with the REAL codec on the image path:
    * payloads a JDK reader recognizes yield true decoded dimensions
    * (`decoded = true`); everything else carries the declared metadata
    * through with `decoded = false`. Same partition-local batch shape as
    * [[extractFeatures]].
    */
  def extractImageMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    implicit val enc = Encoders.product[AssetMeta]
    assets.mapPartitions { it =>
      it.map { a =>
        decodeImageMeta(a.payload) match {
          case Some(m) =>
            AssetMeta(a.asset_id, a.kind, a.payload.length.toLong, decoded = true,
              m.width, m.height, m.format, m.channels)
          case None =>
            AssetMeta(a.asset_id, a.kind, a.payload.length.toLong, decoded = false,
              a.width, a.height, "undecoded", 0)
        }
      }
    }
  }

  /** Frame-sampling plumbing for "video" payloads: emits every stride-th
    * 16-byte window as a fake frame (stub), preserving (asset_id, frame_no)
    * ordering. Real impl: demux + decode keyframes batch-wise.
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        (a.asset_id, i, chunk.length, chunk.map(_.toLong & 0xffL).sum)
      }
    }.toDF("asset_id", "frame_no", "frame_bytes", "frame_sum")
  }
}
