package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder brief): images/audio/video as
  * opaque BINARY payloads plus typed metadata, with decode / feature
  * extraction as batched partition-local transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real;
  * the codec itself is STUBBED — this container has no image/audio
  * libraries, so [[decodeStub]] derives deterministic fake features from
  * the payload bytes. Swap `decodeStub` for a real codec (JNI/JavaCV)
  * without touching the surrounding plan; the `mapPartitions` boundary is
  * exactly where a vectorized/batched decoder belongs (the Scala analog
  * of a Pandas-UDF `mapInPandas` batch).
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
