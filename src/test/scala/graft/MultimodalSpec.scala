package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val assets = Multimodal.syntheticAssets(spark, "/root/testdata/sf0.001")

  test("asset synthesis: kinds cycle, payload carries the document bytes") {
    val kinds = assets.groupBy("kind").count().collect().map(r => r.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(assets.count() === 500)
  }

  test("feature extraction is deterministic and schema-stable") {
    val f1 = Multimodal.extractFeatures(assets)
    assert(f1.columns.toSeq ===
      Seq("asset_id", "kind", "n_bytes", "header_sum", "mean_byte", "fingerprint"))
    val r = f1.filter(col("asset_id") === 0).collect()(0)
    assert(r.n_bytes > 0 && r.fingerprint.length === 32)
    val f2 = Multimodal.extractFeatures(assets)
    assert(f1.toDF.exceptAll(f2.toDF).count() === 0)
  }

  test("stub features golden-match an independent recomputation") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"), md5(col("text").cast("binary")).as("fp_catalyst"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = Multimodal.extractFeatures(assets)
      .filter(col("asset_id") < 10)
      .collect().map(f => f.asset_id -> f).toMap
    assert(docs.length === 10)
    docs.foreach { case (id, text, fpCatalyst) =>
      val bytes = text.getBytes("UTF-8")
      val f = feats(id)
      assert(f.n_bytes === bytes.length.toLong)
      assert(f.header_sum === bytes.take(16).map(_.toLong & 0xffL).sum)
      assert(math.abs(f.mean_byte -
        bytes.map(_.toLong & 0xffL).sum.toDouble / bytes.length) < 1e-12)
      // fingerprint pinned against BOTH MessageDigest and Catalyst md5 —
      // two independent hash implementations must agree with the stub
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(f.fingerprint === md && f.fingerprint === fpCatalyst)
    }
  }

  test("real image decode: generated PNG/JPEG dimensions come back exact") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    val sess = spark
    import sess.implicits._
    val ds = Seq(
      Multimodal.Asset(1L, "image", imageBytes(37, 21, "png"), 0, 0, 0),
      Multimodal.Asset(2L, "image", imageBytes(64, 48, "jpg"), 0, 0, 0),
      Multimodal.Asset(3L, "image", "not an image".getBytes("UTF-8"), 640, 480, 0)
    ).toDS()
    val metas = Multimodal.extractImageMeta(ds).collect().map(m => m.asset_id -> m).toMap
    val png = metas(1L)
    assert(png.decoded && png.width === 37 && png.height === 21)
    assert(png.format === "png" && png.channels === 3)
    val jpg = metas(2L)
    assert(jpg.decoded && jpg.width === 64 && jpg.height === 48)
    assert(jpg.format.startsWith("jp") && jpg.channels === 3)
    val txt = metas(3L)
    assert(!txt.decoded && txt.width === 640 && txt.height === 480)
    assert(txt.format === "undecoded")
  }

  test("corpus payloads (text bytes) all degrade to undecoded, none crash") {
    val metas = Multimodal.extractImageMeta(assets)
    assert(metas.count() === 500)
    assert(metas.filter(_.decoded).count() === 0)
  }

  test("frame cardinalities: ceil(n_bytes / stride) frames, bytes conserved") {
    val frames = Multimodal.sampleFrames(assets, stride = 64).cache()
    val expect = assets.filter(_.kind == "video").collect()
      .map(a => a.asset_id -> a.payload.length).toMap
    val got = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), sum("frame_bytes").as("bytes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, len) =>
      val (n, bytes) = got(id)
      assert(n === ((len + 63) / 64).toLong, s"asset $id frame count")
      assert(bytes === len.toLong, s"asset $id bytes conserved across frames")
    }
  }

  test("frame sampling emits ordered frames for video assets only") {
    val frames = Multimodal.sampleFrames(assets, stride = 64)
    val perAsset = frames.groupBy("asset_id").agg(count(lit(1)).as("n"),
      max("frame_no").as("mx"))
    val bad = perAsset.filter(col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
    val videoIds = assets.filter(_.kind == "video").count()
    assert(perAsset.count() === videoIds)
  }
}
