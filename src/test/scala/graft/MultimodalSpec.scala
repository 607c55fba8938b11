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

  private def pngBytes(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgbAt(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("real pixel decode: nearest-neighbor resize picks the exact source pixels") {
    // 4x2 source; resize to 2x1 must sample (0,0) and (2,0) per the
    // integer mapping sx = x*srcW/outW, sy = y*srcH/outH
    val colors = Map((0, 0) -> 0xffffff, (1, 0) -> 0x123456, (2, 0) -> 0x000000,
      (3, 0) -> 0xabcdef, (0, 1) -> 0x111111, (1, 1) -> 0x222222,
      (2, 1) -> 0x333333, (3, 1) -> 0x444444)
    val sess = spark; import sess.implicits._
    val ds = Seq(Multimodal.Asset(1L, "image", pngBytes(4, 2, (x, y) => colors((x, y))),
      0, 0, 0)).toDS()
    val f = Multimodal.extractPixelFeatures(ds, outW = 2, outH = 1).collect()(0)
    assert(f.decoded && f.width === 4 && f.height === 2)
    // white -> luma 255 (bin 15); black -> luma 0 (bin 0); mean = 127.5
    assert(f.mean_luma === 127.5)
    assert(f.luma_hist.toSeq === (Seq(1L) ++ Seq.fill(14)(0L) ++ Seq(1L)))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(Array[Byte](-1, -1, -1, 0, 0, 0)).map("%02x".format(_)).mkString
    assert(f.resized_fp === md)
  }

  test("pixel features are deterministic; non-images degrade cleanly") {
    val sess = spark; import sess.implicits._
    val ds = Seq(
      Multimodal.Asset(1L, "image", pngBytes(37, 21, (x, y) => (x * 31 + y * 17) & 0xffffff), 0, 0, 0),
      Multimodal.Asset(2L, "image", "plain text".getBytes("UTF-8"), 99, 88, 0)
    ).toDS()
    val a = Multimodal.extractPixelFeatures(ds).collect().map(f => f.asset_id -> f).toMap
    val b = Multimodal.extractPixelFeatures(ds).collect().map(f => f.asset_id -> f).toMap
    assert(a(1L).decoded && a(1L).out_w === 8 && a(1L).luma_hist.sum === 64L)
    assert(a(1L).resized_fp === b(1L).resized_fp && a(1L).mean_luma === b(1L).mean_luma)
    assert(!a(2L).decoded && a(2L).width === 99 && a(2L).height === 88 && a(2L).resized_fp === "")
  }

  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def animatedGifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("real GIF frame extraction: count, stride, dimensions and per-frame luma") {
    def solid(rgb: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, 16, 12); g.dispose()
      im
    }
    // black/white survive GIF palettization exactly -> luma 0 / 255
    val gif = animatedGifBytes(Seq.tabulate(5)(i => solid(if (i % 2 == 0) 0x000000 else 0xffffff)))
    val sess = spark; import sess.implicits._
    val ds = Seq(
      Multimodal.Asset(7L, "video", gif, 0, 0, 0),
      Multimodal.Asset(8L, "video", "not a container".getBytes("UTF-8"), 0, 0, 0)
    ).toDS()
    val all = Multimodal.sampleVideoFrames(ds).collect().sortBy(f => (f.asset_id, f.frame_no))
    assert(all.forall(_.asset_id === 7L), "unrecognized payloads emit no rows")
    assert(all.map(_.frame_no).toSeq === Seq(0, 1, 2, 3, 4))
    assert(all.forall(f => f.width === 16 && f.height === 12))
    assert(all.map(_.mean_luma).toSeq === Seq(0.0, 255.0, 0.0, 255.0, 0.0))
    assert(all.map(_.frame_fp).distinct.length === 2)
    val strided = Multimodal.sampleVideoFrames(ds, stride = 2).collect()
    assert(strided.map(_.frame_no).sorted.toSeq === Seq(0, 2, 4))
  }

  test("real WAV decode: format, frame count, duration and exact RMS") {
    // constant-magnitude square wave at +/-1000 -> RMS is exactly 1000
    val square = Array.tabulate(8000)(i => if (i % 2 == 0) 1000.toShort else (-1000).toShort)
    val sess = spark; import sess.implicits._
    val ds = Seq(
      Multimodal.Asset(1L, "audio", wavBytes(16000, square), 0, 0, 0),
      Multimodal.Asset(2L, "audio", "not audio".getBytes("UTF-8"), 0, 0, 44100)
    ).toDS()
    val m = Multimodal.extractAudioMeta(ds).collect().map(x => x.asset_id -> x).toMap
    val wav = m(1L)
    assert(wav.decoded && wav.sample_rate === 16000 && wav.channels === 1 && wav.bits === 16)
    assert(wav.n_frames === 8000L)
    assert(wav.duration_s === 0.5)
    assert(wav.rms === 1000.0)
    val bad = m(2L)
    assert(!bad.decoded && bad.sample_rate === 44100 && bad.rms === 0.0)
  }
}
