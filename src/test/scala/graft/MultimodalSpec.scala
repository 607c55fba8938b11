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
