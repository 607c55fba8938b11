package graft

import graft.streaming.StreamingMetrics
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Streaming ingestion near-dedup (stream-static band join + Jaccard
  * verify + watermark-bounded pair dedup): arriving documents must be
  * checked against the static corpus without join state, matches must
  * verify above the threshold, and the ≤ 4 per-pair band hits must
  * collapse to one emitted row.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def land(dir: java.nio.file.Path, name: String,
                   rows: Seq[(Long, String, Long)]): Unit = {
    val staging = Files.createTempDirectory("stage")
    rows.toDF("doc_id", "text", "ts_us").coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
  }

  test("arriving near-dups match the static corpus once; novel docs pass through") {
    val baseText = "the quick brown fox jumps over the lazy dog while the " +
      "market microstructure toolkit records order book snapshots at depth"
    val base = Seq((100L, baseText), (101L, "an entirely different corpus document " +
      "about realized variance and order flow imbalance metrics"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("ingest")
    // doc 1: identical to base 100 (Jaccard 1); doc 2: novel text
    land(dir, "b1.parquet", Seq(
      (1L, baseText, 1000000L),
      (2L, "completely novel content sharing no eight-character shingles " +
        "with anything in the existing base corpus whatsoever", 2000000L)))
    val stream = spark.readStream
      .schema(Seq((1L, "a", 1L)).toDF("doc_id", "text", "ts_us").schema)
      .parquet(dir.toString)
    val q = StreamingMetrics.streamNearDedup(stream, base)
      .writeStream.outputMode("append").format("memory").queryName("ingest_dedup").start()
    try {
      q.processAllAvailable()
      // a second micro-batch: another copy of the base doc under a new id
      land(dir, "b2.parquet", Seq((3L, baseText, 3000000L)))
      q.processAllAvailable()
      val out = spark.table("ingest_dedup")
        .select("new_id", "base_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.count(_._1 == 1L) === 1,
        "per-pair band hits must collapse to ONE emitted match")
      assert(out.find(_._1 == 1L).get._2 === 100L)
      assert(out.find(_._1 == 1L).get._3 >= 0.999, "identical text verifies at Jaccard 1")
      assert(!out.exists(_._1 == 2L), "novel doc must not match anything")
      assert(out.count(_._1 == 3L) === 1, "mid-stream batch still matches the base")
    } finally q.stop()
  }

  test("broadcast guard: forcing shuffle joins changes strategy, never values") {
    // round-17 guard (the snmJoinRank pattern): past NdSigBcastMaxDocs /
    // NdTxtBcastMaxDocs the static sides degrade from broadcast to
    // shuffle joins. Same inputs through both plans must emit identical
    // rows — the threshold may pick the JOIN STRATEGY only.
    val baseText = "the quick brown fox jumps over the lazy dog while the " +
      "market microstructure toolkit records order book snapshots at depth"
    val base = Seq((100L, baseText),
      (101L, "an entirely different corpus document about realized " +
        "variance and order flow imbalance metrics")).toDF("doc_id", "text")
    def run(tag: String, sigMax: Long, txtMax: Long): Set[(Long, Long)] = {
      val dir = Files.createTempDirectory(s"ingest-$tag")
      land(dir, "b1.parquet", Seq((1L, baseText, 1000000L),
        (2L, baseText + " with a small suffix change", 2000000L)))
      val stream = spark.readStream
        .schema(Seq((1L, "a", 1L)).toDF("doc_id", "text", "ts_us").schema)
        .parquet(dir.toString)
      val q = StreamingMetrics.streamNearDedup(stream, base,
          sigBcastMaxDocs = sigMax, txtBcastMaxDocs = txtMax)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"ingest_guard_$tag").start()
      try {
        q.processAllAvailable()
        spark.table(s"ingest_guard_$tag").select("new_id", "base_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally { q.stop(); spark.catalog.clearCache() }
    }
    val viaBcast = run("bc", Long.MaxValue, Long.MaxValue)
    val viaShuffle = run("sh", 0L, 0L)
    assert(viaBcast === viaShuffle,
      s"guard sides disagree: broadcast=$viaBcast shuffle=$viaShuffle")
    assert(viaBcast.nonEmpty, "an empty match set proves nothing")
  }

  private def landVecs(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, Seq[Float], Long)]): Unit = {
    val staging = Files.createTempDirectory("stage")
    rows.toDF("vec_id", "embedding", "ts_us").coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
  }

  test("arriving embeddings match the corpus within their cell at cos >= tau") {
    val base = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val cent = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val dir = Files.createTempDirectory("semingest")
    // vec 1 → cell 0, cos≈0.99 vs base 100 → match; vec 2 → cell 1 but
    // cos 0.8 vs base 101 < τ=0.9 → shares the cell, does NOT match
    landVecs(dir, "v1.parquet", Seq(
      (1L, Seq(0.99f, 0.14f), 1000000L),
      (2L, Seq(0.6f, 0.8f), 2000000L)))
    val stream = spark.readStream
      .schema(Seq((1L, Seq(1f), 1L)).toDF("vec_id", "embedding", "ts_us").schema)
      .parquet(dir.toString)
    val q = StreamingMetrics.streamSemanticDedup(stream, base, cent, tau = 0.9)
      .writeStream.outputMode("append").format("memory").queryName("sem_dedup").start()
    try {
      q.processAllAvailable()
      // second micro-batch: an exact copy of base 100
      landVecs(dir, "v2.parquet", Seq((3L, Seq(1f, 0f), 3000000L)))
      q.processAllAvailable()
      val out = spark.table("sem_dedup")
        .select("new_id", "base_id", "cell", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      assert(out.count(_._1 == 1L) === 1, "near-dup matches its cell-mate once")
      val m1 = out.find(_._1 == 1L).get
      assert(m1._2 === 100L && m1._3 === 0 && m1._4 > 0.98)
      assert(!out.exists(_._1 == 2L),
        "same cell but below the cosine threshold must not match")
      assert(out.find(_._1 == 3L).exists(m => m._2 === 100L && m._4 >= 0.999),
        "mid-stream exact copy matches the base")
    } finally q.stop()
  }
}
