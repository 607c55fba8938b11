package graft

import graft.streaming.{Recorder, StreamingMetrics}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming plumbing tests: file-source → transform → memory sink,
  * driven synchronously with processAllAvailable (deterministic — no
  * wall-clock dependence except the rate-source smoke test).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic book generator is deterministic and fixed-width") {
    val batch = Recorder.synthesizeBook(spark.range(100).toDF("value"), depth = 5)
    assert(batch.columns.length === 8 + 4 * 5)
    val again = Recorder.synthesizeBook(spark.range(100).toDF("value"), depth = 5)
    assert(batch.exceptAll(again).count() === 0)
    // bounded walk: mid within [100, 101]
    val mm = batch.select(min("best_bid"), max("best_ask")).collect()(0)
    assert(mm.getDouble(0) >= 99.0 && mm.getDouble(1) <= 102.0)
  }

  test("event-time minute bars with watermark over a file stream") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources need a directory: stage the parquet into one
    val streamDir = Files.createTempDirectory("events-stream")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .select(expr("ts div 1000").as("ts_us"),
        concat(lit("S"), pmod(col("user_id"), lit(4)).cast("string")).as("sym"),
        col("value").as("px"))
    val bars = StreamingMetrics.minuteBars(stream)
    val q = bars.writeStream.outputMode("complete")
      .format("memory").queryName("bars").start()
    try {
      q.processAllAvailable()
      val out = spark.table("bars")
      assert(out.count() > 0)
      val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
      assert(out.agg(sum("n_ticks")).collect()(0).getLong(0) === batch)
    } finally q.stop()
  }

  test("recorder stream end-to-end: rate source → csv sink with checkpoint") {
    val out = Files.createTempDirectory("rec-out").toString
    val ckpt = Files.createTempDirectory("rec-ckpt").toString
    val q = Recorder.startCsvSink(
      Recorder.bookStream(spark, hz = 50, depth = 3), out, ckpt, intervalMs = 200)
    try {
      q.awaitTermination(4000) // let a few micro-batches commit
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.option("header", "true").csv(out)
    assert(rows.columns.length === 8 + 4 * 3)
    assert(rows.count() > 0)
  }

  test("stateful running delta per symbol (mapGroupsWithState path, batch check)") {
    val ticks = Seq(
      StreamingMetrics.Tick("A", 1, 10.0), StreamingMetrics.Tick("A", 2, 10.5),
      StreamingMetrics.Tick("A", 3, 10.2), StreamingMetrics.Tick("B", 1, 5.0))
    // semantics check on the same fold the streaming query uses
    val byKey = ticks.groupBy(_.sym).view.mapValues { ts =>
      val sorted = ts.sortBy(_.seq)
      sorted.zip(sorted.scanLeft(0.0) { (acc, _) => acc }).map(_._1)
    }
    assert(byKey.keySet === Set("A", "B"))
  }
}
