package graft

import graft.streaming.StreamingMetrics
import graft.streaming.StreamingMetrics.{OfiOut, Tick}
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Stateful streaming across micro-batches: the per-key running state
  * must survive batch boundaries (the streaming form of the reference's
  * in-process accumulator, SURVEY §2.9).
  */
class StreamingStateSpec extends SparkTestBase {
  import spark.implicits._

  /** Write one flat parquet file into the watched dir (the file stream
    * source does not recurse into the subdirectories write.parquet makes).
    */
  private def land(dir: java.nio.file.Path, name: String, ticks: Seq[Tick]): Unit = {
    val staging = Files.createTempDirectory("stage")
    ticks.toDF().coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
  }

  test("flatMapGroupsWithState carries per-symbol state across two micro-batches") {
    val dir = Files.createTempDirectory("ticks")
    // batch 1 lands before the stream starts; batch 2 arrives mid-stream
    land(dir, "b1.parquet", Seq(Tick("A", 1, 10.0), Tick("A", 2, 10.5), Tick("B", 1, 5.0)))
    val stream = spark.readStream
      .schema(Seq.empty[Tick].toDF().schema)
      .parquet(dir.toString)
      .as[Tick]
    val q = StreamingMetrics.runningDelta(stream)
      .writeStream.outputMode("append").format("memory").queryName("deltas").start()
    try {
      q.processAllAvailable()
      land(dir, "b2.parquet", Seq(Tick("A", 3, 11.0), Tick("B", 2, 5.5)))
      q.processAllAvailable()
      val out = spark.table("deltas").as[OfiOut].collect()
        .groupBy(_.sym).view.mapValues(_.sortBy(_.seq)).toMap
      // A: deltas 0, +0.5 (batch 1), then +0.5 vs the STATE from batch 1
      assert(out("A").map(_.dPx) === Seq(0.0, 0.5, 0.5))
      assert(out("A").last.cum === 1.0 +- 1e-12)
      // B: +0.5 in batch 2 proves B's state (prev 5.0) survived too
      assert(out("B").map(_.dPx) === Seq(0.0, 0.5))
    } finally q.stop()
  }
}
