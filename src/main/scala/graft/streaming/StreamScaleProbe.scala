package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-at-scale receipt — the round-14 advice item: the stateful
  * twins are spec-proven at toy cardinality; this main replays a
  * ~million-row file stream through two of them and records the
  * operational numbers a fleet operator actually watches
  * (StreamingQueryProgress): per-trigger wall, input rows/sec, and
  * state-store row/byte ceilings.
  *
  * Legs:
  *   - `neardedup` — [[StreamingMetrics.streamNearDedup]]: stream-static
  *     band join against the sf0.1 base corpus signatures + exact
  *     verify + `dropDuplicatesWithinWatermark`. State = the emitted
  *     pair horizon only (watermark-bounded), never the corpus.
  *   - `kmv` — [[StreamingMetrics.streamKmvSketch]]: per-source KMV
  *     distinct sketch via `flatMapGroupsWithState`; state = K mins per
  *     source, O(sources·K) regardless of stream length.
  *
  * Usage (direct JVM or sbt):
  *   tools/run_main.sh graft.streaming.StreamScaleProbe \
  *     <scaleDocsDir> <baseSfDir> [nRows=1000000] [filesPerTrigger=8]
  * Prints one JSON line per leg. The replay dir is derived
  * deterministically from the corpus (doc_id < nRows, 1 ms event-time
  * spacing, 32 files) and reused if present.
  */
object StreamScaleProbe {

  private case class LegStats(rows: Long, triggers: Int, wallSec: Double,
                              maxBatchMs: Long, stateRowsMax: Long,
                              stateBytesMax: Long, outRows: Long)

  private def drain(q: StreamingQuery, t0: Long,
                    outCount: => Long): LegStats = {
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    val state = progs.flatMap(_.stateOperators)
    val out = outCount
    q.stop()
    LegStats(
      rows = progs.map(_.numInputRows).sum,
      triggers = progs.length,
      wallSec = wall,
      maxBatchMs = progs.map(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue)
          .getOrElse(0L)).foldLeft(0L)(math.max),
      stateRowsMax = state.map(_.numRowsTotal).foldLeft(0L)(math.max),
      stateBytesMax = state.map(_.memoryUsedBytes).foldLeft(0L)(math.max),
      outRows = out)
  }

  private def json(leg: String, n: Long, s: LegStats): String =
    f"""{"probe":"stream_scale","leg":"$leg","n_requested":$n,""" +
      f""""rows":${s.rows},"triggers":${s.triggers},""" +
      f""""wall_sec":${s.wallSec}%.1f,""" +
      f""""rows_per_sec":${s.rows / math.max(s.wallSec, 1e-9)}%.0f,""" +
      f""""max_trigger_ms":${s.maxBatchMs},""" +
      f""""state_rows_max":${s.stateRowsMax},""" +
      f""""state_bytes_max":${s.stateBytesMax},"out_rows":${s.outRows}}"""

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StreamScaleProbe <scaleDocsDir> <baseSfDir> [nRows] [filesPerTrigger]")
    val scaleDir = args(0)
    val baseDir = args(1)
    val nRows = if (args.length > 2) args(2).toLong else 1000000L
    val fpt = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)

    // deterministic replay dir: nRows docs, 1 ms event-time spacing,
    // 32 files => ceil(32/fpt) triggers
    val replay = new java.io.File(s"target/stream_replay_$nRows").getAbsolutePath
    if (!new java.io.File(s"$replay/_SUCCESS").exists()) {
      spark.read.parquet(s"$scaleDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
        .filter(col("doc_id") < nRows)
        .withColumn("ts_us", col("doc_id") * 1000L)
        .repartition(32)
        .write.mode("overwrite").parquet(replay)
    }
    val schema = spark.read.parquet(replay).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", fpt).parquet(replay)
    def ckpt(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"ssp-$tag")
      d.toString
    }

    // leg 1: ingestion near-dedup against the static base corpus
    val base = graft.Tables(spark, baseDir, "documents")
      .select(col("doc_id"), col("text"))
    val t1 = System.nanoTime()
    val q1 = StreamingMetrics.streamNearDedup(
        stream().select(col("doc_id"), col("text"), col("ts_us")), base)
      .writeStream.outputMode("append").format("memory")
      .queryName("ssp_neardedup").option("checkpointLocation", ckpt("nd"))
      .start()
    println(json("neardedup", nRows,
      drain(q1, t1, spark.table("ssp_neardedup").count())))

    // leg 2: per-source KMV distinct sketch (48-bit doc fingerprints)
    import spark.implicits._
    val t2 = System.nanoTime()
    val kmvIn = stream()
      .select(col("source"),
        expr("conv(substr(md5(CAST(text AS BINARY)), 1, 12), 16, 10)")
          .cast("long").as("h"))
      .as[StreamingMetrics.KmvRow]
    val q2 = StreamingMetrics.streamKmvSketch(kmvIn)
      .writeStream.outputMode("append").format("memory")
      .queryName("ssp_kmv").option("checkpointLocation", ckpt("kmv"))
      .start()
    println(json("kmv", nRows, drain(q2, t2, spark.table("ssp_kmv").count())))

    spark.stop()
  }
}
