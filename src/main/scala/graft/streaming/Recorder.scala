package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming analog of the reference's recorders (SURVEY.md
  * §2.1 S2-S5, §2.9, `record.py:144-202` / `ws_record.py`):
  *
  *   - fixed-Hz pacing        → `rate` source at rowsPerSecond = hz
  *   - queue + writer task    → streaming runtime + file/memory sink
  *   - "no drops" backpressure→ checkpointed exactly-once sink
  *   - sentinel shutdown      → `query.stop()`
  *   - under-rate QoS warning → [[achievedRate]] over query progress
  *
  * The environment has no network, so the venue is a deterministic
  * synthetic book generator: a pure function of the rate-source counter
  * (same contract as the reference's monkeypatched fake exchange in
  * `tests/test_record.py:42-60`).
  */
object Recorder {

  /** Deterministic book-row transform, usable on the `rate` stream or on
    * `spark.range(n)` for batch fixtures: a bounded pseudo random walk
    * with occasional missing levels.
    */
  def synthesizeBook(counter: DataFrame, depth: Int, counterCol: String = "value"): DataFrame = {
    val v = col(counterCol)
    // triangle-wave walk keeps prices bounded and fully deterministic
    val phase = pmod(v, lit(200L))
    val walk = when(phase < 100, phase).otherwise(lit(200L) - phase).cast("double")
    val mid = lit(100.0) + walk * lit(0.01)
    val base = counter
      .withColumn("ts_ms", lit(1700000000000L) + v * lit(100L))
      .withColumn("iso", date_format(timestamp_millis(col("ts_ms")),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"))
      .withColumn("exchange_id", lit("synthetic"))
      .withColumn("symbol", concat(lit("SYN"), pmod(v, lit(2L)).cast("string")))
      .withColumn("book_level", lit("L2"))
      .withColumn("raw_nonce", v)
      .withColumn("best_bid", mid - lit(0.01))
      .withColumn("best_ask", mid + lit(0.01))
    // all bid levels then all ask levels — the `_header_for_depth` order
    // (record.py:46-52), so a written CSV reads back via BookSchema.forDepth
    // (positional explicit schema) without level scrambling
    val bidLevels = (1 to depth).flatMap { k =>
      Seq(
        s"bid${k}_price" -> when(pmod(v + k, lit(31L)) === 0, lit(null).cast("double"))
          .otherwise(col("best_bid") - lit(0.01) * (k - 1)),
        s"bid${k}_size" -> (lit(1) + pmod(v + k, lit(5L))).cast("double"))
    }
    val askLevels = (1 to depth).flatMap { k =>
      Seq(
        s"ask${k}_price" -> when(pmod(v + 2L * k, lit(37L)) === 0, lit(null).cast("double"))
          .otherwise(col("best_ask") + lit(0.01) * (k - 1)),
        s"ask${k}_size" -> (lit(1) + pmod(v + 2L * k, lit(7L))).cast("double"))
    }
    val meta = Seq("ts_ms", "iso", "exchange_id", "symbol", "book_level", "raw_nonce",
      "best_bid", "best_ask").map(col)
    base.select(meta ++ (bidLevels ++ askLevels).map { case (n, c) => c.as(n) }: _*)
  }

  /** P17 symbol sanitization (`record.py:287`): strip the `/` and `:`
    * that venue symbols like `BTC/USDT:USDT` carry before they land in a
    * file name.
    */
  def sanitizeSymbol(symbol: String): String =
    symbol.replace("/", "").replace(":", "")

  /** Column flavor of [[sanitizeSymbol]] for distributed use. */
  def sanitizeSymbolCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "[/:]", "")

  /** Default recording path, mirroring the reference's
    * `data/{exchange}_{sym}_{market}_{level}_{seconds}s.{fmt}` scheme
    * (`record.py:288`).
    */
  def defaultOutPath(exchange: String, symbol: String, marketType: String,
                     bookLevel: String, seconds: Int, format: String): String =
    s"data/${exchange}_${sanitizeSymbol(symbol)}_${marketType}_${bookLevel}_${seconds}s.$format"

  /** Fixed-Hz recorder stream (S2): rate source → synthetic book rows. */
  def bookStream(spark: SparkSession, hz: Int, depth: Int): DataFrame =
    synthesizeBook(
      spark.readStream.format("rate").option("rowsPerSecond", hz.toString).load(),
      depth)

  /** S5 writer: append sink with checkpoint (exactly-once replaces the
    * reference's "no drops" queue discipline).
    */
  def startCsvSink(book: DataFrame, outDir: String, checkpoint: String,
                   intervalMs: Long = 1000): StreamingQuery =
    book.writeStream
      .format("csv")
      .option("header", "true")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()

  /** QoS: achieved rows/sec across a query's progress history
    * (`ws_record.py:266-279` warns < 90 % of target).
    */
  def achievedRate(q: StreamingQuery): Double = {
    val p = q.recentProgress
    if (p.isEmpty) 0.0
    else {
      val rows = p.map(_.numInputRows).sum.toDouble
      val secs = p.map(x => x.batchDuration).sum / 1000.0
      if (secs <= 0) 0.0 else rows / secs
    }
  }
}
