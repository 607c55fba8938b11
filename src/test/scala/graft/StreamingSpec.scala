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
    // column order must equal BookSchema.forDepth (all bids then all asks,
    // _header_for_depth order) so recorded CSVs read back positionally
    assert(batch.columns.toSeq === graft.book.BookSchema.forDepth(5).fieldNames.toSeq)
  }

  test("symbol sanitization strips / and : (record.py:287)") {
    assert(Recorder.sanitizeSymbol("BTC/USDT:USDT") === "BTCUSDTUSDT")
    assert(Recorder.defaultOutPath("bybit", "ETH/USDT:USDT", "swap", "L2", 60, "parquet")
      === "data/bybit_ETHUSDTUSDT_swap_L2_60s.parquet")
    val got = spark.range(1).select(
      Recorder.sanitizeSymbolCol(lit("BTC/USDT:USDT")).as("s")).collect()(0).getString(0)
    assert(got === "BTCUSDTUSDT")
  }

  test("event-time minute bars with watermark over a file stream") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources need a directory: stage the parquet into one
    val streamDir = Files.createTempDirectory("events-stream")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val stream = Tables.normalizeTs(spark.readStream.schema(schema)
      .parquet(streamDir.toString))
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

  test("watermark drops rows later than the lateness bound (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String, Double)]
    val bars = StreamingMetrics.minuteBars(
      src.toDS().toDF("ts_us", "sym", "px"), lateness = "10 minutes")
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("late_bars").start()
    def us(sec: Long) = sec * 1000000L
    try {
      // minute-0 window gets 2 ticks; the 3600 s tick advances the
      // watermark to 50 min, closing and emitting the minute-0 bar
      src.addData((us(0), "S", 1.0), (us(30), "S", 2.0), (us(3600), "S", 3.0))
      q.processAllAvailable()
      // late arrival back in minute 0 — 50 min behind the watermark —
      // must be DROPPED; the 7200 s tick flushes the minute-60 bar
      src.addData((us(10), "S", 99.0), (us(7200), "S", 4.0))
      q.processAllAvailable()
      val out = spark.table("late_bars")
        .select(col("window.start").cast("long").as("w"), col("n_ticks"), col("high"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val minute0 = out.find(_._1 == 0L).get
      assert(minute0._2 === 2L, "late row must not be counted")
      assert(minute0._3 === 2.0, "late px=99 must not appear in the bar")
      assert(out.find(_._1 == 3600L).get._2 === 1L)
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates; state evicts past the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val deduped = StreamingMetrics.dedupStream(
      src.toDS().toDF("ts_us", "text"), lateness = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_docs").start()
    // offset from epoch 0: rows AT the initial watermark would drop as late
    def us(sec: Long) = (1000000L + sec) * 1000000L
    try {
      src.addData((us(0), "hello"), (us(30), "world"))
      q.processAllAvailable()
      // same fingerprint within the horizon → dropped; the 3600 s row
      // advances the watermark to 50 min, evicting the early state
      src.addData((us(60), "hello"), (us(3600), "fresh"))
      q.processAllAvailable()
      // state for "hello" was evicted → re-emitted (bounded-state contract)
      src.addData((us(4000), "hello"))
      q.processAllAvailable()
      val out = spark.table("dedup_docs")
        .select(col("ts_us"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(out.toSeq === Seq(
        (us(0), "hello"), (us(30), "world"), (us(3600), "fresh"), (us(4000), "hello")))
    } finally q.stop()
  }

  test("stream-stream as-of: trades enrich with the latest in-horizon quote") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val trades = MemoryStream[(Long, Long, String, Double)]
    val quotes = MemoryStream[(Long, String, Double, Double)]
    val enriched = StreamingMetrics.asofEnrich(
      trades.toDS().toDF("trade_id", "ts_us", "sym", "trade_px"),
      quotes.toDS().toDF("qts_us", "qsym", "bid", "ask"),
      horizon = "5 seconds", lateness = "10 seconds")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asof_trades").start()
    def us(sec: Long) = sec * 1000000L
    try {
      quotes.addData((us(1), "A", 10.0, 10.1), (us(3), "A", 11.0, 11.1),
        (us(9), "A", 12.0, 12.1))
      // B has no quotes at all -> inner as-of drops its trade. Trades 1
      // and 2 share (ts_us, sym, trade_px) — the unique trade_id must
      // keep them as two rows with per-trade counts, not one pooled row.
      trades.addData((1L, us(4), "A", 10.5), (2L, us(4), "A", 10.5),
        (3L, us(10), "A", 12.2), (4L, us(4), "B", 9.9))
      q.processAllAvailable()
      // advance BOTH watermarks far past 10s so the join emits and the
      // chained per-trade aggregate finalizes
      quotes.addData((us(100), "A", 13.0, 13.1))
      trades.addData((90L, us(100), "Z", 1.0))
      q.processAllAvailable()
      quotes.addData((us(200), "A", 14.0, 14.1))
      trades.addData((91L, us(200), "Z", 1.0))
      q.processAllAvailable()
      val out = spark.table("asof_trades")
        .select("trade_id", "ts_us", "sym", "bid", "ask", "quote_ts_us", "n_quotes_in_horizon")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getDouble(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
        .filter(t => t._2 <= us(10))
      assert(out.toSeq === Seq(
        // trades 1 and 2 @4s: quotes at 1s and 3s are in [−1s, 4s] — latest
        // (3s) wins, and each trade counts its OWN 2 in-horizon quotes
        (1L, us(4), "A", 11.0, 11.1, us(3), 2L),
        (2L, us(4), "A", 11.0, 11.1, us(3), 2L),
        // trade 3 @10s: only the 9s quote falls in [5s, 10s]
        (3L, us(10), "A", 12.0, 12.1, us(9), 1L)))
    } finally q.stop()
  }

  test("stateful running delta per symbol carries state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingMetrics.{Tick, OfiOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamingMetrics.runningDelta(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("rd").start()
    try {
      src.addData(Tick("A", 1, 10.0), Tick("A", 2, 10.5), Tick("B", 1, 5.0))
      q.processAllAvailable()
      // second batch must see batch-1 state (prevPx carried per symbol)
      src.addData(Tick("A", 3, 10.2), Tick("B", 2, 5.5))
      q.processAllAvailable()
      val out = spark.table("rd").as[OfiOut].collect().sortBy(t => (t.sym, t.seq))
      val expect = Seq(
        ("A", 1L, 0.0, 0.0), ("A", 2L, 0.5, 0.5), ("A", 3L, 10.2 - 10.5, 0.5 + (10.2 - 10.5)),
        ("B", 1L, 0.0, 0.0), ("B", 2L, 0.5, 0.5))
      assert(out.length === expect.length)
      out.zip(expect).foreach { case (o, (sym, seq, d, cum)) =>
        assert(o.sym === sym && o.seq === seq)
        assert(math.abs(o.dPx - d) < 1e-12, s"dPx for $sym/$seq")
        assert(math.abs(o.cum - cum) < 1e-12, s"cum for $sym/$seq")
      }
    } finally q.stop()
  }
}
