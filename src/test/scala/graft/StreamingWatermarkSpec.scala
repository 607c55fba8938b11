package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamingMetrics
import scala.jdk.CollectionConverters._

/** Round-14 watermark extensions (advice items 6 + 8):
  *
  *   - `streamOhlcBarsWatermarked(flushTimeoutMs)`: a stream that ENDS
  *     mid-bar must still emit the open bars — via a processing-time
  *     timeout flush flagged `isFinalOnTimeout` — with the randomized-cut
  *     determinism pin intact (flushed VALUES are cut-invariant).
  *   - `streamVpinWatermarked`: data-defined lateness horizon + reorder
  *     buffer + drop audit over the sequential VPIN fold; batch-equality
  *     vs q181 and cut-invariance.
  *   - `streamLinkageWatermarked`: final-once per-key emission on horizon
  *     pass + drop audit; per-key values equal batch q169.
  *
  * Harness note: `processAllAvailable` CANNOT be used once a
  * processing-time timeout is armed — the stateful operator reports
  * "should run another batch" unconditionally, so the stream runs
  * no-data batches forever and the no-new-data latch that
  * processAllAvailable waits on never sets. Instead every batch slice is
  * landed upfront as `bNN.parquet` and the source reads
  * `maxFilesPerTrigger=1`: one file per micro-batch, in (mtime, path)
  * order, so the slices still ARE the micro-batch cuts; the memory sink
  * is then polled for the expected row count.
  */
class StreamingWatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def landDf(dir: java.nio.file.Path, name: String,
                     df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = Files.createTempDirectory("stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
    ()
  }

  /** Land every slice upfront; see the class doc. */
  private def landAll(dir: java.nio.file.Path,
                      parts: Seq[org.apache.spark.sql.DataFrame]): Unit =
    parts.zipWithIndex.foreach { case (p, i) =>
      landDf(dir, f"b${i + 1}%02d.parquet", p)
    }

  private def seededCuts(n: Int, seed: Long): Seq[Int] = {
    val rnd = new scala.util.Random(seed)
    val k = 3 + rnd.nextInt(6)
    Seq.fill(k - 1)(1 + rnd.nextInt(math.max(n - 1, 1))).distinct.sorted
  }

  private def slices[T](all: Seq[T], cuts: Seq[Int]): Seq[Seq[T]] = {
    val bounds = (0 +: cuts.filter(c => c > 0 && c < all.size).distinct.sorted) :+ all.size
    bounds.sliding(2).collect { case Seq(a, b) if b > a => all.slice(a, b) }.toSeq
  }

  /** Poll the memory sink until `enough` rows or the deadline, then let
    * the sink settle so late extras (a double-emission bug) still land
    * before the caller collects.
    */
  private def await(qname: String, enough: Long, deadlineSec: Int = 120): Unit = {
    val deadline = System.nanoTime() + deadlineSec * 1e9.toLong
    while (spark.table(qname).count() < enough && System.nanoTime() < deadline)
      Thread.sleep(250)
    Thread.sleep(1500)
  }

  // ------------------------------------------------------------- OHLC

  test("watermarked OHLC: timeout flush emits still-open bars at stream end, cut-invariant") {
    import StreamingMetrics.{WmBarOut, WmTick}
    // the wmohlc feed WITHOUT its flush heartbeats (barUs=100,
    // lateness=150). At stream end: A bar0 finalized normally (maxTs 260
    // passed 100+150), A seq5 dropped; A bar1, A bar2, B bar0 still open.
    val all = Seq(
      WmTick("A", 1L, 10L, 1.0, 2L), WmTick("A", 2L, 110L, 2.0, 3L),
      WmTick("A", 3L, 50L, 3.0, 1L), WmTick("A", 4L, 260L, 4.0, 2L),
      WmTick("A", 5L, 60L, 5.0, 9L), WmTick("A", 6L, 120L, 6.0, 1L),
      WmTick("B", 1L, 10L, 1.5, 1L))

    def run(cuts: Seq[Int], qname: String): Set[WmBarOut] = {
      val dir = Files.createTempDirectory("wmflush")
      landAll(dir, slices(all, cuts).map(_.toDF()))
      val stream = spark.readStream.schema(Seq.empty[WmTick].toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[WmTick]
      val q = StreamingMetrics
        .streamOhlcBarsWatermarked(stream, barUs = 100L, latenessUs = 150L,
          flushTimeoutMs = 4000L)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        // normal rows: A bar0 final + A seq5 drop; flush: A bar1, A bar2, B bar0
        await(qname, enough = 5L)
        spark.table(qname).as[WmBarOut].collect().toSet
      } finally q.stop()
    }

    val a = run(Seq(3), "wmfl_a")
    val b = run(seededCuts(all.size, 0x14AL), "wmfl_b")
    assert(a === b, "timeout-flushed row sets diverged across cuts")

    val flushed = a.filter(_.isFinalOnTimeout)
    assert(flushed.map(o => (o.sym, o.bar)) === Set(("A", 1L), ("A", 2L), ("B", 0L)),
      s"open bars at stream end must flush, got $flushed")
    // flushed bar values are the open-bar state: A bar1 = seq2 + seq6
    val a1 = flushed.find(o => o.sym == "A" && o.bar == 1L).get
    assert((a1.open, a1.close, a1.nTicks, a1.l1Volume, a1.nLateAccepted) ===
      (2.0, 6.0, 2L, 4L, 1L))
    // normal (non-flush) emission unchanged: A bar0 finalized + seq5 drop
    val normal = a.filterNot(_.isFinalOnTimeout)
    assert(normal.filter(_.isDrop).map(d => (d.sym, d.bar, d.dropSeq)) ===
      Set(("A", 0L, Some(5L))))
    assert(normal.filterNot(_.isDrop).map(o => (o.sym, o.bar)) === Set(("A", 0L)))
  }

  // ------------------------------------------------------------- VPIN

  test("watermarked VPIN: in-order feed + timeout flush reconstructs batch q181 exactly") {
    import StreamingMetrics.{WmVpinOut, WmVpinTick}
    // q181's tick derivation with tsUs := seq (an in-order event-time
    // feed; lateness 0 accepts everything under the strict rules)
    val all = graft.book.SyntheticBook
      .fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull)
      .select(col("sym"), col("seq"), col("seq").as("tsUs"), col("mid"),
        (coalesce(col("bid1_size"), lit(0.0)) + coalesce(col("ask1_size"), lit(0.0)))
          .cast("long").as("vol"))
      .as[WmVpinTick].collect().toSeq.sortBy(_.seq)

    val batch = SparkEntry.queries("q181_vpin_toxicity")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("bucket")) ->
      (r.getAs[Long]("buy_vol"), r.getAs[Long]("sell_vol"), r.getAs[Long]("imbalance"),
        r.getAs[Long]("bucket_vol"),
        Option(r.getAs[java.lang.Long]("vpin_permille")).map(_.toLong))).toMap
    batch.unpersist()

    def run(cuts: Seq[Int], qname: String): Map[(String, Long), WmVpinOut] = {
      val dir = Files.createTempDirectory("wmvpin")
      landAll(dir, slices(all, cuts).map(_.toDF()))
      val stream = spark.readStream.schema(Seq.empty[WmVpinTick].toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[WmVpinTick]
      val q = StreamingMetrics
        .streamVpinWatermarked(stream, latenessUs = 0L, flushTimeoutMs = 4000L)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        await(qname, enough = expect.size.toLong)
        val rows = spark.table(qname).as[WmVpinOut].collect()
        assert(!rows.exists(_.isDrop), "nothing may drop on an in-order feed")
        // every bucket emits exactly once (normal finalize or timeout flush)
        val byKey = rows.groupBy(o => (o.sym, o.bucket))
        byKey.foreach { case (k, rs) => assert(rs.length === 1, s"$k emitted ${rs.length}x") }
        byKey.view.mapValues(_.head).toMap
      } finally q.stop()
    }

    val a = run(Seq(all.size / 2), "wmvp_a")
    def view(m: Map[(String, Long), WmVpinOut]) = m.view.mapValues(o =>
      (o.buyVol, o.sellVol, o.imbalance, o.bucketVol, o.vpinPermille)).toMap
    assert(view(a) === expect, "watermarked VPIN diverged from batch q181")

    val c = run(seededCuts(all.size, 0x181BL), "wmvp_c")
    assert(view(c) === expect, "randomized cut diverged from batch q181")
  }

  test("watermarked VPIN: late tick beyond the horizon drops with an audit row") {
    import StreamingMetrics.{WmVpinOut, WmVpinTick}
    // v=256 default; ticks of vol 300 each fill a bucket. seq4 arrives
    // with event time 40 when maxTs is 500: 40+100 < 500 -> DROP audit.
    // seq5 (ts 450): 450+100 >= 500 -> accepted (inside the horizon).
    val all = Seq(
      WmVpinTick("A", 1L, 100L, 10.0, 300L),
      WmVpinTick("A", 2L, 200L, 11.0, 300L),
      WmVpinTick("A", 3L, 500L, 10.5, 300L),
      WmVpinTick("A", 4L, 40L, 12.0, 300L),
      WmVpinTick("A", 5L, 450L, 10.7, 300L))

    def run(cuts: Seq[Int], qname: String): Set[(Long, Long, Long, Boolean, Option[Long], Boolean)] = {
      val dir = Files.createTempDirectory("wmvpd")
      landAll(dir, slices(all, cuts).map(_.toDF()))
      val stream = spark.readStream.schema(Seq.empty[WmVpinTick].toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[WmVpinTick]
      val q = StreamingMetrics
        .streamVpinWatermarked(stream, latenessUs = 100L, flushTimeoutMs = 4000L)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        await(qname, enough = 5L) // 1 drop + 4 bucket rows
        spark.table(qname).as[WmVpinOut].collect().toSet
          .map((o: WmVpinOut) => (o.bucket, o.buyVol, o.sellVol, o.isDrop, o.dropSeq,
            o.isFinalOnTimeout))
      } finally q.stop()
    }

    val a = run(Seq(3), "wmvpd_a")
    val b = run(seededCuts(all.size, 0x99L), "wmvpd_b")
    assert(a === b, "drop-audit row sets diverged across cuts")
    assert(a.count(_._4) === 1, s"exactly one drop expected, got $a")
    assert(a.find(_._4).get._5 === Some(4L), "the dropped tick is seq 4")
    // drained in event-time order: ts 100, 200, 450, 500 -> buckets 0..3
    val buckets = a.filterNot(_._4).map(t => (t._1, t._2, t._3))
    assert(buckets.map(_._1) === Set(0L, 1L, 2L, 3L), s"four buckets expected: $a")
  }

  // ---------------------------------------------------------- linkage

  test("watermarked linkage: final-once per-key rows equal batch q169; drops audited") {
    import StreamingMetrics.{WmLinkOut, WmLinkRow}
    val (clean, dirtyDf) =
      graft.text.TextQueries.linkageCleanDirty(spark, "/root/testdata/sf0.001")
    val cleanStatic = clean.cache()
    // arrival order = event-time order: seq = rank of d_key, tsUs = seq
    val base = dirtyDf.selectExpr("d_key AS dKey", "dtitle").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).zipWithIndex
      .map { case ((k, t), i) => WmLinkRow(k, i.toLong, i.toLong, t) }.toSeq

    val batch = SparkEntry.queries("q169_record_linkage")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => r.getAs[Long]("d_key") ->
      (r.getAs[Long]("match_key"), r.getAs[Double]("best_jw"),
        r.getAs[Long]("n_cand"), r.getAs[Int]("self_match") == 1,
        r.getAs[Int]("strong") == 1)).toMap
    batch.unpersist()

    def run(cuts: Seq[Int], qname: String): Map[Long, WmLinkOut] = {
      val dir = Files.createTempDirectory("wmlink")
      landAll(dir, slices(base, cuts).map(_.toDF()))
      val stream = spark.readStream.schema(Seq.empty[WmLinkRow].toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[WmLinkRow]
      val q = StreamingMetrics
        .streamLinkageWatermarked(stream, cleanStatic, latenessUs = 0L,
          flushTimeoutMs = 4000L)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        await(qname, enough = expect.size.toLong)
        val rows = spark.table(qname).as[WmLinkOut].collect()
        assert(!rows.exists(_.isDrop), "no drops on an in-order feed")
        val byKey = rows.groupBy(_.dKey)
        byKey.foreach { case (k, rs) =>
          assert(rs.length === 1, s"dKey $k emitted ${rs.length}x — final-once violated")
        }
        byKey.view.mapValues(_.head).toMap
      } finally q.stop()
    }

    def view(m: Map[Long, WmLinkOut]) = m.view.mapValues(o =>
      (o.matchKey, o.bestJw, o.nCand, o.selfMatch, o.strong)).toMap
    val a = run(Seq(base.size / 2), "wmlk_a")
    assert(view(a) === expect, "watermarked linkage diverged from batch q169")
    val c = run(seededCuts(base.size, 0x169BL), "wmlk_c")
    assert(view(c) === expect, "randomized cut diverged from batch q169")
    cleanStatic.unpersist()
    ()
  }
}
