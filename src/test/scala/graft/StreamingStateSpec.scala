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
    * One helper for every row type: callers pass the already-typed frame.
    */
  private def landDf(dir: java.nio.file.Path, name: String,
                     df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = Files.createTempDirectory("stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
  }

  private def land(dir: java.nio.file.Path, name: String, ticks: Seq[Tick]): Unit =
    landDf(dir, name, ticks.toDF())

  /** Seeded random micro-batch boundaries: 3–8 slices of [0, n). The
    * twins' convergence claims quantify over ANY cut; the fixed 2-batch
    * cuts exercise one boundary each, this samples a multi-boundary cut
    * reproducibly (seed in the call site).
    */
  private def seededCuts(n: Int, seed: Long): Seq[Int] = {
    val rnd = new scala.util.Random(seed)
    val k = 3 + rnd.nextInt(6)
    Seq.fill(k - 1)(1 + rnd.nextInt(math.max(n - 1, 1))).distinct.sorted
  }

  /** Slice `all` at ascending in-range boundaries → non-empty batches. */
  private def slices[T](all: Seq[T], cuts: Seq[Int]): Seq[Seq[T]] = {
    val bounds = (0 +: cuts.filter(c => c > 0 && c < all.size).distinct.sorted) :+ all.size
    bounds.sliding(2).collect { case Seq(a, b) if b > a => all.slice(a, b) }.toSeq
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

  test("streaming drift monitor: running centroid state alarms across batches") {
    import StreamingMetrics.{DriftOut, EmbRow}
    val dir = Files.createTempDirectory("drift")
    def landE(name: String, rows: Seq[EmbRow]): Unit =
      landDf(dir, name, rows.toDF())
    // baseline: label 0 points along +x, label 1 along +y
    val baseline = Map(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    // batch 1: label 0 healthy (all +x); label 1 healthy (+y)
    landE("b1.parquet", Seq(
      EmbRow(0, 1L, Seq(2.0, 0.0)), EmbRow(0, 2L, Seq(4.0, 0.0)),
      EmbRow(1, 3L, Seq(0.0, 8.0))))
    val stream = spark.readStream
      .schema(Seq.empty[EmbRow].toDF().schema)
      .parquet(dir.toString)
      .as[EmbRow]
    val q = StreamingMetrics.streamDriftMonitor(stream, baseline, tau = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("drift").start()
    try {
      q.processAllAvailable()
      // batch 2: label 0 swings orthogonal hard enough to cross tau —
      // the alarm depends on batch-1 state (sum (6,0)) PLUS this batch
      landE("b2.parquet", Seq(
        EmbRow(0, 4L, Seq(0.0, 32.0)), EmbRow(1, 5L, Seq(0.0, 2.0))))
      q.processAllAvailable()
      val rows = spark.table("drift").as[DriftOut].collect()
        .groupBy(_.label).view.mapValues(_.sortBy(_.n)).toMap
      // after batch 1 both labels track their baseline exactly
      assert(rows(0).head.cosBaseline === 1.0 && !rows(0).head.drifted)
      assert(rows(1).head.cosBaseline === 1.0 && !rows(1).head.drifted)
      // after batch 2: label 0 sum = (6, 32) → cos = 6/sqrt(1060) < 0.5
      val d0 = rows(0).last
      assert(d0.n === 3L)
      assert(d0.cosBaseline === 6.0 / math.sqrt(6.0 * 6.0 + 32.0 * 32.0) +- 1e-12)
      assert(d0.drifted, "orthogonal swing must raise the alarm")
      assert(rows(1).last.cosBaseline === 1.0 && !rows(1).last.drifted,
        "the healthy label stays green on the same triggers")
    } finally q.stop()
  }

  test("streaming session windows finalize when the watermark passes session end") {
    val dir = Files.createTempDirectory("sess")
    def rows(ts: Seq[Long]): Seq[(String, Long, Double)] =
      ts.map(t => ("A", t * 1000000L, 1.0))
    // two bursts: [0s, 30s] (one session, gap 60s) and [200s] (another)
    land2(dir, "b1.parquet", rows(Seq(0L, 30L, 200L)))
    val stream = spark.readStream
      .schema(rows(Seq(0L)).toDF("sym", "ts_us", "px").schema)
      .parquet(dir.toString)
    val q = StreamingMetrics.sessionBars(stream, gap = "1 minute", lateness = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // nothing can finalize yet — the watermark has not passed any end
      land2(dir, "b2.parquet", rows(Seq(4000L))) // advances watermark to 3940 s
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select("session_start_us", "session_end_us", "n_ticks")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // session 1: [0, 30+60) merged from two events; session 2: [200, 260)
      assert(out === Seq((0L, 90000000L, 2L), (200000000L, 260000000L, 1L)),
        s"got ${out.mkString(", ")}")
      // the 4000 s burst stays OPEN (watermark has not passed its end)
    } finally q.stop()
  }

  private def land2(dir: java.nio.file.Path, name: String,
                    rows: Seq[(String, Long, Double)]): Unit =
    landDf(dir, name, rows.toDF("sym", "ts_us", "px"))

  test("streaming priority sampler: bounded heap state converges to the batch answer") {
    import StreamingMetrics.{PsItem, PsOut, PsRow}
    val K = 3
    // deterministic "priorities": p = w * 1000 / (docId % 7 + 1) —
    // arbitrary but fixed, so the batch reference is exact arithmetic
    def mk(source: String, ids: Seq[Long]): Seq[PsRow] =
      ids.map(i => PsRow(source, i, (i % 13 + 1).toDouble,
        (i % 13 + 1).toDouble * 1000.0 / (i % 7 + 1).toDouble))
    val batch1 = mk("A", 1L to 20L) ++ mk("B", 101L to 102L)
    val batch2 = mk("A", 21L to 40L) ++ mk("B", Seq(104L))

    /** Batch reference — the same fold the operator documents: top-(K+1)
      * under (p desc, docId asc), τ = (K+1)-th, ŵ = Σ max(w, τ).
      */
    def ref(rows: Seq[PsRow]): (Double, Int, Double) = {
      val top = rows.map(r => PsItem(r.p, r.w, r.docId))
        .sortBy(x => (-x.p, x.docId)).take(K + 1)
      val full = top.size >= K + 1
      val tau = if (full) top.last.p else 0.0
      val sample = if (full) top.dropRight(1) else top
      (tau, sample.size, sample.foldLeft(0.0)((a, x) => a + math.max(x.w, tau)))
    }

    val dir = Files.createTempDirectory("ps")
    def landP(name: String, rows: Seq[PsRow]): Unit =
      landDf(dir, name, rows.toDF())
    landP("b1.parquet", batch1)
    val stream = spark.readStream
      .schema(Seq.empty[PsRow].toDF().schema)
      .parquet(dir.toString)
      .as[PsRow]
    val q = StreamingMetrics.streamPrioritySample(stream, K)
      .writeStream.outputMode("append").format("memory").queryName("ps").start()
    try {
      q.processAllAvailable()
      landP("b2.parquet", batch2)
      q.processAllAvailable()
      val out = spark.table("ps").as[PsOut].collect()
        .groupBy(_.source).view.mapValues(_.sortBy(_.nSeen)).toMap
      // mid-stream emission = batch answer over batch 1 alone
      val (tauA1, kA1, estA1) = ref(batch1.filter(_.source == "A"))
      assert(out("A").head.nSeen === 20L)
      assert(out("A").head.tau === tauA1)
      assert(out("A").head.kEff === kA1)
      assert(out("A").head.estMass === estA1)
      // final emission = batch answer over BOTH batches: the bounded
      // heap carried exactly the state the merged top-K needed
      val allA = batch1.filter(_.source == "A") ++ batch2.filter(_.source == "A")
      val (tauA, kA, estA) = ref(allA)
      assert(out("A").last.nSeen === 40L)
      assert(out("A").last.tau === tauA)
      assert(out("A").last.kEff === kA)
      assert(out("A").last.estMass === estA)
      // B has only K=3 docs total: under-filled heap → τ = 0 and the
      // estimate degrades gracefully to the EXACT mass Σw
      val allB = batch1.filter(_.source == "B") ++ batch2.filter(_.source == "B")
      assert(out("B").last.nSeen === 3L)
      assert(out("B").last.tau === 0.0)
      assert(out("B").last.kEff === 3)
      assert(out("B").last.estMass === allB.map(_.w).sum)
    } finally q.stop()
  }

  test("streaming priority sampler: randomized multi-batch cuts converge to the batch fold") {
    import StreamingMetrics.{PsItem, PsOut, PsRow}
    val K = 3
    def mk(source: String, ids: Seq[Long]): Seq[PsRow] =
      ids.map(i => PsRow(source, i, (i % 13 + 1).toDouble,
        (i % 13 + 1).toDouble * 1000.0 / (i % 7 + 1).toDouble))
    val all = mk("A", 1L to 40L) ++ mk("B", Seq(101L, 102L, 104L))
    def ref(rows: Seq[PsRow]): (Double, Int, Double) = {
      val top = rows.map(r => PsItem(r.p, r.w, r.docId))
        .sortBy(x => (-x.p, x.docId)).take(K + 1)
      val full = top.size >= K + 1
      val tau = if (full) top.last.p else 0.0
      val sample = if (full) top.dropRight(1) else top
      (tau, sample.size, sample.foldLeft(0.0)((a, x) => a + math.max(x.w, tau)))
    }
    val dir = Files.createTempDirectory("psr")
    val parts = slices(all, seededCuts(all.size, 0x9541L))
    landDf(dir, "b1.parquet", parts.head.toDF())
    val stream = spark.readStream.schema(Seq.empty[PsRow].toDF().schema)
      .parquet(dir.toString).as[PsRow]
    val q = StreamingMetrics.streamPrioritySample(stream, K)
      .writeStream.outputMode("append").format("memory").queryName("psr").start()
    try {
      q.processAllAvailable()
      parts.tail.zipWithIndex.foreach { case (p, i) =>
        landDf(dir, s"b${i + 2}.parquet", p.toDF())
        q.processAllAvailable()
      }
      val fin = spark.table("psr").as[PsOut].collect()
        .groupBy(_.source).view.mapValues(_.maxBy(_.nSeen)).toMap
      Seq("A", "B").foreach { s =>
        val rows = all.filter(_.source == s)
        val (tau, kEff, est) = ref(rows)
        assert(fin(s).nSeen === rows.size.toLong, s"$s nSeen")
        assert(fin(s).tau === tau, s"$s tau under randomized cuts")
        assert(fin(s).kEff === kEff, s"$s kEff under randomized cuts")
        assert(fin(s).estMass === est, s"$s estMass under randomized cuts")
      }
    } finally q.stop()
  }

  test("streaming changelog snapshot: per-key MERGE state converges to the batch answer under any cut") {
    import StreamingMetrics.{CdcOut, CdcRow}
    val all = Seq(
      CdcRow(1L, Some(5L), 1000L, 10L, isDel = false, Some(1.0)),
      CdcRow(1L, Some(5L), 2000L, 11L, isDel = false, Some(2.0)),
      CdcRow(1L, Some(6L), 1000L, 12L, isDel = false, Some(3.0)),
      CdcRow(1L, Some(6L), 3000L, 13L, isDel = true, None), // tombstone
      CdcRow(2L, Some(7L), 5000L, 14L, isDel = false, Some(4.0)),
      CdcRow(2L, Some(7L), 5000L, 15L, isDel = false, Some(5.0)), // ts tie → 15
      CdcRow(2L, None, 6000L, 16L, isDel = false, Some(6.0)), // null key is a key
      CdcRow(3L, Some(8L), 1000L, 17L, isDel = true, None),
      CdcRow(3L, Some(8L), 2000L, 18L, isDel = false, Some(7.0))) // resurrection

    def run(cuts: Seq[Int], qname: String): Map[(Long, Option[Long]), CdcOut] = {
      val dir = Files.createTempDirectory("cdc")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[CdcRow].toDF().schema)
        .parquet(dir.toString).as[CdcRow]
      val q = StreamingMetrics.streamChangelogSnapshot(stream)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // nOps is strictly monotone per key → max-nOps row IS the final state
        spark.table(qname).as[CdcOut].collect()
          .groupBy(r => (r.userId, r.k)).view.mapValues(_.maxBy(_.nOps)).toMap
      } finally q.stop()
    }

    val out = run(Seq(4), "cdc_a")
    assert(out.keySet === Set((1L, Some(5L)), (1L, Some(6L)), (2L, Some(7L)),
      (2L, None), (3L, Some(8L))))
    val k15 = out((1L, Some(5L)))
    assert(k15.live && k15.lastValue === Some(2.0) && k15.lastEventId === 11L
      && k15.nOps === 2L && k15.nDeletes === 0L)
    val k16 = out((1L, Some(6L))) // tombstoned: retraction row, no value
    assert(!k16.live && k16.lastValue.isEmpty && k16.nOps === 2L && k16.nDeletes === 1L)
    val k27 = out((2L, Some(7L))) // version tie resolves by eventId
    assert(k27.live && k27.lastValue === Some(5.0) && k27.lastEventId === 15L)
    assert(out((2L, None)).live && out((2L, None)).lastValue === Some(6.0))
    val k38 = out((3L, Some(8L))) // delete then later upsert → resurrected
    assert(k38.live && k38.lastValue === Some(7.0) && k38.nDeletes === 1L)

    // batch-cut invariance: a different micro-batch split converges to
    // the identical final snapshot (state merge is assoc + commutative)
    def key(m: Map[(Long, Option[Long]), CdcOut]) = m.view.mapValues(o =>
      (o.live, o.lastValue, o.lastTsUs, o.lastEventId, o.nOps, o.nDeletes)).toMap
    val out2 = run(Seq(7), "cdc_b")
    assert(key(out) === key(out2))
    // and a seeded RANDOM multi-batch cut (3–8 slices) converges too
    val out3 = run(seededCuts(all.size, 0xCDC1L), "cdc_c")
    assert(key(out) === key(out3), "randomized multi-batch cut diverged")
  }

  test("streaming MV maintenance converges to q162's batch view under any cut") {
    import StreamingMetrics.{MvOut, MvRow}
    val all = Tables(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("(ts div 1000) div 86400000000 AS day", "event_type AS eventType", "value")
      .as[MvRow].collect().toSeq

    def run(cuts: Seq[Int], qname: String): Map[(Long, String), MvOut] = {
      val dir = Files.createTempDirectory("mv")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[MvRow].toDF().schema)
        .parquet(dir.toString).as[MvRow]
      val q = StreamingMetrics.streamMvMaintenance(stream)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // nEvents is strictly monotone per group → max row IS final state
        spark.table(qname).as[MvOut].collect()
          .groupBy(r => (r.day, r.eventType)).view.mapValues(_.maxBy(_.nEvents)).toMap
      } finally q.stop()
    }

    val a = run(Seq(all.size / 3), "mv_a")
    val b = run(Seq(2 * all.size / 3), "mv_b")
    assert(a === b, "different micro-batch cuts must converge to one view")
    val c = run(seededCuts(all.size, 0x1620L), "mv_c")
    assert(a === c, "randomized multi-batch cut diverged from the 2-batch view")

    // and the converged state IS the batch q162 merged view
    val batch = SparkEntry.queries("q162_incremental_mv")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_vals"),
          Option(r.getAs[Any]("sum_value")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("min_value")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("max_value")).map(_.asInstanceOf[Double]))).toMap
    batch.unpersist()
    assert(a.keySet === expect.keySet)
    a.foreach { case (k, o) =>
      assert(expect(k) === ((o.nEvents, o.nVals, o.sumValue, o.minValue, o.maxValue)),
        s"streaming state diverged from batch MV on $k")
    }
  }

  test("streaming KMV sketch converges to the batch K-min set under any cut") {
    import StreamingMetrics.{KmvOut, KmvRow}
    // q164's gram-hash recipe over the real corpus, restricted to 4
    // sources so the per-key state paths get dense batches
    val all = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .selectExpr("source", "text")
      .selectExpr("source",
        "explode(transform(sequence(0, greatest(size(split(trim(lower(text)), '\\\\s+')) - 3, 0) - 1), " +
          "i -> concat_ws(' ', element_at(split(trim(lower(text)), '\\\\s+'), i + 1), " +
          "element_at(split(trim(lower(text)), '\\\\s+'), i + 2), " +
          "element_at(split(trim(lower(text)), '\\\\s+'), i + 3)))) AS gram")
      .selectExpr("source",
        "CAST(conv(substr(md5(CAST(gram AS BINARY)), 1, 12), 16, 10) AS BIGINT) AS h")
      .as[KmvRow].collect().toSeq

    val k = 64
    def run(cuts: Seq[Int], qname: String): Map[String, KmvOut] = {
      val dir = Files.createTempDirectory("kmv")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[KmvRow].toDF().schema)
        .parquet(dir.toString).as[KmvRow]
      val q = StreamingMetrics.streamKmvSketch(stream, k)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        spark.table(qname).as[KmvOut].collect()
          .groupBy(_.source).view.mapValues(_.maxBy(_.nSeen)).toMap
      } finally q.stop()
    }

    val a = run(Seq(all.size / 4), "kmv_a")
    val b = run(Seq(3 * all.size / 4), "kmv_b")
    val c = run(seededCuts(all.size, 0x164AL), "kmv_c")
    assert(a.keySet === b.keySet && a.keySet === c.keySet)
    a.keySet.foreach { s =>
      assert((a(s).kUsed, a(s).theta, a(s).estDistinct) ===
        ((b(s).kUsed, b(s).theta, b(s).estDistinct)),
        s"different cuts diverged on $s")
      assert((a(s).kUsed, a(s).theta, a(s).estDistinct) ===
        ((c(s).kUsed, c(s).theta, c(s).estDistinct)),
        s"randomized multi-batch cut diverged on $s")
    }
    // batch equality + estimator sanity on the exact distinct count
    val bySrc = all.groupBy(_.source)
    a.foreach { case (s, o) =>
      val distinctH = bySrc(s).map(_.h).distinct.sorted
      val expectMins = distinctH.take(k)
      assert(o.nSeen === bySrc(s).size)
      assert(o.kUsed === expectMins.size)
      if (expectMins.size >= k) {
        assert(o.theta === Some(expectMins.last))
        val est = o.estDistinct.get
        val exact = distinctH.size.toDouble
        assert(est > exact * 0.6 && est < exact * 1.6,
          s"$s: KMV estimate $est implausible vs exact $exact at K=$k")
      } else assert(o.estDistinct === Some(expectMins.size.toDouble))
    }
  }

  test("streaming record linkage converges to the batch q169 best matches under any cut") {
    import StreamingMetrics.{LinkOut, LinkRow}
    val (clean, dirtyDf) =
      graft.text.TextQueries.linkageCleanDirty(spark, "/root/testdata/sf0.001")
    val cleanStatic = clean.cache() // the static reference side
    val all = dirtyDf.selectExpr("d_key AS dKey", "dtitle").as[LinkRow].collect().toSeq

    def run(cuts: Seq[Int], qname: String): Map[Long, LinkOut] = {
      val dir = Files.createTempDirectory("rl")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[LinkRow].toDF().schema)
        .parquet(dir.toString).as[LinkRow]
      val q = StreamingMetrics.streamLinkage(stream, cleanStatic)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        spark.table(qname).as[LinkOut].collect()
          .groupBy(_.dKey).view.mapValues(_.maxBy(_.nCand)).toMap
      } finally q.stop()
    }

    def view(m: Map[Long, LinkOut]) = m.view.mapValues(o =>
      (o.matchKey, o.bestJw, o.nCand, o.selfMatch, o.strong)).toMap
    val a = run(Seq(all.size / 2), "rl_a")
    val c = run(seededCuts(all.size, 0x169AL), "rl_c")
    assert(view(a) === view(c), "randomized multi-batch cut diverged")

    // the streamed best matches ARE the batch q169 rows — same blocking,
    // same kernel, same tie-breaks, same distinct-candidate counts
    val batch = SparkEntry.queries("q169_record_linkage")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => r.getAs[Long]("d_key") ->
      (r.getAs[Long]("match_key"), r.getAs[Double]("best_jw"),
        r.getAs[Long]("n_cand"), r.getAs[Int]("self_match") == 1,
        r.getAs[Int]("strong") == 1)).toMap
    batch.unpersist()
    assert(view(a) === expect, "streaming linkage diverged from batch q169")
    cleanStatic.unpersist()
  }

  test("streaming OHLC bars converge to the batch q176 bars under any cut") {
    import StreamingMetrics.{BarOut, BarTick}
    // q176's own tick derivation, collected once (source order = seq)
    val all = graft.book.SyntheticBook
      .fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull)
      .select(col("sym"), col("seq"), expr("ts_us div 3600000000").as("bar"),
        col("mid"),
        (coalesce(col("bid1_size"), lit(0.0)) + coalesce(col("ask1_size"), lit(0.0)))
          .cast("long").as("vol"))
      .as[BarTick].collect().toSeq.sortBy(_.seq)

    def run(cuts: Seq[Int], qname: String): Map[(String, Long), BarOut] = {
      val dir = Files.createTempDirectory("ohlc")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[BarTick].toDF().schema)
        .parquet(dir.toString).as[BarTick]
      val q = StreamingMetrics.streamOhlcBars(stream)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // nTicks is strictly monotone per key → max-nTicks row IS the
        // final bar state
        spark.table(qname).as[BarOut].collect()
          .groupBy(o => (o.sym, o.bar)).view.mapValues(_.maxBy(_.nTicks)).toMap
      } finally q.stop()
    }

    def view(m: Map[(String, Long), BarOut]) = m.view.mapValues(o =>
      (o.open, o.high, o.low, o.close, o.nTicks, o.l1Volume, o.barVwap)).toMap
    val a = run(Seq(all.size / 2), "ohlc_a")
    val c = run(seededCuts(all.size, 0x176AL), "ohlc_c")
    assert(view(a) === view(c), "randomized multi-batch cut diverged")

    // the converged bars ARE the batch q176 rows — same min_by/max_by
    // open/close, same decimal-exact VWAP numerator
    val batch = SparkEntry.queries("q176_ohlc_bars")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("bar")) ->
      (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks"), r.getAs[Long]("l1_volume"),
        Option(r.getAs[java.lang.Double]("bar_vwap")).map(_.doubleValue()))).toMap
    batch.unpersist()
    assert(view(a) === expect, "streaming bars diverged from batch q176")
  }

  test("streaming VPIN converges to the batch q181 buckets under any cut") {
    import StreamingMetrics.{VpinOut, VpinTick}
    // q181's own tick derivation, collected once (source order = seq)
    val all = graft.book.SyntheticBook
      .fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull)
      .select(col("sym"), col("seq"), col("mid"),
        (coalesce(col("bid1_size"), lit(0.0)) + coalesce(col("ask1_size"), lit(0.0)))
          .cast("long").as("vol"))
      .as[VpinTick].collect().toSeq.sortBy(_.seq)

    def run(cuts: Seq[Int], qname: String): Map[(String, Long), VpinOut] = {
      val dir = Files.createTempDirectory("vpin")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[VpinTick].toDF().schema)
        .parquet(dir.toString).as[VpinTick]
      val q = StreamingMetrics.streamVpin(stream)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // a bucket finalizes exactly once; the stream-end bucket's best
        // row is its fullest partial
        spark.table(qname).as[VpinOut].collect()
          .groupBy(o => (o.sym, o.bucket))
          .map { case (k, rs) => k -> rs.find(_.finalized).getOrElse(rs.maxBy(_.bucketVol)) }
      } finally q.stop()
    }

    def view(m: Map[(String, Long), VpinOut]) = m.view.mapValues(o =>
      (o.buyVol, o.sellVol, o.imbalance, o.bucketVol, o.vpinPermille)).toMap
    val a = run(Seq(all.size / 2), "vpin_a")
    val c = run(seededCuts(all.size, 0x181AL), "vpin_c")
    assert(view(a) === view(c), "randomized multi-batch cut diverged")

    // the reconstructed buckets ARE the batch q181 rows
    val batch = SparkEntry.queries("q181_vpin_toxicity")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("bucket")) ->
      (r.getAs[Long]("buy_vol"), r.getAs[Long]("sell_vol"), r.getAs[Long]("imbalance"),
        r.getAs[Long]("bucket_vol"),
        Option(r.getAs[java.lang.Long]("vpin_permille")).map(_.toLong))).toMap
    batch.unpersist()
    assert(view(a) === expect, "streaming VPIN diverged from batch q181")
  }

  test("streaming time travel converges to the batch q170 reconstruction under any cut") {
    import StreamingMetrics.{TtOut, TtRow}
    // q170's own derivation of the changelog rows, collected once
    val all = Tables(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id AS userId",
        "CASE WHEN regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) != '' " +
          "THEN CAST(regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) AS BIGINT) END AS k",
        "(ts div 1000) div 86400000000 AS day", "ts div 1000 AS tsUs",
        "event_id AS eventId", "event_type = 'error' AS isDel", "value")
      .as[TtRow].collect().toSeq
    val cuts = Seq(19733L, 19743L, 19753L)

    def run(cutIdx: Seq[Int], qname: String): Map[(Long, Option[Long], Long), TtOut] = {
      val dir = Files.createTempDirectory("tt")
      val parts = slices(all, cutIdx)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[TtRow].toDF().schema)
        .parquet(dir.toString).as[TtRow]
      val q = StreamingMetrics.streamTimeTravel(stream, cuts)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // nOps is strictly monotone per key → max-nOps rows ARE the
        // final state's per-cutoff snapshot
        spark.table(qname).as[TtOut].collect()
          .groupBy(r => (r.userId, r.k, r.cutoffDay))
          .view.mapValues(_.maxBy(_.nOps)).toMap
      } finally q.stop()
    }

    def view(m: Map[(Long, Option[Long], Long), TtOut]) =
      m.view.mapValues(o => (o.live, o.value, o.eventId)).toMap
    val a = run(Seq(all.size / 3), "tt_a")
    val b = run(Seq(2 * all.size / 3), "tt_b")
    assert(view(a) === view(b), "different micro-batch cuts must converge")
    val c = run(seededCuts(all.size, 0x17C0L), "tt_c")
    assert(view(a) === view(c), "randomized multi-batch cut diverged")

    // the converged per-key states roll up to EXACTLY the batch q170
    // summary (decimal-exact value mass included)
    val batch = SparkEntry.queries("q170_time_travel_read")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r =>
      r.getAs[Long]("cutoff_day") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_live"), r.getAs[Long]("n_deleted"),
          Option(r.getAs[Any]("live_value_sum")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("live_max_event_id")).map(_.asInstanceOf[Long]))).toMap
    batch.unpersist()
    val byCut = a.values.toSeq.groupBy(_.cutoffDay)
    assert(byCut.keySet === expect.keySet)
    byCut.foreach { case (cut, rows) =>
      val live = rows.filter(_.live)
      val mass = live.flatMap(_.value)
        .map(v => java.math.BigDecimal.valueOf(v)
          .setScale(8, java.math.RoundingMode.HALF_UP))
        .reduceOption((x, y) => x.add(y)).map(_.doubleValue())
      val got = (rows.size.toLong, live.size.toLong, (rows.size - live.size).toLong,
        mass, live.map(_.eventId).maxOption)
      assert(got === expect(cut), s"cutoff $cut: streaming state diverged from batch q170")
    }
  }

  test("watermarked OHLC: drops, late-accepted counts and bars are cut-invariant") {
    import StreamingMetrics.{WmBarOut, WmTick}
    // barUs = 100, latenessUs = 150. Hand-crafted out-of-order feed:
    //  A seq3 → bar0 after bar0 CLOSED (maxTs 110 ≥ 100) but before it
    //    finalized → late-ACCEPTED;
    //  A seq4 (ts 260) pushes maxTs past bar0's horizon (100+150) → bar0
    //    finalizes;
    //  A seq5 → bar0 after finalization → DROPPED, audit row;
    //  A seq7 / B seq2 are flush heartbeats finalizing the open bars.
    val all = Seq(
      WmTick("A", 1L, 10L, 1.0, 2L), WmTick("A", 2L, 110L, 2.0, 3L),
      WmTick("A", 3L, 50L, 3.0, 1L), WmTick("A", 4L, 260L, 4.0, 2L),
      WmTick("A", 5L, 60L, 5.0, 9L), WmTick("A", 6L, 120L, 6.0, 1L),
      WmTick("A", 7L, 600L, 7.0, 1L),
      WmTick("B", 1L, 10L, 1.5, 1L), WmTick("B", 2L, 999L, 2.5, 1L))

    def run(cuts: Seq[Int], qname: String): Set[WmBarOut] = {
      val dir = Files.createTempDirectory("wmohlc")
      val parts = slices(all, cuts)
      landDf(dir, "b1.parquet", parts.head.toDF())
      val stream = spark.readStream.schema(Seq.empty[WmTick].toDF().schema)
        .parquet(dir.toString).as[WmTick]
      val q = StreamingMetrics
        .streamOhlcBarsWatermarked(stream, barUs = 100L, latenessUs = 150L)
        .writeStream.outputMode("append").format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        parts.tail.zipWithIndex.foreach { case (p, i) =>
          landDf(dir, s"b${i + 2}.parquet", p.toDF())
          q.processAllAvailable()
        }
        // bars and drop audits each emit exactly once → the SET is the contract
        spark.table(qname).as[WmBarOut].collect().toSet
      } finally q.stop()
    }

    val a = run(Seq(4), "wmohlc_a")
    val b = run(Seq(2, 5, 7), "wmohlc_b")
    val c = run(seededCuts(all.size, 0x12DL), "wmohlc_c")
    assert(a === b, "2-cut vs 3-cut emitted row sets diverged")
    assert(a === c, "randomized multi-batch cut diverged")

    val bars = a.filterNot(_.isDrop).map(o => (o.sym, o.bar) -> o).toMap
    val drops = a.filter(_.isDrop)
    // exactly one drop: A seq5 targeting finalized bar0
    assert(drops.map(d => (d.sym, d.bar, d.dropSeq)) === Set(("A", 0L, Some(5L))))
    // bar0: seq1 + late-accepted seq3 (seq5 dropped); open by min-seq,
    // close by max-seq, decimal-exact vwap = (1.0·2 + 3.0·1)/3
    val a0 = bars(("A", 0L))
    assert((a0.open, a0.high, a0.low, a0.close, a0.nTicks, a0.l1Volume) ===
      (1.0, 3.0, 1.0, 3.0, 2L, 3L))
    assert(a0.barVwap === Some(5.0 / 3) && a0.nLateAccepted === 1L)
    // bar1: seq2 in-order + seq6 late-accepted (bar closed at maxTs 260)
    val a1 = bars(("A", 1L))
    assert((a1.open, a1.close, a1.nTicks, a1.l1Volume, a1.nLateAccepted) ===
      (2.0, 6.0, 2L, 4L, 1L))
    assert(a1.barVwap === Some(3.0))
    // bar2 (seq4 only) and B bar0 finalize via the flush heartbeats;
    // the heartbeat bars themselves stay open and never emit
    assert(bars(("A", 2L)).nTicks === 1L && bars(("B", 0L)).nTicks === 1L)
    assert(bars.keySet === Set(("A", 0L), ("A", 1L), ("A", 2L), ("B", 0L)))
  }

  test("watermarked OHLC with no late data converges to the batch q176 bars") {
    import StreamingMetrics.{WmBarOut, WmTick}
    // the real book feed with its event times; lateness = the feed's full
    // span + a bar, so NOTHING can drop, and per-sym sentinel heartbeats
    // past the horizon flush every real bar
    val base = graft.book.SyntheticBook
      .fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull)
      .select(col("sym"), col("seq"), col("ts_us").as("tsUs"), col("mid"),
        (coalesce(col("bid1_size"), lit(0.0)) + coalesce(col("ask1_size"), lit(0.0)))
          .cast("long").as("vol"))
      .as[WmTick].collect().toSeq.sortBy(_.seq)
    val barUs = 3600000000L
    val maxTs = base.map(_.tsUs).max
    val lateness = (maxTs - base.map(_.tsUs).min) + barUs
    val flushTs = maxTs + lateness + 2 * barUs
    val maxSeq = base.map(_.seq).max
    val sentinels = base.map(_.sym).distinct.sorted.zipWithIndex.map {
      case (s, i) => WmTick(s, maxSeq + 1 + i, flushTs, 0.0, 0L)
    }
    val all = base ++ sentinels
    val sentinelBar = Math.floorDiv(flushTs, barUs)

    val dir = Files.createTempDirectory("wmohlcb")
    val parts = slices(all, Seq(all.size / 3, 2 * all.size / 3))
    landDf(dir, "b1.parquet", parts.head.toDF())
    val stream = spark.readStream.schema(Seq.empty[WmTick].toDF().schema)
      .parquet(dir.toString).as[WmTick]
    val q = StreamingMetrics
      .streamOhlcBarsWatermarked(stream, barUs = barUs, latenessUs = lateness)
      .writeStream.outputMode("append").format("memory").queryName("wmohlc_eq").start()
    val rows = try {
      q.processAllAvailable()
      parts.tail.zipWithIndex.foreach { case (p, i) =>
        landDf(dir, s"b${i + 2}.parquet", p.toDF())
        q.processAllAvailable()
      }
      spark.table("wmohlc_eq").as[WmBarOut].collect().toSeq
    } finally q.stop()

    assert(!rows.exists(_.isDrop), "no tick may drop under span-wide lateness")
    val got = rows.filterNot(_.bar == sentinelBar)
      .map(o => (o.sym, o.bar) ->
        (o.open, o.high, o.low, o.close, o.nTicks, o.l1Volume, o.barVwap)).toMap
    val batch = SparkEntry.queries("q176_ohlc_bars")(spark, "/root/testdata/sf0.001")
    val expect = batch.collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("bar")) ->
      (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks"), r.getAs[Long]("l1_volume"),
        Option(r.getAs[java.lang.Double]("bar_vwap")).map(_.doubleValue()))).toMap
    batch.unpersist()
    assert(got === expect, "watermarked bars diverged from batch q176")
  }
}
