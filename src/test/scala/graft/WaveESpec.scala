package graft

import java.nio.file.Files

/** Fixtures for q127 (bigram next-token accuracy), q128 (threshold
  * sweep) and q129 (asset feature rollup).
  */
class WaveESpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-we").toFile.getAbsolutePath
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q127: argmax model scores the held-out bigrams") {
    // ids 0..16 hash to train, 17 and 21 to eval ((id·2654435761) % 1000)
    val dir = docsDir(Seq(
      (0L, "a b a b a b", "en", "s0"),       // train: a→b (×3), b→a (×2)
      (1L, "a c", "en", "s0"),               // train: a→c (×1) — argmax(a)=b
      (17L, "a b a c z q", "en", "s0"),      // eval: hit, miss, oov-context
      (21L, "b a", "fr", "s0")))             // eval fr: b→a hit
    val out = text.IndexQueries.q127.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en eval bigrams: (a,b) hit, (b,a) hit, (a,c) miss, (c,z) oov, (z,q) oov
    assert(out("en") === ((5L, 2L, 400L, 400L)))
    assert(out("fr") === ((1L, 1L, 1000L, 0L)))
  }

  test("q128: the relaxation step picks up the weaker pair") {
    val strong = Seq.tabulate(90)(i => s"str$i").mkString(" ")
    val weakBase = Seq.tabulate(60)(i => s"wk$i").mkString(" ")
    val weakTail = Seq.tabulate(16)(i => s"tail$i").mkString(" ") // ~20% extra
    val dir = docsDir(Seq(
      (0L, strong, "en", "s0"), (1L, strong, "en", "s0"),  // jaccard 1.0
      (2L, weakBase, "en", "s0"),
      (3L, weakBase + " " + weakTail, "en", "s0"),          // jaccard ~0.75
      (4L, Seq.fill(50)("unrelated other words").mkString(" "), "en", "s1")))
    val out = text.TextQueries.q128.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(700L) === ((2L, 2L, 4L, 2L)), s"tau .70 keeps both pairs: ${out(700L)}")
    assert(out(800L) === ((1L, 1L, 2L, 2L)), "tau .80 keeps only the exact dup")
    assert(out(900L) === ((1L, 1L, 2L, 2L)))
  }

  test("q130: balance audit prices the skewed cell") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    // 3 vectors hug axis-0 (label 0), 1 hugs axis-1 (label 1)
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0), (2L, Array(0.8f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1))
    e.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = vec.VectorQueries.q130.run(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // shares 750/250; loads 1500/500; scan fraction (9+1)/16 = 625‰
    assert(out(0) === ((3L, 750L, 1500L, 625L)))
    assert(out(1) === ((1L, 250L, 500L, 625L)))
  }

  test("q131: every stride pair lands in a capped decile") {
    val out = vec.VectorQueries.q131.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ids 0..499, stride 97 → 403 pairs (no identical-embedding pairs)
    assert(out.map(_._2).sum === 403L)
    assert(out.forall { case (d, _) => d >= 0L && d <= 30L })
  }

  test("q132: transition matrix on a hand-built stream") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-ev").toFile.getAbsolutePath
    // user 1: A,B,A → A→B, B→A; user 2: B,B → B→B
    Seq((10L, 1000000000L, 1L, "A", 1.0, "{}"),
        (11L, 2000000000L, 1L, "B", 1.0, "{}"),
        (12L, 3000000000L, 1L, "A", 1.0, "{}"),
        (13L, 1000000000L, 2L, "B", 1.0, "{}"),
        (14L, 2000000000L, 2L, "B", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q132.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("A", "B")) === ((1L, 1000L, 0L)))
    assert(out(("B", "A")) === ((1L, 500L, 0L)))
    assert(out(("B", "B")) === ((1L, 500L, 1L)))
  }

  test("q133: run structure and advice on a hand-built cluster") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-enc").toFile.getAbsolutePath
    // one order, 6 lines: returnflag runs A A B B B A → 3 runs
    val rows = Seq(
      (1L, 1, "A", "O", 1.0, 10.0), (1L, 2, "A", "O", 1.0, 20.0),
      (1L, 3, "B", "O", 2.0, 30.0), (1L, 4, "B", "O", 2.0, 40.0),
      (1L, 5, "B", "F", 2.0, 50.0), (1L, 6, "A", "F", 3.0, 60.0))
    rows.toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = rel.RelationalQueries.q133.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(6)))).toMap
    assert(out("l_returnflag") === ((6L, 2L, 1L, 3L, "rle")))       // avg run 2.0
    assert(out("l_linestatus") === ((6L, 2L, 1L, 2L, "rle")))       // runs O,F
    assert(out("l_quantity") === ((6L, 3L, 2L, 3L, "rle")))
    assert(out("l_extendedprice") === ((6L, 6L, 3L, 6L, "dict")))   // all runs of 1
  }

  test("q134: independence estimate is exact on uniform FK joins") {
    val out = rel.RelationalQueries.q134.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // orders→lineitem: every lineitem has a parent; d = orderkeys of orders
    val (estOL, actOL, errOL) = out("orders-lineitem")
    assert(actOL > 0 && estOL === actOL && errOL === 0L,
      s"uniform FK join must estimate exactly: ${out("orders-lineitem")}")
    assert(out.size === 3)
  }

  test("q135: only non-dominated points survive; ties both survive") {
    val sess = spark
    import sess.implicits._
    // x = n_chars; y = distinct 8-gram count ≈ len - 7 for all-distinct text
    def uniq(n: Int) = Seq.tabulate(n / 8 + 1)(i => f"w$i%06d").mkString(" ").take(n)
    val rep = "abcdefgh" * 10 // 80 chars but only 8 distinct grams
    val dir = docsDir(Seq(
      (0L, uniq(200), "en", "s0"),   // long + dense: dominates everything shorter
      (1L, uniq(100), "en", "s0"),   // dominated by 0
      (2L, rep + rep, "en", "s0"),   // 160 chars, low density: dominated by 0
      (3L, uniq(200), "en", "s0")))  // same point as 0: both survive
    val ids = text.TextQueries.q135.run(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L, 3L), s"skyline ids: $ids")
  }

  test("q136: strict-order funnel drops out-of-order conversions") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-fun").toFile.getAbsolutePath
    // u1 completes in order; u2 purchases BEFORE clicking (no step 3);
    // u3 only views
    Seq((1L, 1000000000L, 1L, "view"), (2L, 2000000000L, 1L, "click"),
        (3L, 3000000000L, 1L, "purchase"),
        (4L, 1000000000L, 2L, "view"), (5L, 3000000000L, 2L, "click"),
        (6L, 2000000000L, 2L, "purchase"),
        (7L, 1000000000L, 3L, "view"))
      .map { case (e, t, u, k) => (e, t, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q136.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 1000L)))
    assert(out(2L) === ((2L, 666L)))
    assert(out(3L) === ((1L, 500L)))
  }

  test("q137: cohort triangle on a two-week stream") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-ret").toFile.getAbsolutePath
    val day = 86400000000000L // ns
    // u1 active week0+week1; u2 active week0 only; u3 first seen week1
    Seq((1L, 0L * day, 1L), (2L, 8L * day, 1L),
        (3L, 1L * day, 2L),
        (4L, 9L * day, 3L))
      .map { case (e, t, u) => (e, t, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q137.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out((0L, 0L)) === ((2L, 2L, 1000L)))
    assert(out((0L, 1L)) === ((1L, 2L, 500L)))
    assert(out((1L, 0L)) === ((1L, 1L, 1000L)))
    assert(out.size === 3)
  }

  test("q138: truncation is lossless when all mass sits in the first 8 dims") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-dim").toFile.getAbsolutePath
    val rnd = new scala.util.Random(11)
    (0L until 12L).map { i =>
      val v = Array.fill(64)(0.0f)
      for (d <- 0 until 8) v(d) = (rnd.nextInt(100) + 1) / 100.0f
      (i, v, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = vec.VectorQueries.q138.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 24, "8 queries x 3 k-values, all with full hits")
    assert(rows.forall(_._3 === 10L), "every truncated top-10 equals the exact top-10")
  }

  test("q139: credit flows to the latest prior non-purchase touch") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-att").toFile.getAbsolutePath
    Seq((1L, 1L, 1L, "view"), (2L, 2L, 1L, "click"), (3L, 3L, 1L, "purchase"),
        (4L, 1L, 2L, "purchase"), (5L, 2L, 2L, "view"), (6L, 3L, 2L, "purchase"))
      .map { case (e, t, u, k) => (e, t * 1000000000L, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q139.run(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("click") === ((1L, 333L)))
    assert(out("view") === ((1L, 333L)))
    assert(out("none") === ((1L, 333L)))
  }

  test("q140: RAKE degree/frequency scores on a two-phrase doc") {
    // "alpha beta of alpha beta": two "alpha beta" phrases
    // freq(alpha)=freq(beta)=2, deg=4 each → wscore 2000, pscore 4000
    val dir = docsDir(Seq((0L, "alpha beta of alpha beta", "en", "s0")))
    val rows = text.IndexQueries.q140.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("alpha beta", 2L, 4000L)))
  }

  test("q141: percentiles of 0..100 land on exact ranks") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-pct").toFile.getAbsolutePath
    (0 to 100).map(i => (i.toLong, i.toLong * 1000000000L, 1L, "click", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = rel.RelationalQueries.q141.run(spark, dir).collect()(0)
    assert(r.getString(0) === "click")
    assert(r.getDouble(1) === 50.0 && r.getDouble(2) === 95.0 && r.getDouble(3) === 99.0)
  }

  test("q142: MAD of a constant bulk flags the single outlier") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-mad").toFile.getAbsolutePath
    val vals = Seq.fill(9)(10.0) :+ 1000.0
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong * 1000000000L, 1L, "error", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = rel.RelationalQueries.q142.run(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)) ===
      ((10L, 1L, 100L, 10.0, 0.0)))
  }

  test("q143: weekly half-life outranks raw totals for recent activity") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-dec").toFile.getAbsolutePath
    val day = 86400000000000L
    // u1: 10.00 on the last day (w=1024); u2: 20.00 four weeks earlier (w=64)
    Seq((1L, 30L * day, 1L, "view", 10.0, "{}"),
        (2L, 2L * day, 2L, "view", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = rel.RelationalQueries.q143.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, 1024000L, 1000L), (2L, 128000L, 2000L)),
      "the smaller-but-recent user leads the decayed board")
  }

  test("q144: calibration buckets separate confident from thin contexts") {
    val dir = docsDir(Seq(
      (0L, Seq.fill(20)("a b").mkString(" "), "en", "s0"),  // conf(a)=20 → bucket 8
      (1L, "z y", "en", "s0"),                              // conf(z)=1 → bucket 0
      (17L, "a b z q", "en", "s0")))                        // eval: hit, miss, miss
    val out = text.IndexQueries.q144.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(8L) === ((2L, 1L, 500L)), s"confident bucket: ${out.get(8L)}")
    assert(out(0L) === ((1L, 0L, 0L)), "thin bucket misses")
  }

  test("q145: folds partition the corpus with bounded skew") {
    val rows = text.IndexQueries.q145.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(rows.length === 5)
    assert(rows.map(_._2).sum === 500L, "folds partition all 500 docs")
    assert(rows.forall(_._2 > 0L), "no empty fold")
  }

  test("q146: a 4x hour fires only after 12 baseline hours exist") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-burst").toFile.getAbsolutePath
    val hour = 3600000000000L // ns
    // hours 0..23: 10 events each; hour 24: 40 events (40·24 > 3·240)
    val rows = (for { h <- 0 until 24; i <- 0 until 10 }
      yield (h * 10L + i, h * hour + i * 1000000L, 1L)) ++
      (0 until 40).map(i => (9000L + i, 24 * hour + i * 1000000L, 1L))
    rows.map { case (e, t, u) => (e, t, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q146.run(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((24L, 40L, 240L, 24L)), s"got ${out.toSeq}")
  }

  test("q148: coverage counts the embedding holes per slice") {
    val sess = spark
    import sess.implicits._
    val dir = docsDir(Seq(
      (0L, "a", "en", "s0"), (1L, "b", "en", "s0"),
      (2L, "c", "en", "s0"), (3L, "d", "fr", "s0")))
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = vec.VectorQueries.q148.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("s0", "en")) === ((3L, 2L, 666L, 2L)))
    assert(out(("s0", "fr")) === ((1L, 0L, 0L, 0L)))
  }

  test("q149: support/confidence/lift on a hand-built basket") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-bask").toFile.getAbsolutePath
    val day = 86400000000000L
    // 10 users = 10 sessions: 6 with view+click, 2 view only, 2 click only
    val rows =
      (1 to 6).flatMap(u => Seq((u * 10L, u * day, u.toLong, "view"),
        (u * 10L + 1, u * day + 1000000000L, u.toLong, "click"))) ++
      (7 to 8).map(u => (u * 10L, u * day, u.toLong, "view")) ++
      (9 to 10).map(u => (u * 10L, u * day, u.toLong, "click"))
    rows.map { case (e, t, u, k) => (e, t, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q149.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // n_ab=6, N=10, n_view=8, n_click=8 → support 600, conf 750, lift 937
    assert(out(("view", "click")) === ((6L, 600L, 750L, 937L)))
    assert(out(("click", "view")) === ((6L, 600L, 750L, 937L)))
  }

  test("q147: clear clusters land in the overflow margin bucket, a midpoint in 0") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-marg").toFile.getAbsolutePath
    // tight clusters at e1 and e2; one vector near the midpoint
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.0f, 0.9f), 1),
      (4L, Array(0.5f, 0.45f), 0))
    e.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = vec.VectorQueries.q147.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the four cluster members margin at ≥ 0.8 (overflow bucket 5); the
    // midpoint vector (pulled into centroid 0) sits ON the 0.4 boundary —
    // float32 storage (0.45f ≈ 0.44999998) lands it just above → bucket 4
    // (a decimal hand-calc says 3; the float32 value is what both engines see)
    assert(out === Map(5L -> 4L, 4L -> 1L), s"buckets: $out")
  }

  test("q150: release gate candidates equal q70's near-dedup survivors") {
    val dir = "/root/testdata/sf0.001"
    val gate = text.TextQueries.q150.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gate.length === 20, "one manifest row per source")
    assert(gate.forall { case (_, cand, rel, capped) =>
      rel <= 20 && cand === rel + capped })
    val funnelN4 = text.TextQueries.q70.run(spark, dir)
      .collect().find(_.getInt(0) === 4).get.getLong(2)
    assert(gate.map(_._2).sum === funnelN4,
      "the gate consumes exactly the funnel's survivor set")
  }

  test("q151: a 10-vs-0 user split trips the 3-sigma SRM flag") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-srm").toFile.getAbsolutePath
    // ids 15..24 hash to variant A under (u·2654435761) % 1009 % 2
    (15L to 24L).zipWithIndex.map { case (u, i) =>
      (i.toLong, i.toLong * 1000000000L, u, "view", 2.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q151.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") === ((10L, 10L, 2000L, 1L)), s"got ${out.get("A")}")
    assert(!out.contains("B"), "no B exposures in this fixture")
  }

  test("q152: conversion-time percentiles on hand-built latencies") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-flat").toFile.getAbsolutePath
    val sec = 1000000000L
    Seq((1L, 0L, 1L, "view"), (2L, 10L * sec, 1L, "click"), (3L, 30L * sec, 1L, "purchase"),
        (4L, 0L, 2L, "view"), (5L, 20L * sec, 2L, "click"))
      .map { case (e, t, u, k) => (e, t, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = rel.RelationalQueries.q152.run(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out("to_click_us") === ((15000000.0, 19000000.0)))
    assert(out("to_purchase_us") === ((30000000.0, 30000000.0)))
  }

  test("q129: per-kind rollup equals hand-computed byte features") {
    val texts = Seq((0L, "imagepayload"), (1L, "audiopayload!"), (2L, "videopayload!!"))
    val dir = docsDir(texts.map { case (id, t) => (id, t, "en", "s0") })
    val out = multimodal.MultimodalQueries.q129.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def hdr(s: String) = s.getBytes("UTF-8").take(16).map(_.toLong & 0xffL).sum
    assert(out("image") === ((1L, 12L, hdr("imagepayload"), 1L)))
    assert(out("audio") === ((1L, 13L, hdr("audiopayload!"), 1L)))
    assert(out("video") === ((1L, 14L, hdr("videopayload!!"), 1L)))
  }
}
