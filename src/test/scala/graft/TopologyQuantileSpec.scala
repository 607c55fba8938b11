package graft

import java.nio.file.Files

/** Fixtures for q125 (histogram-pruned exact quantiles) and q126
  * (dedup-component topology).
  */
class TopologyQuantileSpec extends SparkTestBase {

  test("q125: exact rank statistics and integer estimates on a known column") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-tq").toFile.getAbsolutePath
    // prices 1.00 .. 100.00 → cents 100..10000, n=100
    (1 to 100).map(i => i.toDouble).toDF("l_extendedprice")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = rel.RelationalQueries.q125.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // reimplementation of the documented integer contract
    val vs = (1 to 100).map(_ * 100L).sorted
    val (mn, mx, n) = (vs.min, vs.max, vs.length.toLong)
    val span = mx - mn + 1
    val hist = vs.groupBy(v => (v - mn) * 256 / span).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    val cums = (0L until 256L).map { b =>
      val c = hist.getOrElse(b, 0L); val lo = cum; cum += c; b -> ((lo, c))
    }.toMap
    for (pct <- Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L)) {
      val r = (n - 1) * pct / 100L
      val b = (0L until 256L).find { b => val (lo, c) = cums(b); r >= lo && r < lo + c }.get
      val (cumLo, c) = cums(b)
      val off = r - cumLo
      val blo = mn + b * span / 256L
      val bhi = mn + (b + 1) * span / 256L
      val est = blo + (bhi - blo) * off / c
      val exact = vs(r.toInt)
      assert(out(pct) === ((r, est, exact, (est - exact).abs * 1000 / span)), s"pct $pct")
    }
  }

  test("q126: a clique of identical docs and a chain of drifting docs") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-topo").toFile.getAbsolutePath
    val x = Seq.tabulate(100)(i => s"base$i").mkString(" ")   // ~700 chars
    val t1 = Seq.tabulate(6)(i => s"padone$i").mkString(" ")  // ~48 chars
    val t2 = Seq.tabulate(22)(i => s"padtwo$i").mkString(" ") // ~180 chars
    val clique = Seq.tabulate(80)(i => s"cl$i").mkString(" ")
    val rows = Seq(
      (0L, x, "en", "s0"),                       // chain A (canonical)
      (1L, x + " " + t1, "en", "s0"),            // chain B: ~A (sim ~0.94)
      (2L, x + " " + t1 + " " + t2, "en", "s0"), // chain C: ~B, not ~A
      (10L, clique, "en", "s0"), (11L, clique, "en", "s0"), (12L, clique, "en", "s0"))
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextQueries.q126.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(10L) === ((3L, 3L, 1000L, 1L)), "identical triple forms a clique")
    assert(out(0L) === ((3L, 2L, 666L, 2L)),
      s"drift chain: 3 nodes, A-B and B-C edges only, canonical ecc 2; got ${out.get(0L)}")
  }
}
