package graft

import graft.text.TextQueries
import graft.vec.VectorQueries

/** Round-10 operator properties the oracle cannot see.
  *
  *   - q173 must LINK like q169 (comparable blocking recall through a
  *     completely different blocking scheme) while holding its
  *     constructive candidate bound — the property that makes it the
  *     scale-safe twin.
  *   - The q168 tuned-config LAW must reproduce the measured sweep's
  *     operating points exactly and behave sanely between/beyond them.
  *     The law-derived recall floors at the 1×/10× cell sizes are
  *     receipts in PERF.md (run via [[graft.vec.ClTunedProbe]] at
  *     local[32] — a 20 k-node NN-descent build is minutes of wall in
  *     this 4-thread suite, so the suite pins the law and the gate-SF
  *     floor, not the 10× build).
  */
class Round10OpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q173: rank-windowed blocking links like q169 with bounded candidates") {
    val df = SparkEntry.queries("q173_record_linkage_snm")(spark, dir)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.nonEmpty)
    // the constructive scale bound: ≤ 2(W−1) clean neighbors per pass,
    // two passes — no record can see more candidates than that,
    // whatever N is. (q169 has no such bound; that asymmetry is the
    // whole point of the twin.)
    val cap = 2L * 2 * (TextQueries.SnmLinkW - 1)
    rows.foreach { r =>
      val nc = r.getAs[Long]("n_cand")
      assert(nc >= 1L && nc <= cap, s"n_cand $nc outside [1, $cap]")
      val jw = r.getAs[Double]("best_jw")
      assert(jw >= 0.0 && jw <= 1.0)
      assert(r.getAs[Int]("strong") === (if (jw >= 0.88) 1 else 0))
    }
    def rate(c: String) = rows.map(_.getAs[Int](c).toDouble).sum / rows.size
    // recall comparable to the fixed-alphabet leg: q169 measures
    // 0.96/0.95 at this SF, q173 must stay in the same band — the twin
    // is only a twin if the scale-safe blocking still finds the links
    assert(rate("self_match") >= 0.85, s"self-match rate ${rate("self_match")} too low")
    assert(rate("strong") >= 0.85, s"strong-match rate ${rate("strong")} too low")
    // and it must cover (nearly) the same dirty population as q169:
    // rank windows can only drop a record entirely if BOTH sort passes
    // isolate it, which the corruption model makes rare
    val q169n = {
      val d = SparkEntry.queries("q169_record_linkage")(spark, dir)
      val n = d.count(); d.unpersist(); n
    }
    assert(rows.size >= (q169n * 95) / 100,
      s"q173 resolved ${rows.size} dirty records vs q169's $q169n — coverage dropped")
  }

  test("q172 SON body at a non-gate threshold equals the brute-force lattice") {
    // 50 % support exercises a different phase-1 partition threshold and
    // the round-10 global-L1 refinement path (exact single counts +
    // anti-monotone pruning before the containment scan); the oracle
    // gate only ever sees 60 %
    val out = TextQueries.sonItemsets(spark, dir, 1, 2).collect()
      .map(r => (r.getAs[String]("itemset"), r.getAs[Long]("support"))).toMap
    val baskets = Tables(spark, dir, "documents")
      .selectExpr("array_sort(array_distinct(split(trim(lower(text)), ' '))) AS items")
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("items")) > 0)
      .collect().map(_.getSeq[String](0).toIndexedSeq)
    val minsup = (baskets.length + 1) / 2
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    def bump(k: String): Unit = counts.update(k, counts.getOrElse(k, 0L) + 1L)
    baskets.foreach { b =>
      for (i <- b.indices) {
        bump(b(i))
        for (j <- i + 1 until b.size) {
          bump(s"${b(i)},${b(j)}")
          for (k <- j + 1 until b.size) bump(s"${b(i)},${b(j)},${b(k)}")
        }
      }
    }
    val expect = counts.filter(_._2 >= minsup).toMap
    assert(out === expect,
      s"SON answer (${out.size} itemsets) != brute force (${expect.size})")
    assert(expect.exists(_._1.count(_ == ',') == 2),
      "the fixture must exercise triples at this threshold")
  }

  test("q168 tuned-config law reproduces the measured sweep anchors exactly") {
    import VectorQueries.{tunedConfig, ClConfig}
    // the three swept operating points (PERF.md round 9): cell size
    // 200 / 2,000 / 20,000 with 10 label cells
    assert(tunedConfig(2000, 10) === ClConfig(16, 1, 12, 4))
    assert(tunedConfig(20000, 10) === ClConfig(24, 2, 16, 5))
    assert(tunedConfig(200000, 10) === ClConfig(32, 2, 48, 10))
    // below the first anchor the gate config clamps (it is already past
    // its recall ceiling at smaller cells — sf0.001 measures 0.995)
    assert(tunedConfig(500, 10) === ClConfig(16, 1, 12, 4))
    // the law depends on cell size, not raw N
    assert(tunedConfig(20000, 10) === tunedConfig(2000, 1))
    // beyond the last anchor every knob keeps growing (the last
    // segment's slope extends): a 1000× corpus must not be served with
    // the 100× exploration budget
    val c100 = tunedConfig(2000000, 10)
    val c1000 = tunedConfig(20000000, 10)
    assert(c1000.degree > c100.degree && c1000.beam > c100.beam &&
      c1000.hops > c100.hops)
    // monotone non-decreasing in cell size across a sweep of scales
    val sweep = Seq(1000L, 5000L, 20000L, 80000L, 400000L, 2000000L)
      .map(n => tunedConfig(n, 10))
    sweep.sliding(2).foreach { case Seq(a, b) =>
      assert(b.degree >= a.degree && b.beam >= a.beam && b.hops >= a.hops &&
        b.rounds >= a.rounds, s"non-monotone step $a -> $b")
    }
  }

  test("q168 law-derived config serves the gate corpus at its recall floor") {
    import VectorQueries.tunedConfig
    // end-to-end through the SAME entry points the sweep used, with the
    // config DERIVED from the law rather than hard-coded: at sf0.001
    // (500 vectors, 10 cells) the law clamps to the gate config, and
    // the audit must clear the same 0.8 floor q168 is pinned to
    val cfg = tunedConfig(500, 10)
    val edges = VectorQueries.clGraphTuned(spark, dir, cfg.degree, cfg.rounds)
    val df = VectorQueries.clAudit(spark, dir, edges, cfg.beam, cfg.hops, 6)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.size === 32)
    val meanRecall = rows.map(_.getAs[Double]("recall_k")).sum / rows.size
    assert(meanRecall >= 0.8, s"law-derived config recall $meanRecall below 0.8")
  }
}
