package graft

import org.apache.spark.sql.functions._

/** q160 NN-descent k-NN graph: the properties the oracle can't see.
  *
  * The oracle pins the exact output values; this spec pins the CLAIMS
  * behind them — that the neighbor-of-neighbor rounds genuinely refine
  * the graph (recall strictly improves over the hash init), that the
  * audit contract holds shape-wise (one row per probe, recall bounded
  * by the degree), and that the whole build is deterministic across
  * runs within a session.
  */
class NnDescentSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def recallFrame(rounds: Int) = {
    val df = vec.VectorQueries.nnDescentRecall(spark, dir, rounds)
    val rows = df.collect().toIndexedSeq
    df.unpersist() // presentSorted cached it; don't leak across tests
    rows
  }

  test("refinement: 2 NN-descent rounds strictly beat the hash init") {
    val init = recallFrame(0)
    val refined = recallFrame(2)
    assert(init.size === 32 && refined.size === 32, "one audit row per probe")
    def mean(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Double]("recall_k")).sum / rows.size
    val (m0, m2) = (mean(init), mean(refined))
    assert(m2 > m0,
      s"neighbor-of-neighbor rounds must improve recall (init $m0, refined $m2)")
    // the init is a uniform hash draw: expected recall ≈ K/N ≈ 0.012 —
    // anything ≥ 0.2 after refinement means the descent is really
    // climbing the similarity structure, not shuffling noise
    assert(m2 >= 0.2, s"refined recall $m2 implausibly low")
  }

  test("audit shape: recall bounded by degree, hits consistent") {
    val rows = recallFrame(2)
    rows.foreach { r =>
      val nHit = r.getAs[Long]("n_hit")
      assert(nHit >= 0 && nHit <= 6, s"n_hit $nHit outside [0, K]")
      assert(math.abs(r.getAs[Double]("recall_k") - nHit / 6.0) < 1e-15)
      val t1 = r.getAs[Int]("top1_match")
      assert(t1 === 0 || t1 === 1)
      if (t1 === 1)
        assert(r.getAs[Long]("graph_top1") === r.getAs[Long]("exact_top1"))
    }
  }

  test("determinism: two builds in one session are value-identical") {
    val a = recallFrame(2).map(_.toSeq)
    val b = recallFrame(2).map(_.toSeq)
    assert(a === b, "md5 init + ordered-fold distances must make the graph reproducible")
  }

  test("q161 beam search: visited set bounded, found distance never beats exact") {
    val df = SparkEntry.queries("q161_graph_beam_search")(spark, dir)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.size === 32, "one row per probe")
    // V grows by at most beam·degree per hop from the single entry node
    val cap = 1 + 4 * 6 * 3
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_visited")
      assert(nv >= 1 && nv <= cap, s"n_visited $nv outside [1, $cap]")
      val ratio = r.getAs[Any]("dist_ratio_permille")
      if (ratio != null)
        assert(ratio.asInstanceOf[Long] >= 1000L,
          "beam result cannot be closer than the exact nearest neighbor")
      if (r.getAs[Int]("top1_match") === 1 && ratio != null)
        assert(ratio.asInstanceOf[Long] === 1000L)
    }
    // the efficiency claim behind graph ANN: the traversal touches a
    // bounded neighborhood, not the corpus (500 nodes at sf0.001)
    val meanVisited = rows.map(_.getAs[Long]("n_visited")).sum.toDouble / rows.size
    assert(meanVisited < 100, s"mean visited $meanVisited should be ≪ corpus size")
  }

  test("q166 insert audit: batch shape, bounded traversal, recall consistency") {
    val df = SparkEntry.queries("q166_graph_insert_audit")(spark, dir)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.size === 32, "one row per audited insert")
    // base cut at sf0.001: b = 450 — inserts are ids 450..481
    assert(rows.map(_.getAs[Long]("q_id")).toSet === (450L until 482L).toSet)
    val cap = 1 + 4 * 6 * 3
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_top1") < 450L &&
        r.getAs[Long]("ins_top1") < 450L,
        "discovered and true neighbors must come from the BASE partition")
      val nv = r.getAs[Long]("n_visited")
      assert(nv >= 1 && nv <= cap)
      val nh = r.getAs[Long]("n_hit")
      assert(nh >= 0 && nh <= 6)
      assert(math.abs(r.getAs[Double]("recall_k") - nh / 6.0) < 1e-15)
    }
  }

  test("q168 clustered operating point: recall earns the index, visited ≪ brute force") {
    val df = SparkEntry.queries("q168_graph_ann_clustered")(spark, dir)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.size === 32, "one audit row per probe")
    val meanRecall = rows.map(_.getAs[Double]("recall_k")).sum / rows.size
    // the point of the query: on clustered geometry the SAME machinery
    // that audited ≈0.1 recall on the uniform corpus serves ≥0.8 — the
    // floor is regression slack under the 0.99 measured at this SF
    assert(meanRecall >= 0.8, s"operating-point recall $meanRecall below the 0.8 bar")
    val n = 500L // sf0.001 embeddings cardinality
    rows.foreach { r =>
      val vis = r.getAs[Long]("n_visited")
      assert(vis < n, s"visited $vis must stay below brute-force $n")
      // bounded by construction: entry + beam·degree·hops expansions
      assert(vis <= 1 + 12L * 32 * 4, s"visited $vis exceeds the B·deg·H bound")
    }
  }

  test("q165 label propagation: communities partition the node set") {
    val df = SparkEntry.queries("q165_knn_label_propagation")(spark, dir)
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    val n = 500L // sf0.001 embeddings cardinality
    assert(rows.map(_.getAs[Long]("n_members")).sum === n,
      "every node must land in exactly one community")
    assert(rows.size > 1 && rows.size < n,
      s"${rows.size} communities: propagation must neither collapse to one nor stay fully fragmented")
    rows.foreach { r =>
      val (c, lo, hi) = (r.getAs[Long]("community"),
        r.getAs[Long]("min_node"), r.getAs[Long]("max_node"))
      assert(c >= 0 && c < n && lo <= hi,
        "community ids are node ids; member ranges must be well-formed")
    }
  }
}
