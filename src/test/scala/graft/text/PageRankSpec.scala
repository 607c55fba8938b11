package graft.text

import org.apache.spark.sql.functions._

/** q114 dedup-graph PageRank: the iterative integer rank fold is
  * re-verified in pure Scala from the same verified edge set (the edge
  * DERIVATION is already pinned by the q48-family oracle and
  * TextDedupSpec; what q114 adds — the 3-round damped power iteration
  * — is what this suite recomputes independently).
  */
class PageRankSpec extends graft.SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val edges: Array[(Long, Long)] =
    TextQueries.dedupEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private lazy val out = TextQueries.q114.run(spark, dir).cache()

  test("q114: 3-round integer power iteration matches a pure-Scala fold") {
    val esym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val outdeg = esym.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var rank: Map[Long, Long] = outdeg.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to 3) {
      val in = esym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum
      }
      rank = in.map { case (n, s) => n -> (150000L + 850L * s / 1000L) }.toMap
    }
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "fixture dedup graph is non-empty")
    assert(got.map(_._1).toSet === rank.keySet)
    got.foreach { case (id, _, deg, r) =>
      assert(deg === outdeg(id), s"doc $id outdeg")
      assert(r === rank(id), s"doc $id rank")
    }
  }

  test("q114: regular components sit at the 1e6 fixed point, stars diverge") {
    // in a d-regular component the integer update has exact fixed point
    // 1e6: contribution 1e6/d per edge, d of them, 150000+850000 = 1e6
    val esym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val outdeg = esym.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val byComp = out.collect().map(r =>
      (r.getLong(1), r.getLong(0), r.getLong(3)))
      .groupBy(_._1)
    byComp.foreach { case (_, members) =>
      val degs = members.map(m => outdeg(m._2)).toSet
      // exact only when d divides 1e6 (otherwise the floor drips mass:
      // a triangle loses 1 permicro per round)
      if (degs.size == 1 && 1000000L % degs.head == 0L)
        assert(members.forall(_._3 == 1000000L),
          s"regular component must hold the fixed point: $members")
    }
    assert(out.where(col("rank_e6") < 150000L).count() === 0)
  }
}
