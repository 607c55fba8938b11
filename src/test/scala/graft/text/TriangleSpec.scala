package graft.text

import org.apache.spark.sql.functions._

/** q177 triangle count re-verified brute-force in pure Scala from the
  * same verified edge set (the edge derivation is pinned by the
  * q48-family oracle and TextDedupSpec; what q177 adds — degree-ordered
  * wedge enumeration — is what this suite recomputes independently, by
  * direct neighbor-set intersection with no orientation at all).
  */
class TriangleSpec extends graft.SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q177: degree-ordered enumeration matches brute-force neighbor intersection") {
    val out = graft.SparkEntry.queries("q177_dup_graph_triangles")(spark, dir)
      .collect().toIndexedSeq
    val edges = TextQueries.dedupEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
    // brute force: adjacency sets, count each triangle once via a<b<c
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteTotal = edges.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b) // a < b < c: edge gives a<b
    }.sum
    assert(out.map(_.getAs[Long]("n_triangles")).sum === bruteTotal.toLong)
    // per-group wedge identity and transitivity bounds
    val labels = TextQueries.dedupGroups(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    val wedgeByG = adj.toSeq.groupBy { case (n, _) => labels(n) }
      .view.mapValues(_.map { case (_, ns) => ns.size.toLong * (ns.size - 1) / 2 }.sum).toMap
    out.foreach { r =>
      val g = r.getAs[Long]("group_id")
      assert(r.getAs[Long]("n_wedges") === wedgeByG(g))
      val t = r.getAs[Long]("n_triangles")
      val n = r.getAs[Long]("n_nodes")
      assert(t <= n * (n - 1) * (n - 2) / 6)
      Option(r.getAs[java.lang.Long]("transitivity_permille")).foreach { tp =>
        assert(tp >= 0L && tp <= 1000L)
      }
    }
    // the audit must actually see triangles at this SF (near-dup groups
    // of identical docs are cliques) — otherwise the test is vacuous
    assert(bruteTotal > 0, "fixture produced no triangles — fixture drift?")
  }
}
