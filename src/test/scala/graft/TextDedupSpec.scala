package graft

import graft.text.TextQueries
import org.apache.spark.sql.functions._

/** End-to-end MinHash-LSH dedup (q48) semantics on the sf0.001 corpus:
  * banding → candidate join → Jaccard verify → connected components.
  * The fixture has pair-dups, a 3-chain and a 4-chain (docs 8-12-120-360
  * are mutual near-dups), so the min-label propagation must actually
  * iterate, not just copy the pair mins.
  */
class TextDedupSpec extends SparkTestBase {

  private lazy val out =
    TextQueries.q48.run(spark, "/root/testdata/sf0.001").cache()

  test("every document gets exactly one group row; kept = group representative") {
    assert(out.count() === 500)
    assert(out.where(col("doc_id") === col("group_id") && col("is_kept") === 0).count() === 0)
    assert(out.where(col("doc_id") =!= col("group_id") && col("is_kept") === 1).count() === 0)
    // representative is the component min: every group_id is itself kept
    val reps = out.select("group_id").distinct()
    val keptIds = out.where(col("is_kept") === 1).select(col("doc_id").as("group_id"))
    assert(reps.exceptAll(keptIds).count() === 0)
  }

  test("transitive 4-chain resolves to one group under the min id") {
    val grp = out.where(col("doc_id").isin(8, 12, 120, 360))
      .select("doc_id", "group_id", "is_kept", "group_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(grp.map(_._2).toSet === Set(8L), "all four docs share representative 8")
    assert(grp.map(_._4).toSet === Set(4L))
    assert(grp.map(g => g._1 -> g._3).toMap === Map(8L -> 1, 12L -> 0, 120L -> 0, 360L -> 0))
  }

  test("group sizes partition the corpus; no verified near-dup is kept twice") {
    val bySize = out.groupBy("group_size").agg(
      countDistinct("group_id").as("n_groups"), count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(bySize.map(t => t._1 * t._2).sum === 500, "sizes × groups cover all docs")
    val dropped = out.agg(sum(lit(1) - col("is_kept"))).collect()(0).getLong(0)
    assert(dropped === bySize.map(t => (t._1 - 1) * t._2).sum)
    assert(dropped > 0, "fixture contains near-dups")
  }

  test("q102: the sketch estimate brackets the true Jaccard on every candidate pair") {
    val cal = TextQueries.q102.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(cal.nonEmpty, "the LSH fixture must yield candidate pairs")
    for (((a, b), (n, est, tru, err)) <- cal) {
      assert(n >= 4L && n <= 16L,
        s"candidates share >= 1 band (4 components) and <= all 16: ($a,$b) has $n")
      assert(est === n / 16.0 && err === math.abs(est - tru),
        s"est/err must be the pinned arithmetic for ($a,$b)")
      assert(tru >= 0.0 && tru <= 1.0)
    }
    // the dedup 4-chain's direct near-dups calibrate tight: high
    // agreement AND high true Jaccard (est within 0.25 of truth)
    val chain = cal.filter { case ((a, b), _) =>
      Set(8L, 12L, 120L, 360L).contains(a) && Set(8L, 12L, 120L, 360L).contains(b) }
    assert(chain.nonEmpty, "the 4-chain must appear among candidates")
    for ((k, (_, est, tru, err)) <- chain)
      assert(tru >= 0.8 && err <= 0.25, s"chain pair $k: est $est vs true $tru")
  }

  test("q104: canonical ranking covers exactly the non-singleton q48 groups") {
    val rank = TextQueries.q104.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))
    val groups = out.where(col("group_size") > 1)
      .select("group_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rank.map(t => (t._1, t._2)).toSet === groups,
      "one ranked row per member of every multi-doc group, none else")
    for ((g, grp) <- rank.groupBy(_._1)) {
      assert(grp.map(_._4).sorted.toSeq === (1L to grp.length.toLong).toSeq,
        s"group $g ranks must be dense 1..sz")
      val canon = grp.filter(_._5 === 1)
      assert(canon.length === 1, s"group $g has exactly one canonical")
      assert(canon.head._3 === grp.map(_._3).max,
        s"group $g canonical carries the max degree")
      assert((canon.head._6 === 1) === (canon.head._2 !== g),
        s"group $g disagreement flag must mean canonical != min id")
    }
  }
}
