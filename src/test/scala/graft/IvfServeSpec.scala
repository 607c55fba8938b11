package graft

import graft.vec.{IvfServe, ShardedGraphBuild, VectorQueries}
import org.apache.spark.sql.functions._

/** Multi-probe IVF serving ([[graft.vec.IvfServe]]): the nprobe
  * generalization of the assignOrd best/runner-up pair, and the audited
  * sweep behind the round-15 2 M-vector serving receipts.
  *
  * The load-bearing oracle is COMPLETENESS: probing all K cells scans
  * the whole corpus, so recall@k must be exactly 1 — the sweep collapses
  * to brute force by construction, no statistical floor needed. The
  * remaining cases pin ordering consistency with assignOrd, recall
  * monotonicity in nprobe, cost monotonicity, and partition invariance.
  */
class IvfServeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def cl = VectorQueries.clEn(spark, dir)

  private lazy val cent = ShardedGraphBuild.coarseCentroids(cl, 8, 1, 2)

  test("probeCells(2) agrees with assignOrd best + runner-up") {
    val pc = IvfServe.probeCells(cl.select("vec_id", "embedding"), cent, 2)
      .select(col("vec_id"), element_at(col("pcells"), 1).as("c1"),
        element_at(col("pcells"), 2).as("c2"))
    val ao = ShardedGraphBuild.assignOrd(
      cl.select("vec_id", "embedding"), cent, second = true)
      .select("vec_id", "cell", "cell2")
    val diff = pc.join(ao, "vec_id")
      .filter(col("c1") =!= col("cell") || col("c2") =!= col("cell2"))
      .count()
    assert(diff === 0L, "probeCells top-2 must equal assignOrd (cell, cell2)")
  }

  test("completeness: nprobe = K serves the exact brute-force top-k") {
    val sweep = IvfServe.ivfSweepAudit(cl, cent, Seq(8), rk = 6, nProbes = 16)
    val (p, recall, top1, scored) = sweep.head
    assert(p === 8)
    assert(recall === 1.0, f"nprobe=K must be exact, got $recall%.4f")
    assert(top1 === 1.0)
    // every cell probed -> every other vector scored exactly once
    assert(scored === (cl.count() - 1).toDouble)
  }

  test("recall and cost are monotone in nprobe; partial probes are sublinear") {
    val sweep = IvfServe.ivfSweepAudit(cl, cent, Seq(1, 2, 4, 8), rk = 6, nProbes = 16)
    val recalls = sweep.map(_._2)
    val costs = sweep.map(_._4)
    assert(recalls === recalls.sorted, s"recall must not fall as nprobe grows: $recalls")
    assert(costs === costs.sorted, s"scored count must grow with nprobe: $costs")
    val n = cl.count().toDouble
    assert(costs.head < n / 2,
      f"nprobe=1 must score a strict corpus subset (${costs.head}%.0f of $n%.0f)")
    info(sweep.map { case (p, r, t, c) =>
      f"nprobe=$p recall@6=$r%.3f top1=$t%.3f scored=$c%.0f" }.mkString("; "))
  }

  test("sweep is partition-invariant") {
    val a = IvfServe.ivfSweepAudit(cl, cent, Seq(1, 4), rk = 6, nProbes = 16)
    val b = IvfServe.ivfSweepAudit(cl.repartition(7), cent, Seq(1, 4),
      rk = 6, nProbes = 16)
    assert(a === b)
  }
}
