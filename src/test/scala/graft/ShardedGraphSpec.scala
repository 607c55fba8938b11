package graft

import graft.vec.{ShardedGraphBuild, VectorQueries}
import org.apache.spark.sql.functions._

/** IVF-sharded NN-descent build (the 1000×-scale graph-ANN build path):
  * determinism, degree bound, boundary stitch, and a serving-recall
  * floor on the clustered sf0.001 corpus — plus the coarse-codebook
  * edge cases (K=1 degenerate stitch).
  */
class ShardedGraphSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def cl = VectorQueries.clEn(spark, dir)

  private lazy val cent = ShardedGraphBuild.coarseCentroids(cl, 4, 1, 2)

  private def buildOnce() =
    ShardedGraphBuild.buildSharded(cl, cent, k = 8, kAlt = 2,
      rounds = 1, sample = 6)

  test("build is deterministic: two runs produce the identical graph") {
    val a = buildOnce().orderBy("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = buildOnce().orderBy("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("degree bound holds and every node has an edge list") {
    val edges = buildOnce()
    val n = cl.count()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    assert(deg.count() === n, "every node must keep a neighbor list")
    val maxDeg = deg.agg(max("d")).first().getLong(0)
    assert(maxDeg <= 8, s"out-degree $maxDeg exceeds k=8")
  }

  test("boundary stitch: the refined graph carries cross-cell edges") {
    val edges = buildOnce()
    val cells = ShardedGraphBuild.assignOrd(
      cl.select("vec_id", "embedding"), cent).select("vec_id", "cell")
    val xc = edges
      .join(cells.select(col("vec_id").as("src"), col("cell").as("sc")), "src")
      .join(cells.select(col("vec_id").as("nbr"), col("cell").as("nc")), "nbr")
      .filter(col("sc") =!= col("nc")).count()
    assert(xc > 0, "sharded build must not be a disjoint union of cell islands")
  }

  test("serving recall on the clustered corpus clears the q168-class floor") {
    val edges = buildOnce()
    val n = cl.count()
    val serve = ShardedGraphBuild.servingGraph(cl, edges, n, kRand = 8)
    val audit = VectorQueries.clAudit(spark, dir, serve,
      beam = 12, hops = 4, rk = 6).collect()
    val recall = audit.map(_.getAs[Double]("recall_k")).sum / audit.length
    val top1 = audit.map(_.getAs[Int]("top1_match").toDouble).sum / audit.length
    info(f"sharded recall@6=$recall%.4f top1=$top1%.4f over ${audit.length} probes")
    assert(audit.length === 32)
    assert(recall >= 0.80, f"recall@6 $recall%.4f below the 0.80 floor")
    assert(top1 >= 0.90, f"top-1 $top1%.4f below the 0.90 floor")
  }

  test("hybrid serve (beam ∪ 2-probe cell scan) dominates beam-only recall") {
    val edges = buildOnce()
    val n = cl.count()
    val serve = ShardedGraphBuild.servingGraph(cl, edges, n, kRand = 8)
    val beamOnly = VectorQueries.clAudit(spark, dir, serve,
      beam = 12, hops = 4, rk = 6).collect()
    val hyb = ShardedGraphBuild.hybridAudit(cl, serve, cent,
      beam = 12, hops = 4, rk = 6).collect()
    val rBeam = beamOnly.map(_.getAs[Double]("recall_k")).sum / beamOnly.length
    val rHyb = hyb.map(_.getAs[Double]("recall_k")).sum / hyb.length
    val top1 = hyb.map(_.getAs[Int]("top1_match").toDouble).sum / hyb.length
    info(f"recall@6 beam-only=$rBeam%.4f hybrid=$rHyb%.4f hybrid-top1=$top1%.4f")
    assert(hyb.length === 32)
    assert(rHyb >= rBeam - 1e-12,
      "adding the exhaustive own-cell scan must never lose recall")
    assert(rHyb >= 0.95, f"hybrid recall@6 $rHyb%.4f below the 0.95 floor")
    assert(top1 === 1.0,
      "top-1 must be exact: the true nearest neighbor is either in the " +
        "probe's cell/runner-up (scanned exactly) or found by the beam here")
  }

  test("LSH-init build: deterministic, degree-bounded, build quality ≥ in-cell init") {
    def lshOnce() = ShardedGraphBuild.buildLshInit(cl, cent, k = 8, kAlt = 2,
      rounds = 1, sample = 6, bands = 4, bits = 8, j = 4)
    val a = lshOnce().orderBy("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = lshOnce().orderBy("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.nonEmpty && a.toSeq === b.toSeq, "LSH-init build must be deterministic")
    val edges = lshOnce()
    val maxDeg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).first().getLong(0)
    assert(maxDeg <= 8, s"out-degree $maxDeg exceeds k=8")
    def gRec(e: org.apache.spark.sql.DataFrame) =
      ShardedGraphBuild.graphRecall(cl, e, 32, 6)
        .agg(avg("graph_recall")).first().getDouble(0)
    val (gLsh, gCell) = (gRec(edges), gRec(buildOnce()))
    info(f"graph_recall@6: lsh-init=$gLsh%.4f in-cell-init=$gCell%.4f")
    assert(gLsh >= gCell - 1e-12,
      f"bucket-granular init must not build a worse graph ($gLsh%.4f < $gCell%.4f)")
  }

  test("K=1 codebook degenerates cleanly: stitch folds into in-cell draws") {
    val c1 = ShardedGraphBuild.coarseCentroids(cl, 1, 1, 1)
    val edges = ShardedGraphBuild.buildSharded(cl, c1, k = 6, kAlt = 2,
      rounds = 0, sample = 4)
    assert(edges.count() > 0)
    val assigned = ShardedGraphBuild.assignOrd(
      cl.select("vec_id", "embedding"), c1, second = true)
    val cells = assigned.select("cell", "cell2").distinct().collect()
    assert(cells.length === 1 && cells(0).getLong(0) === cells(0).getLong(1))
  }

  test("empty runner-up cell drops its draws instead of raising (ANSI map lookup)") {
    // hand the build a codebook whose second centroid is so remote that
    // NO vector assigns to it — every node's runner-up is then the empty
    // cell, and under ANSI mode a plain element_at(map, key) on the
    // cell-size map would raise MAP_KEY_DOES_NOT_EXIST mid-build
    val s = spark
    import s.implicits._
    val far = Seq((0L, Seq.fill(64)(0.5)), (1L, Seq.fill(64)(1.0e9)))
      .toDF("cid", "cvec")
    val edges = ShardedGraphBuild.buildSharded(cl, far, k = 6, kAlt = 3,
      rounds = 0, sample = 4)
    assert(edges.count() > 0)
    val assigned = ShardedGraphBuild.assignOrd(
      cl.select("vec_id", "embedding"), far, second = true)
    assert(assigned.filter(col("cell") === 1L).count() === 0,
      "the remote centroid must win nothing for this test to bite")
    assert(assigned.filter(col("cell2") === 1L).count() > 0,
      "every node's runner-up must be the empty cell")
  }

  test("sampled refinement never regresses a neighbor list (monotone d2)") {
    // per-node comparison, restricted to nodes with FULL k-lists in both
    // builds: a short init list (hash-draw collisions) may legitimately
    // GAIN edges during refinement, raising its sum while improving
    val refined = buildOnce() // rounds = 1
    val init = ShardedGraphBuild.buildSharded(cl, cent, k = 8, kAlt = 2,
      rounds = 0, sample = 6)
    def perNode(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("src").agg(count(lit(1)).as("n"), sum("d2").as("s"))
    val joined = perNode(init).as("a")
      .join(perNode(refined).as("b"), "src")
      .filter(col("a.n") === 8 && col("b.n") === 8)
    val total = joined.count()
    val regressed = joined.filter(col("b.s") > col("a.s") + lit(1e-9)).count()
    info(s"full-list nodes compared: $total, regressed: $regressed")
    assert(total > 0)
    assert(regressed === 0L,
      "refinement must not worsen any full neighbor list's d2 mass")
  }
}
