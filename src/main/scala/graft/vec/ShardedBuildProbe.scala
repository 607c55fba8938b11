package graft.vec

/** Extreme-scale graph-ANN BUILD receipt — the round-12 carryover the
  * serving-load receipt ([[ClServeProbe]]) deliberately left open: build
  * the full clustered-corpus k-NN graph at the 1000× scale (2 M vectors)
  * with the IVF-sharded NN-descent ([[ShardedGraphBuild]]) and audit the
  * recall it serves, against the [[VectorQueries.tunedConfig]] law's
  * extrapolation for this corpus size.
  *
  * Two configs are in play:
  *   - the BUILD runs at the law's config for the coarse-SUBCELL size
  *     (n / coarseK): sharded init means each node's neighborhood search
  *     is an in-subcell problem, so the subcell degree suffices;
  *   - the SERVE audit runs at the law's extrapolated beam/hops for the
  *     LABEL-cell size (n / labelCells) — the exploration budget the
  *     unsharded law would demand at this scale; this is the comparison
  *     point the receipt reports recall against.
  *
  * Usage:
  *   sbt "runMain graft.vec.ShardedBuildProbe <embeddingsDir> \
  *        [labelCells=10] [coarseK=64] [sample=16] [kAlt=8] [rounds=0]"
  * rounds=0 means "the law's round count" — but the law's rounds were
  * tuned for FULL-proposal refinement; ρ-sampled rounds carry ~18× fewer
  * proposals each, so the sampled build wants more of them (Dong et al.
  * report 4–6 iterations at the 1M scale). Prints one JSON line; wall
  * times are honest (includes centroid training, assignment, build,
  * checkpoint I/O). `graph_recall_at_6` is the BUILD-quality meter
  * (exact top-6 present among out-edges), `recall_at_6` the SERVED one.
  */
object ShardedBuildProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ShardedBuildProbe <embeddingsDir> [labelCells] [coarseK] [sample] [kAlt] [rounds]")
    val dir = args(0)
    val labelCells = if (args.length > 1) args(1).toInt else 10
    val coarseK = if (args.length > 2) args(2).toInt else 64
    val sample = if (args.length > 3) args(3).toInt else 16
    val kAlt = if (args.length > 4) args(4).toInt else 8
    val roundsArg = if (args.length > 5) args(5).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)

    val cl = VectorQueries.clEn(spark, dir)
    val n = cl.count()
    val sub = VectorQueries.tunedConfig(n, coarseK)     // build config
    val glob = VectorQueries.tunedConfig(n, labelCells) // serve/audit config

    val t0 = System.nanoTime()
    val cent = ShardedGraphBuild.coarseCentroids(
      cl, coarseK, math.max(1, (n / 100000L).toInt), 2)
    val tCent = (System.nanoTime() - t0) / 1e9

    val rounds = if (roundsArg > 0) roundsArg else sub.rounds
    // SPARK_GRAFT_SG_DEGREE overrides the law degree: the hybrid-serve
    // frontier points only need the graph for ROUTING (the cell scan
    // provides local completeness), and a lower degree keeps the build's
    // spill inside this box's ~95 G usable disk at small coarseK
    val degree = sys.env.get("SPARK_GRAFT_SG_DEGREE")
      .map(_.toInt).getOrElse(sub.degree)
    val t1 = System.nanoTime()
    val edges = ShardedGraphBuild.buildSharded(
      cl, cent, degree, kAlt, rounds, sample)
    val serve = ShardedGraphBuild.servingGraph(cl, edges, n, degree)
    val nEdges = serve.count()
    val tBuild = (System.nanoTime() - t1) / 1e9

    // build-quality meter: is the exact neighborhood IN the graph?
    val gRec = ShardedGraphBuild.graphRecall(cl, edges, 32, 6)
      .agg(org.apache.spark.sql.functions.avg("graph_recall")).first().getDouble(0)

    // recall floor: the standard 32-probe exact audit, served at the
    // law's extrapolated exploration budget for this corpus size
    val t2 = System.nanoTime()
    val audit = VectorQueries.clAudit(spark, dir, serve,
      glob.beam, glob.hops, 6).collect()
    val tAudit = (System.nanoTime() - t2) / 1e9
    val recall = audit.map(_.getAs[Double]("recall_k")).sum / audit.length
    val top1 = audit.map(_.getAs[Int]("top1_match").toDouble).sum / audit.length
    val meanV = audit.map(_.getAs[Long]("n_visited").toDouble).sum / audit.length

    // hybrid serve: beam routing ∪ exhaustive 2-probe cell scan (the
    // q44/q52 IVF leg) — local completeness on concentrated-distance
    // in-cluster geometry, still sublinear per query
    val t3 = System.nanoTime()
    val hyb = ShardedGraphBuild.hybridAudit(cl, serve, cent,
      glob.beam, glob.hops, 6).collect()
    val tHyb = (System.nanoTime() - t3) / 1e9
    val hRecall = hyb.map(_.getAs[Double]("recall_k")).sum / hyb.length
    val hTop1 = hyb.map(_.getAs[Int]("top1_match").toDouble).sum / hyb.length
    val hScored = hyb.map(_.getAs[Long]("n_scored").toDouble).sum / hyb.length

    println(f"""{"probe":"sharded_build","dir":"$dir","n":$n,""" +
      f""""label_cells":$labelCells,"coarse_k":$coarseK,"sample":$sample,"k_alt":$kAlt,""" +
      f""""build_config":[$degree,$rounds],"graph_recall_at_6":$gRec%.4f,""" +
      f""""serve_config":[${glob.beam},${glob.hops}],""" +
      f""""centroid_sec":$tCent%.1f,"build_sec":$tBuild%.1f,"audit_sec":$tAudit%.1f,""" +
      f""""serving_edges":$nEdges,""" +
      f""""recall_at_6":$recall%.4f,"top1":$top1%.4f,""" +
      f""""mean_visited":$meanV%.1f,"visited_frac":${meanV / n}%.5f,""" +
      f""""hybrid_sec":$tHyb%.1f,"hybrid_recall_at_6":$hRecall%.4f,""" +
      f""""hybrid_top1":$hTop1%.4f,"hybrid_mean_scored":$hScored%.1f,""" +
      f""""hybrid_scored_frac":${hScored / n}%.5f}""")
    spark.stop()
  }
}
