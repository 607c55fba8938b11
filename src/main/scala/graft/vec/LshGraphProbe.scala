package graft.vec

/** Receipt main for the LSH-init sharded graph build
  * ([[ShardedGraphBuild.buildLshInit]]) — the round-15 answer to the
  * percopy 2 M build-quality gap (graph_recall 0.068 with in-cell
  * random init): does bucket-granular init restore BUILD quality
  * (exact neighborhood present among out-edges) at the same refinement
  * budget, and what does the serving stack then deliver?
  *
  * Usage:
  *   tools/run_main.sh graft.vec.LshGraphProbe <embeddingsDir> \
  *     [labelCells=10000] [coarseK=256] [degree=16] [rounds=1] \
  *     [sample=16] [kAlt=8] [bands=4] [bits=16] [j=4]
  * Prints one JSON line (same fields as ShardedBuildProbe plus the LSH
  * init config).
  */
object LshGraphProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: LshGraphProbe <embeddingsDir> [labelCells] [coarseK] [degree] " +
        "[rounds] [sample] [kAlt] [bands] [bits] [j]")
    val dir = args(0)
    def arg(i: Int, dflt: Int) = if (args.length > i) args(i).toInt else dflt
    val labelCells = arg(1, 10000)
    val coarseK = arg(2, 256)
    val degree = arg(3, 16)
    val rounds = arg(4, 1)
    val sample = arg(5, 16)
    val kAlt = arg(6, 8)
    val bands = arg(7, 4)
    val bits = arg(8, 16)
    val j = arg(9, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)

    val cl = VectorQueries.clEn(spark, dir)
    val n = cl.count()
    val glob = VectorQueries.tunedConfig(n, labelCells)

    val t0 = System.nanoTime()
    val cent = ShardedGraphBuild.coarseCentroids(
      cl, coarseK, math.max(1, (n / 100000L).toInt), 2)
    val tCent = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val edges = ShardedGraphBuild.buildLshInit(
      cl, cent, degree, kAlt, rounds, sample, bands, bits, j)
    val serve = ShardedGraphBuild.servingGraph(cl, edges, n, degree)
    val nEdges = serve.count()
    val tBuild = (System.nanoTime() - t1) / 1e9

    val gRec = ShardedGraphBuild.graphRecall(cl, edges, 32, 6)
      .agg(org.apache.spark.sql.functions.avg("graph_recall")).first().getDouble(0)

    val t2 = System.nanoTime()
    val audit = VectorQueries.clAudit(spark, dir, serve,
      glob.beam, glob.hops, 6).collect()
    val tAudit = (System.nanoTime() - t2) / 1e9
    val recall = audit.map(_.getAs[Double]("recall_k")).sum / audit.length
    val top1 = audit.map(_.getAs[Int]("top1_match").toDouble).sum / audit.length
    val meanV = audit.map(_.getAs[Long]("n_visited").toDouble).sum / audit.length

    val t3 = System.nanoTime()
    val hyb = ShardedGraphBuild.hybridAudit(cl, serve, cent,
      glob.beam, glob.hops, 6).collect()
    val tHyb = (System.nanoTime() - t3) / 1e9
    val hRecall = hyb.map(_.getAs[Double]("recall_k")).sum / hyb.length
    val hTop1 = hyb.map(_.getAs[Int]("top1_match").toDouble).sum / hyb.length
    val hScored = hyb.map(_.getAs[Long]("n_scored").toDouble).sum / hyb.length

    println(f"""{"probe":"lsh_graph_build","dir":"$dir","n":$n,""" +
      f""""label_cells":$labelCells,"coarse_k":$coarseK,"sample":$sample,"k_alt":$kAlt,""" +
      f""""lsh":[$bands,$bits,$j],"build_config":[$degree,$rounds],""" +
      f""""graph_recall_at_6":$gRec%.4f,"serve_config":[${glob.beam},${glob.hops}],""" +
      f""""centroid_sec":$tCent%.1f,"build_sec":$tBuild%.1f,"audit_sec":$tAudit%.1f,""" +
      f""""serving_edges":$nEdges,"recall_at_6":$recall%.4f,"top1":$top1%.4f,""" +
      f""""mean_visited":$meanV%.1f,"visited_frac":${meanV / n}%.5f,""" +
      f""""hybrid_sec":$tHyb%.1f,"hybrid_recall_at_6":$hRecall%.4f,""" +
      f""""hybrid_top1":$hTop1%.4f,"hybrid_mean_scored":$hScored%.1f,""" +
      f""""hybrid_scored_frac":${hScored / n}%.5f}""")
    spark.stop()
  }
}
