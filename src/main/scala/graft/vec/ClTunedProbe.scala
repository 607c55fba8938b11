package graft.vec

/** Receipt runner for the q168 tuned-config LAW
  * ([[VectorQueries.tunedConfig]]): derives the operating point from
  * (corpus size, cell count), builds the clustered serving graph and
  * runs the exact-audited beam serve through the SAME entry points the
  * round-9 sweep used, and prints one JSON line with the law-derived
  * config and the measured recall/top-1/visited numbers. PERF.md's
  * law-floor receipts at 1× and 10× cell size come from this main (the
  * 10× build is a 20 k-node NN-descent — minutes of wall, which is why
  * the ScalaTest suite pins the law's anchors and the gate-SF floor
  * instead of rebuilding at 10× per test run).
  *
  * Usage:
  *   sbt "runMain graft.vec.ClTunedProbe <embeddingsDir> [cells]"
  * where <embeddingsDir> holds embeddings.parquet (a driver sf dir or a
  * ScaleBench target/scaleN dir) and cells defaults to the corpus's 10
  * labels.
  */
object ClTunedProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClTunedProbe <embeddingsDir> [cells]")
    val dir = args(0)
    val cells = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)
    val n = graft.Tables(spark, dir, "embeddings").count()
    val cfg = VectorQueries.tunedConfig(n, cells)
    val t0 = System.nanoTime()
    val edges = VectorQueries.clGraphTuned(spark, dir, cfg.degree, cfg.rounds)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val rows = VectorQueries.clAudit(spark, dir, edges, cfg.beam, cfg.hops, 6)
      .collect()
    val tAll = (System.nanoTime() - t0) / 1e9
    val recall = rows.map(_.getAs[Double]("recall_k")).sum / rows.length
    val top1 = rows.map(_.getAs[Int]("top1_match").toDouble).sum / rows.length
    val visited = rows.map(_.getAs[Long]("n_visited").toDouble).sum / rows.length
    println(f"""{"probe":"cl_tuned","dir":"$dir","n":$n,"cells":$cells,""" +
      f""""config":[${cfg.degree},${cfg.rounds},${cfg.beam},${cfg.hops}],""" +
      f""""recall_at_6":$recall%.4f,"top1":$top1%.4f,"mean_visited":$visited%.1f,""" +
      f""""visited_frac":${visited / n}%.4f,"build_sec":$tBuild%.1f,"total_sec":$tAll%.1f}""")
    spark.stop()
  }
}
