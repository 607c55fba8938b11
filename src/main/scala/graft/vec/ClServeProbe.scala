package graft.vec

/** Serving-load receipt for the q168 tuned-config law — the round-12
  * extension of [[ClTunedProbe]]: build the clustered serving graph at
  * the law-derived config ONCE, pin the recall floor with the standard
  * 32-probe exact audit, then drive a query LOAD of `loadFactor × 32`
  * probes through the same beam serve and report wall, queries/sec and
  * visited statistics. The exact brute-force leg deliberately stays at
  * the 32-probe audit: at fleet-scale loads it is O(queries × corpus)
  * and would dwarf the serving cost it audits — recall is a property of
  * the (graph, config), not of the load.
  *
  * Usage:
  *   sbt "runMain graft.vec.ClServeProbe <embeddingsDir> [cells] [loadFactor]"
  * loadFactor defaults to 100 (3,200 queries); the 1000× receipt runs
  * with loadFactor=1000 (32,000 queries).
  */
object ClServeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClServeProbe <embeddingsDir> [cells] [loadFactor]")
    val dir = args(0)
    val cells = if (args.length > 1) args(1).toInt else 10
    val loadFactor = if (args.length > 2) args(2).toLong else 100L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)
    val n = graft.Tables(spark, dir, "embeddings").count()
    val cfg = VectorQueries.tunedConfig(n, cells)
    val t0 = System.nanoTime()
    val edges = VectorQueries.clGraphTuned(spark, dir, cfg.degree, cfg.rounds)
    val tBuild = (System.nanoTime() - t0) / 1e9
    // recall floor: the fixed 32-probe exact audit (same as ClTunedProbe)
    val audit = VectorQueries.clAudit(spark, dir, edges, cfg.beam, cfg.hops, 6)
      .collect()
    val recall = audit.map(_.getAs[Double]("recall_k")).sum / audit.length
    val top1 = audit.map(_.getAs[Int]("top1_match").toDouble).sum / audit.length
    // the load: loadFactor × the audit's 32 probes, visited stats only
    val nQ = 32L * loadFactor
    val t1 = System.nanoTime()
    val stats = VectorQueries.clServeLoad(spark, dir, edges, cfg.beam, cfg.hops, nQ)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("nq"),
        org.apache.spark.sql.functions.avg("n_visited").as("mean_v"),
        org.apache.spark.sql.functions.max("n_visited").as("max_v"))
      .collect()(0)
    val tServe = (System.nanoTime() - t1) / 1e9
    val served = stats.getAs[Long]("nq")
    println(f"""{"probe":"cl_serve","dir":"$dir","n":$n,"cells":$cells,""" +
      f""""config":[${cfg.degree},${cfg.rounds},${cfg.beam},${cfg.hops}],""" +
      f""""recall_at_6":$recall%.4f,"top1":$top1%.4f,"build_sec":$tBuild%.1f,""" +
      f""""load_queries":$served,"serve_sec":$tServe%.1f,""" +
      f""""qps":${served / math.max(tServe, 1e-9)}%.1f,""" +
      f""""mean_visited":${stats.getAs[Double]("mean_v")}%.1f,""" +
      f""""max_visited":${stats.getAs[Long]("max_v")},""" +
      f""""visited_frac":${stats.getAs[Double]("mean_v") / n}%.4f}""")
    spark.stop()
  }
}
