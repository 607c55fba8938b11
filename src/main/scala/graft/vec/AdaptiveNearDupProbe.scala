package graft.vec

/** Receipt main for the scale-adaptive wide near-dup twin
  * ([[VectorQueries.adaptiveNearDup]]) — the resolution of the round-15
  * `weak` flag on q72 (fixed 16-bit bands → N²/2¹⁶ candidate volume →
  * 454× step at 2 M rows).
  *
  * Usage:
  *   tools/java_run.sh graft.vec.AdaptiveNearDupProbe <dir> [<dir> ...]
  *
  * Prints ONE JSON line per dir: corpus size, the law's width, pair
  * count, wall seconds, and the hot-bucket cap-truncation counts per
  * band (the no-silent-caps contract — at the law's width these read
  * 0; a nonzero count is visible recall loss, not an invisible cap).
  * Run on sf0.1 and target/scale1000 back-to-back: the pair of lines is
  * the 1000× step receipt.
  */
object AdaptiveNearDupProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AdaptiveNearDupProbe <embeddingsDir> [<embeddingsDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)
    // same fixed-width warmup shape as ScaleBench: JIT/codegen warm
    // before anything is timed
    VectorQueries.adaptiveNearDup(spark, "/root/testdata/sf0.01")._1
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    args.foreach { dir =>
      val n = graft.Tables(spark, dir, "embeddings").count()
      val t0 = System.nanoTime()
      val (pairs, capAudit, bits) = VectorQueries.adaptiveNearDup(spark, dir)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val trunc = capAudit.collect()
        .map(r => s""""band_${r.getInt(0)}":${r.getLong(1)}""")
        .sortBy(identity).mkString("{", ",", "}")
      spark.catalog.clearCache()
      println(f"""{"probe":"adaptive_neardup","dir":"$dir","n":$n,""" +
        f""""bits":$bits,"n_pairs":$nPairs,"wall_sec":$wall%.1f,""" +
        f""""cap_truncated":$trunc}""")
    }
    spark.stop()
  }
}
