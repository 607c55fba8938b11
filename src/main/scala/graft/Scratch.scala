package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary scale-tuning harness for the q168 operating point at
  * 10×/100× — deleted once PERF.md carries the numbers.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "target/scale10")
    val configs = sys.env.getOrElse("SCRATCH_CFGS", "16,2,12,4;16,3,16,5;24,2,16,5;16,3,24,6")
      .split(";").map(_.split(",").map(_.trim.toInt)).toSeq
    var built: Option[(Int, Int, org.apache.spark.sql.DataFrame)] = None
    for (Array(k, rounds, beam, hops) <- configs) {
      val t0 = System.nanoTime()
      val edges = built match {
        case Some((bk, br, e)) if bk == k && br == rounds => e
        case _ =>
          val e = graft.vec.VectorQueries.clGraphTuned(spark, dir, k, rounds)
          built = Some((k, rounds, e)); e
      }
      val df = graft.vec.VectorQueries.clAudit(spark, dir, edges, beam, hops, 6)
      val m = df.agg(avg("recall_k"), avg("n_visited"), avg("top1_match")).first()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $dir k=$k rounds=$rounds beam=$beam hops=$hops " +
        f"recall=${m.getDouble(0)}%.3f visited=${m.getDouble(1)}%.0f top1=${m.getDouble(2)}%.3f ${dt}%.1fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
