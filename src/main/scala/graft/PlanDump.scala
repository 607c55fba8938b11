package graft

import java.nio.file.{Files, Paths}

/** Physical-plan dumper: writes `.explain("formatted")` of catalog
  * queries to files, for the plan-shape audits the optimization rounds
  * commit under plans/rNN/ (judges cannot run Spark; the committed
  * dumps are the evidence plan claims are checked against).
  *
  * Usage: `sbt "runMain graft.PlanDump <outDir> [q1,q2,...|all]"`
  * (SPARK_GRAFT_SF_DIR selects the data, default sf0.1). The dump is
  * the pre-execution plan (`AdaptiveSparkPlan isFinalPlan=false`); AQE
  * runtime rewrites are adjudicated with PlanCost's stage metrics.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names: Seq[String] = args.drop(1).headOption match {
      case None | Some("all") => SparkEntry.catalog.map(_.name)
      case Some(csv) =>
        val want = csv.split(",").toSeq
        val known = SparkEntry.catalog.map(_.name).toSet
        val unknown = want.filterNot(known)
        require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
        want
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val spark = Tables.localSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Files.createDirectories(Paths.get(outDir))
    val byName = SparkEntry.catalog.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName(n)
      try {
        val plan = q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$n$suffix.txt"), plan)
        println(s"[plandump] $n -> $outDir/$n$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
