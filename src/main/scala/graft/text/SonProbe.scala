package graft.text

import java.nio.file.{Files, Paths}

/** Beyond-gate receipt runner for q172's SON completeness claim at a
  * NON-TRIVIAL operating point: the gate threshold (60 %) on a
  * decorrelated 10× corpus correctly yields an EMPTY itemset table
  * (cross-copy vocabulary collapses), which proves phase 2 on zero
  * survivors only. This main runs [[TextQueries.sonItemsets]] at a
  * caller-chosen support threshold where the scale corpus still has
  * survivors, dumps the result + its threshold-matched DuckDB mirror in
  * Verify's layout, and is compared with tools/check_oracle_scale.py —
  * so the two-phase candidate-completeness lemma is exercised with a
  * non-empty L1/L2/L3 at scale (PERF.md round 10).
  *
  * Usage:
  *   sbt "runMain graft.text.SonProbe <docsDir> <outDir> <supNum> <supDen>"
  */
object SonProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: SonProbe <docsDir> <outDir> <supNum> <supDen>")
    val Array(dir, outDir, numS, denS) = args
    val (num, den) = (numS.toLong, denS.toLong)
    require(num > 0 && den > 0 && num <= den, s"support $num/$den not in (0, 1]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Tables.localSession(cpus)
    new java.io.File(outDir).mkdirs()
    val name = "q172_frequent_itemsets"
    val t0 = System.nanoTime()
    val out = TextQueries.sonItemsets(spark, dir, num, den)
    out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val dt = (System.nanoTime() - t0) / 1e9
    val nRows = spark.read.parquet(s"$outDir/$name").count()
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(TextQueries.sonOracleSql(num, den))}}")
    println(s"""{"probe":"son","dir":"$dir","support":"$num/$den","rows":$nRows,"spark_sec":$dt}""")
    spark.stop()
  }
}
