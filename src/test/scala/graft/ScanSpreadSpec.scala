package graft

/** The input-parallelism floor ([[Tables.spread]], round 17): the
  * driver's single-row-group parquet tables scan as ONE task, so a
  * CPU-dense per-row kernel directly above the scan runs on one core.
  * Opted-in call sites repartition the scan up to the session's
  * parallelism; the floor must (1) actually raise the partition count
  * behind an opted-in load, (2) leave small tables and default loads
  * untouched, and (3) never change the ROWS — only their placement.
  */
class ScanSpreadSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.1"

  test("spreadOk=true raises a big single-file scan to the session parallelism") {
    val plain = Tables(spark, sf, "documents")
    val spreadDf = Tables(spark, sf, "documents", spreadOk = true)
    val cores = spark.sparkContext.defaultParallelism
    assert(plain.rdd.getNumPartitions < cores,
      "precondition: the raw driver table must scan below the parallelism " +
        "floor for this spec to exercise the gate")
    assert(spreadDf.rdd.getNumPartitions == cores)
  }

  test("the 256 KB size gate leaves small tables alone even when opted in") {
    val plain = Tables(spark, sf, "nation")
    val opted = Tables(spark, sf, "nation", spreadOk = true)
    assert(opted.rdd.getNumPartitions == plain.rdd.getNumPartitions)
  }

  test("default loads are untouched (opt-in only)") {
    val df = Tables(spark, sf, "documents")
    // a default load must carry no Repartition node at all
    assert(!df.queryExecution.optimizedPlan.toString.contains("Repartition"))
  }

  test("the floor moves rows, never changes them") {
    val a = Tables(spark, sf, "documents").select("doc_id", "lang", "n_chars")
      .orderBy("doc_id").collect()
    val b = Tables(spark, sf, "documents", spreadOk = true)
      .select("doc_id", "lang", "n_chars").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
