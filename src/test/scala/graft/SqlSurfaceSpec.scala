package graft

import graft.sql.SqlSurface

/** The user-facing SQL surface (round 12): every text in
  * [[SqlSurface.texts]] must produce EXACTLY the catalog DataFrame
  * query's output — same schema (names + types in order), same rows in
  * the same presented order, doubles compared bit-for-bit (both run in
  * Spark, so any mismatch is a fragment-drift bug, not float noise).
  */
class SqlSurfaceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def catalogQ(name: String): Q =
    SparkEntry.catalog.find(_.name == name)
      .getOrElse(fail(s"$name not in catalog"))

  test("surface covers at least 10 catalog queries") {
    assert(SqlSurface.texts.size >= 10)
  }

  test("every surface text name exists in the catalog") {
    val missing = SqlSurface.texts.keySet
      .filterNot(n => SparkEntry.catalog.exists(_.name == n))
    assert(missing.isEmpty, s"unknown names: $missing")
  }

  test("dedup-view registration lists exactly match the texts that read the views") {
    // The run() gate is an explicit per-query list; this is the guard
    // that keeps the list true. A text that mentions a view only in a
    // SQL comment shows up here and forces a human look — better a red
    // suite than a silent multi-minute LSH+CC materialization.
    // exact view name only: the q128 sweep's dedup_components_<τ> views
    // are registered by their own gate (needsDedupSweep), not these
    val compRe = "dedup_components(?![_0-9A-Za-z])".r
    val edgeRe = "dedup_edges(?![_0-9A-Za-z])".r
    val compInText = SqlSurface.texts
      .filter(t => compRe.findFirstIn(t._2).isDefined).keySet
    val edgeInText = SqlSurface.texts
      .filter(t => edgeRe.findFirstIn(t._2).isDefined).keySet
    assert(SqlSurface.needsDedupComponents === compInText,
      s"needsDedupComponents drift: missing=${compInText -- SqlSurface.needsDedupComponents} stale=${SqlSurface.needsDedupComponents -- compInText}")
    assert(SqlSurface.needsDedupEdges === edgeInText,
      s"needsDedupEdges drift: missing=${edgeInText -- SqlSurface.needsDedupEdges} stale=${SqlSurface.needsDedupEdges -- edgeInText}")
  }

  test("unknown query name fails with a clear error") {
    val e = intercept[RuntimeException](SqlSurface.run(spark, dir, "q999_nope"))
    assert(e.getMessage.contains("unknown SQL-surface query"))
  }

  test("COVERAGE.md's canonical surface count matches SqlSurface.texts.size") {
    // the one-source-of-truth guard for the 160-vs-165 doc-drift class:
    // COVERAGE.md §SQL-first user surface cites "texts for N catalog
    // queries"; that N must be the code's count.
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val m = "texts for (\\d+) catalog queries".r.findFirstMatchIn(cov)
      .getOrElse(fail("COVERAGE.md canonical line 'texts for N catalog queries' not found"))
    assert(m.group(1).toInt === SqlSurface.texts.size,
      s"COVERAGE.md cites ${m.group(1)} texts; code has ${SqlSurface.texts.size}")
  }

  for (name <- SqlSurface.texts.keys.toSeq.sorted) {
    test(s"$name: spark.sql text ≡ DataFrame catalog output (rows, order, schema)") {
      val df = catalogQ(name).run(spark, dir)
      val viaSql = SqlSurface.run(spark, dir, name)
      assert(viaSql.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        "schema (names + types, in order) must match")
      val a = df.collect()
      val b = viaSql.collect()
      spark.catalog.clearCache()
      assert(a.length === b.length, "row count")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra === rb, s"row $i differs: df=$ra sql=$rb")
      }
    }
  }
}
