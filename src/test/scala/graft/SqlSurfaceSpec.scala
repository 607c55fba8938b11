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
