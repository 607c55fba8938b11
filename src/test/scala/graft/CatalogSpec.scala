package graft

/** Catalog integrity guard: the driver contract depends on names being
  * unique, oracles referencing only the shared tables, and every query
  * planning successfully against the smoke SF.
  */
class CatalogSpec extends SparkTestBase {

  test("query names are unique and well-formed") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.length === names.length)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("every oracle references only shared tables or its own CTEs") {
    val known = Tables.names.toSet
    // \b so identifiers ENDING in from/join (e.g. an `n_from` alias)
    // don't false-positive as clause keywords, and a lookbehind so the
    // `IS DISTINCT FROM` operator isn't read as a FROM clause
    val fromRe = "(?i)(?<!DISTINCT )\\b(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*)".r
    SparkEntry.catalog.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (name, sql) =>
      // allow recursive-CTE column lists: `reach(id, r) AS (`
      val ctes = "([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1)).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1)).toSet
      val unknown = refs.filterNot(r => known(r) || ctes(r) || r == "generate_series")
      assert(unknown.isEmpty, s"$name references unknown relations: $unknown")
    }
  }

  test("every catalog query plans against sf0.001 (analysis-level check)") {
    SparkEntry.catalog.foreach { q =>
      val df = q.run(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, q.name)
    }
  }

  test("flagship entry returns rows on sf0.001 (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
