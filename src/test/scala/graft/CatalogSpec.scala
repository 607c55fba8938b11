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
      // allow recursive-CTE column lists (`reach(id, r) AS (`) and
      // DuckDB's explicit `AS MATERIALIZED (` (forces single evaluation
      // of multiply-referenced CTEs — see q160/q161)
      val ctes = ("([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*" +
        "(?:MATERIALIZED\\s*)?\\(").r
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

  test("testdata schema canary: Tables normalization yields the engine contract") {
    // The driver has regenerated testdata with different physical
    // encodings across rounds (events.ts: TIMESTAMP(nanos) → micros in
    // round 6, silently breaking 31 queries). This canary pins the
    // POST-NORMALIZATION contract against the real testdata so the next
    // drift fails here, by name, instead of as 31 analyzer errors.
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"
    assert(Tables(spark, sf, "events").schema("ts").dataType === LongType,
      "events.ts must normalize to epoch-nano LONG (Tables.normalizeTs)")
    val ev = Tables(spark, sf, "events").schema
    assert(ev("event_id").dataType === LongType && ev("user_id").dataType === LongType
      && ev("event_type").dataType === StringType && ev("value").dataType === DoubleType,
      s"events schema drifted: $ev")
    val emb = Tables(spark, sf, "embeddings").schema
    assert(emb("embedding").dataType === ArrayType(FloatType, containsNull = true) ||
      emb("embedding").dataType === ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must stay array<float>: ${emb("embedding").dataType}")
    val docs = Tables(spark, sf, "documents").schema
    assert(docs("text").dataType === StringType && docs("n_chars").dataType === LongType,
      s"documents schema drifted: $docs")
    // epoch-nano plausibility: the synthetic stream lives in [2020, 2040)
    val bounds = Tables(spark, sf, "events")
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head()
    assert(bounds.getLong(0) > 1577836800L * 1000000000L &&
      bounds.getLong(1) < 2208988800L * 1000000000L,
      s"events.ts range not epoch-nanos: $bounds — normalization is mis-scaled")
  }
}
