package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics tests for the round-8 lakehouse/layout operators on crafted
  * fixtures where the right answers are hand-computable: q157 (suffix-
  * ranking duplicated spans), q158 (changelog → snapshot compaction),
  * q159 (Z-order layout audit invariants). The DuckDB oracles pin
  * cross-engine equality at the gate SFs; these pin the MEANING.
  */
class LakehouseOpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-lake").toFile.getAbsolutePath
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, Long, Long, String, java.lang.Double, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-lake-ev").toFile.getAbsolutePath
    // ts written as epoch-NANO long — the engine contract Tables pins
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q157: cross-doc shared runs AND within-doc repeats merge into exact spans") {
    val chunk = (1 to 10).map(i => s"c$i").mkString(" ") // 10 shared tokens
    val dir = docsDir(Seq(
      // shared run at positions 5..14 → flagged gram starts {5,6,7}
      (0L, ((0 to 4).map(i => s"u$i") ++ Seq(chunk) ++ (5 to 9).map(i => s"u$i")).mkString(" ")),
      // same run at positions 0..9 → flagged {0,1,2}
      (1L, (Seq(chunk) ++ (0 to 2).map(i => s"v$i")).mkString(" ")),
      // WITHIN-doc repeat (q88 would not flag this): r1..r8 twice with a
      // gap → two islands, one duplicated 8-gram each
      (2L, ((1 to 8).map(i => s"r$i") ++ Seq("x") ++ (1 to 8).map(i => s"r$i")).mkString(" ")),
      // shorter than the window → no rows
      (3L, "a b c")))
    val out = text.PipelineQueries.q157.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet === Set((0L, 5L), (1L, 0L), (2L, 0L), (2L, 9L)))
    assert(out((0L, 5L)) === ((14L, 10L, 3L))) // tok_end, span_tokens, n_dup_grams
    assert(out((1L, 0L)) === ((9L, 10L, 3L)))
    assert(out((2L, 0L)) === ((7L, 8L, 1L)))
    assert(out((2L, 9L)) === ((16L, 8L, 1L)))
  }

  test("q157: corpus-size guard — doubling plan ≡ lead-window plan, position-for-position") {
    // Round 18: past Q157DoubleMinDocs the flagged-position plan swaps
    // the SaK-long rank tuple for one extra dense-rank round (2 longs
    // through the wide stages). Force the guard both ways on real data
    // and on the crafted fixture; the flagged sets must be identical.
    for (dir <- Seq(
        "/root/testdata/sf0.001",
        docsDir(Seq(
          (0L, (1 to 8).map(i => s"d$i").mkString(" ") + " x " +
            (1 to 8).map(i => s"d$i").mkString(" ")),
          (1L, (1 to 12).map(i => s"e$i").mkString(" ")),
          (2L, (3 to 12).map(i => s"e$i").mkString(" ")))))) {
      val docs = Tables(spark, dir, "documents")
      val n = docs.count()
      def flaggedSet(minDocs: Long) =
        text.PipelineQueries.q157FlaggedPositions(docs, n, doubleMinDocs = minDocs)
          .select(col("doc_id"), col("pos").cast("long")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val leadWindow = flaggedSet(Long.MaxValue) // n ≤ guard → lead-window
      spark.catalog.clearCache()
      val doubling = flaggedSet(0L)              // n > guard → doubling
      spark.catalog.clearCache()
      assert(doubling === leadWindow, s"plans diverged on $dir")
      assert(leadWindow.nonEmpty, s"vacuous compare on $dir")
    }
  }

  test("q157: prefix-doubling ranks agree with direct gram grouping on real data") {
    // decisive cross-check: the engine's suffix-ranking span set must
    // equal a direct exact-gram computation done entirely differently
    val dir = "/root/testdata/sf0.001"
    val got = text.PipelineQueries.q157.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    val tk = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "tok")))
    val grams = tk.groupBy("doc_id").agg(collect_list(struct(col("pos"), col("tok"))).as("ts"))
      .filter(size(col("ts")) >= 8) // sequence(0, negative) would descend
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ts) - 8),
           i -> struct(i as pos, concat_ws(' ', transform(
             slice(array_sort(ts), i + 1, 8), s -> s.tok)) as gram))""")).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
    val dup = grams.withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("gram")))
      .filter(col("cnt") >= 2)
      .withColumn("grp", col("pos") - row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp")
      .agg(min("pos").cast("long").as("s"), (max("pos") + 7).cast("long").as("e"),
        count(lit(1)).as("n"))
      .select("doc_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === dup)
  }

  test("q158: last-writer-wins by (ts, event_id); tombstones drop keys; null key is a key") {
    val up = "click"; val del = "error"
    val dir = eventsDir(Seq(
      // key (1,5): two upserts — later ts wins
      (10L, 1000L, 1L, up, 1.0, "{\"k\": 5}"),
      (11L, 2000L, 1L, up, 2.0, "{\"k\": 5}"),
      // key (1,6): upsert then delete → absent from snapshot
      (12L, 1000L, 1L, up, 3.0, "{\"k\": 6}"),
      (13L, 3000L, 1L, del, null, "{\"k\": 6}"),
      // key (2,7): ts TIE — higher event_id wins
      (14L, 5000L, 2L, up, 4.0, "{\"k\": 7}"),
      (15L, 5000L, 2L, up, 5.0, "{\"k\": 7}"),
      // key (2,null): unparseable props → null key, still a live row
      (16L, 6000L, 2L, up, 6.0, "nope"),
      // key (3,8): delete then LATER upsert → resurrected
      (17L, 1000L, 3L, del, null, "{\"k\": 8}"),
      (18L, 2000L, 3L, up, 7.0, "{\"k\": 8}")))
    val out = rel.RelationalQueries.q158.run(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)) ->
        (r.getDouble(2), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out.keySet === Set((1L, 5L), (2L, 7L), (2L, -1L), (3L, 8L)))
    assert(out((1L, 5L)) === ((2.0, 11L, 2L, 0L))) // value, event_id, n_ops, n_deletes
    assert(out((2L, 7L)) === ((5.0, 15L, 2L, 0L))) // tie → event_id 15
    assert(out((2L, -1L)) === ((6.0, 16L, 1L, 0L)))
    assert(out((3L, 8L)) === ((7.0, 18L, 2L, 1L))) // resurrected, lineage kept
  }

  test("q159: layouts cover identical row mass; zorder serves BOTH single-dim bands") {
    val rows = rel.RelationalQueries.q159.run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val layouts = Seq("natural", "lex_user_k", "lex_k_user", "zorder", "hilbert")
    val preds = Seq("p_user_band", "p_k_band", "p_box")
    assert(rows.keySet === (for (l <- layouts; p <- preds) yield (l, p)).toSet)
    // same table, same block size → identical block counts per layout
    val nb = rows.map { case ((l, _), (n, _, _)) => l -> n }.toSet
    assert(nb.size === layouts.size, "one block count per layout")
    assert(nb.map(_._2).size === 1 || nb.map(_._2).toSeq.distinct.size === 1)
    for (p <- preds; curve <- Seq("zorder", "hilbert")) {
      val c = rows((curve, p)); val nat = rows(("natural", p))
      assert(c._2 >= nat._2, s"$curve must skip at least as many blocks as natural for $p")
      assert(c._3 <= 1000 && c._3 >= 0)
    }
    // the multi-dim claim: BOTH space-filling curves skip blocks on BOTH
    // single-dim bands (the lex layouts each fail one of them)
    for (curve <- Seq("zorder", "hilbert")) {
      assert(rows((curve, "p_user_band"))._2 > 0)
      assert(rows((curve, "p_k_band"))._2 > 0)
    }
  }

  test("q162: merged MV ≡ direct on every group, and the merge is split-invariant") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q162_incremental_mv")(spark, dir)
    val out = df.collect().toIndexedSeq
    df.unpersist()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("matches_full") === 1),
      "every group's merged state must be indistinguishable from full recompute")
    // split-invariance: re-batch by a DIFFERENT cut than the query's
    // (event_id mod 5 vs its mod 3) and merge with the same decimal
    // recipe — identical view. This is the property that lets a
    // lakehouse refresh from arbitrary ingest batch boundaries.
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables(spark, dir, "events")
      .withColumn("day", expr("(ts div 1000) div 86400000000"))
      .withColumn("batch", pmod(col("event_id"), lit(5)))
    val states = ev.groupBy("batch", "day", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value"), 8).cast(DecimalType(38, 8))).as("sum_state"),
        min("value").as("min_v"), max("value").as("max_v"))
    val merged5 = states.groupBy("day", "event_type")
      .agg(sum("n_events").as("n_events"),
        sum("sum_state").cast("double").as("sum_value"),
        min("min_v").as("min_value"), max("max_v").as("max_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Any]("sum_value"), r.getAs[Any]("min_value"),
          r.getAs[Any]("max_value"))).toMap
    out.foreach { r =>
      val k = (r.getLong(0), r.getString(1))
      val m = merged5(k)
      assert(m === ((r.getAs[Long]("n_events"), r.getAs[Any]("sum_value"),
        r.getAs[Any]("min_value"), r.getAs[Any]("max_value"))),
        s"5-way batch merge diverged from 3-way on $k")
    }
  }
}
