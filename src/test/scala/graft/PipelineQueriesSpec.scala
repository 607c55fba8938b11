package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics tests for the training-pipeline operators (q58–q61) on
  * crafted corpora where the right answers are hand-computable — the
  * DuckDB oracle pins cross-engine equality, these pin the MEANING.
  */
class PipelineQueriesSpec extends SparkTestBase {

  /** Write a tiny documents.parquet into a temp dir shaped like the
    * driver testdata, so the catalog queries run unmodified.
    */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-pipe").toFile.getAbsolutePath
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q58: repetition metrics flag the degenerate docs and pass the clean one") {
    val dir = docsDir(Seq(
      // clean prose: all trigrams distinct, top bigram occupancy low
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0"),
      // one bigram repeated: "spam ham spam ham ..." → top2gram ≈ 1/2
      (1L, "spam ham spam ham spam ham spam ham spam ham", "en", "s0"),
      // duplicated lines
      (2L, "same line\nsame line\nsame line\nother", "en", "s0"),
      (3L, "", "en", "s0")))
    val out = text.PipelineQueries.q58.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0).getInt(8) === 1, "clean doc must pass")          // quality_pass
    assert(out(1).getInt(6) === 1, "spam-ham must fail top2gram")  // fail_top2gram
    assert(out(1).getInt(7) === 1, "spam-ham must fail dup3gram")
    assert(out(2).getInt(5) === 1, "dup lines must fail")          // fail_dup_lines
    assert(math.abs(out(2).getDouble(2) - 0.5) < 1e-15)            // 2 distinct / 4 lines
    assert(out(3).getLong(1) === 0L)                                // n_words of empty
  }

  test("q59: packing offsets chunk each shard's concatenated stream at 512") {
    // shard s0: 500 + 20 tokens → doc 1 starts at 500, crosses the 512 cut
    val dir = docsDir(Seq(
      (0L, Seq.fill(500)("w").mkString(" "), "en", "s0"),
      (1L, Seq.fill(20)("w").mkString(" "), "en", "s0"),
      (2L, Seq.fill(600)("w").mkString(" "), "en", "s1"),
      (3L, "", "en", "s1")))
    val out = text.PipelineQueries.q59.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(out(0L) === ((500L, 0L, 0L, 0L, 0)))
    assert(out(1L) === ((20L, 500L, 0L, 1L, 1)), "straddles the 512 boundary")
    assert(out(2L) === ((600L, 0L, 0L, 1L, 1)), "600-token doc spans packs 0-1")
    assert(out(3L) === ((0L, 600L, 1L, 1L, 0)), "empty doc sits at its offset")
  }

  test("q60: split assignment is deterministic and partitions the corpus") {
    val dir = docsDir((0L until 200L).map(i => (i, s"doc $i tokens here", "en", s"s${i % 3}")))
    val out = text.PipelineQueries.q60.run(spark, dir).collect()
    val byName = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum === 200L, "every doc lands in exactly one split")
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    assert(byName("train") > byName.getOrElse("val", 0L))
    // re-run must give the identical assignment (no RNG anywhere)
    val again = text.PipelineQueries.q60.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === byName)
  }

  test("q62: greedy packing keeps docs whole and opens packs on overflow") {
    // shard s0: 300 + 300 + 20 tokens → doc 1 (300) doesn't fit after
    // doc 0 (300+300 > 512) → new pack; doc 2 (20) fits after doc 1
    val dir = docsDir(Seq(
      (0L, Seq.fill(300)("w").mkString(" "), "en", "s0"),
      (1L, Seq.fill(300)("w").mkString(" "), "en", "s0"),
      (2L, Seq.fill(20)("w").mkString(" "), "en", "s0"),
      (3L, Seq.fill(600)("w").mkString(" "), "en", "s1"), // oversized: own pack, truncated
      (4L, Seq.fill(10)("w").mkString(" "), "en", "s1")))
    val out = text.PipelineQueries.q62.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out(0L) === ((0L, 0L, 0)))
    assert(out(1L) === ((1L, 0L, 0)), "300 after 300 overflows 512 → new pack")
    assert(out(2L) === ((1L, 300L, 0)), "20 fits beside 300")
    assert(out(3L) === ((0L, 0L, 1)), "oversized doc flagged truncated")
    assert(out(4L) === ((1L, 0L, 0)), "doc after an oversized pack starts fresh")
  }

  test("q63: mixture sampling applies per-stratum rates deterministically") {
    val dir = docsDir((0L until 300L).map(i =>
      (i, s"tok a b c $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh", "s0")))
    val out = text.PipelineQueries.q63.run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out("en")._3 === 500L && out("de")._3 === 250L && out("zh")._3 === 100L)
    // en must keep a strictly larger fraction than zh (100 docs each)
    assert(out("en")._2.toDouble / out("en")._1 > out("zh")._2.toDouble / out("zh")._1)
    val again = text.PipelineQueries.q63.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again === out.map { case (k, v) => k -> v._2 })
  }

  test("q64: incremental dedup matches new docs against the base corpus only") {
    // ids 4 and 9 are "new" (id % 5 == 4); 4 duplicates base doc 1,
    // 9 matches nothing; base-base duplicate pair (0, 1) must NOT appear
    val common = "the quick brown fox jumps over the lazy dog again and again padding"
    val dir = docsDir(Seq(
      (0L, common, "en", "s0"), (1L, common, "en", "s0"),
      (2L, "completely different text about spark plans", "en", "s0"),
      (3L, "another unrelated document body here", "en", "s0"),
      (4L, common, "en", "s0"),
      (9L, "nothing like anything else in this corpus at all", "en", "s0")))
    val out = text.PipelineQueries.q64.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq === Seq((4L, 0L, 1.0, 2L)),
      "new doc 4 matches base 0 and 1 (min id 0, both jaccard 1.0); doc 9 drops out")
  }

  test("q61: integer tf-idf ranks the distinguishing term first") {
    // "rare" appears in 1 of 4 docs and twice there; "common" in all 4
    val dir = docsDir(Seq(
      (0L, "common rare rare common common", "en", "s0"),
      (1L, "common filler one", "en", "s0"),
      (2L, "common filler two", "en", "s0"),
      (3L, "common filler three", "en", "s0")))
    val out = text.PipelineQueries.q61.run(spark, dir)
      .filter(col("doc_id") === 0).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.head === ((1L, "rare", 2L, 1L, 2L * (4L * 1000000L / 1L))),
      "rare (tf=2, df=1) outranks common")
    assert(out(1) === ((2L, "common", 3L, 4L, 3L * (4L * 1000000L / 4L))))
  }

  test("q86: BM25 ranking shows tf saturation, idf, and length normalization") {
    val fill = "alpha beta gamma delta epsilon zeta eta theta iota"
    val dir = docsDir(Seq(
      (0L, s"table $fill", "en", "s0"),                       // tf=1, dl=10
      (1L, s"table $fill $fill $fill", "en", "s0"),           // tf=1, dl=28 (longer)
      (2L, s"table table table table table $fill", "en", "s0"), // tf=5, dl=14
      (3L, s"scan table $fill", "en", "s0"),                  // both query-1 terms
      (4L, s"$fill $fill", "en", "s0")))                      // no query terms
    val q1 = text.PipelineQueries.q86.run(spark, dir)
      .collect().filter(_.getInt(0) == 1)
      .map(r => r.getLong(2) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(!q1.contains(4L), "docs with no query term never surface")
    assert(q1(3L)._3 === 2L, "both query terms hit doc 3")
    val (s0, s1, s2) = (q1(0L)._2, q1(1L)._2, q1(2L)._2)
    assert(s2 > s0, "higher tf scores higher")
    assert(s2 < 5 * s0, "...but sub-linearly (Robertson saturation)")
    assert(s0 > s1, "same tf in a longer doc scores lower (length normalization)")
  }

  test("q87: phrase hits require exact adjacency in order, counted per occurrence") {
    val dir = docsDir(Seq(
      (0L, "alpha table scan beta table scan", "en", "s0"), // "table scan" x2
      (1L, "table beta scan table", "en", "s0"),            // both terms, never adjacent
      (2L, "scan table", "en", "s0"),                       // adjacent but reversed
      (3L, "no relevant words at all here", "en", "s0")))
    val rows = text.PipelineQueries.q87.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet === Set((1, 0L)),
      "only the in-order adjacent doc matches; co-occurrence alone is not a phrase")
    assert(rows((1, 0L)) === ((2L, 2L, 2L)), "both occurrences of the phrase count")
  }

  test("q83: buckets partition the scored corpus with monotone score ranges") {
    // doc i mixes i high-frequency "m x" bigrams with (12−i) copies of
    // its own rare "m y<i>" bigram — reference-likelihood rises with i,
    // and doc 0 (all-rare) scores strictly below doc 11 (all-common)
    val docs = (0 until 12).map { i =>
      val t = (("m x " * i) + (s"m y$i " * (12 - i))).trim
      (i.toLong, t, "en", "s0")
    }
    val dir = docsDir(docs)
    val rows = text.PipelineQueries.q83.run(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.values.map(_._1).sum === 12L, "every scored doc is bucketed once")
    assert(rows.size >= 2, "distinct scores must spread across buckets")
    val present = rows.keys.toSeq.sorted
    for (Seq(a, b) <- present.sliding(2).toSeq)
      assert(rows(a)._3 < rows(b)._2,
        s"bucket $a's max score must sit strictly below bucket $b's min")
  }

  test("q95: largest-remainder quotas hit the exact global target") {
    // sources of size 7 and 3, global target 10 div 5 = 2:
    // base quotas 1 and 0, remainders 4 and 6 → the one leftover seat
    // goes to s1 (bigger remainder) → exactly one pick per source
    val dir = docsDir(
      (0 until 7).map(i => (i.toLong, s"doc $i", "en", "s0")) ++
        (7 until 10).map(i => (i.toLong, s"doc $i", "en", "s1")))
    val out = text.PipelineQueries.q95.run(spark, dir).collect()
    assert(out.length === 2, "quotas must sum to the exact 20% target")
    assert(out.map(_.getString(1)).sorted.toSeq === Seq("s0", "s1"),
      "the leftover seat goes by largest remainder, one pick per source")
    assert(out.forall(_.getLong(2) === 1L), "picks are the rank-1 docs")
    // determinism: a second run picks the identical doc_ids
    val again = text.PipelineQueries.q95.run(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet === again.map(_.getLong(0)).toSet)
  }

  test("q96: diff statuses classify retired / edited / new / stable docs") {
    def hb(id: Long) = (id * 2654435761L) % 1000
    val ids = 0L until 4000L
    val removedId = ids.find(hb(_) < 20).get
    val changedId = ids.find(i => hb(i) >= 960 && hb(i) < 980).get
    val addedId = ids.find(hb(_) >= 980).get
    val stableId = ids.find(i => hb(i) >= 20 && hb(i) < 960).get
    val dir = docsDir(Seq(removedId, changedId, addedId, stableId)
      .map(i => (i, s"text body $i", "en", "s0")))
    val out = text.PipelineQueries.q96.run(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map(
      "removed" -> 1L, "changed" -> 1L, "added" -> 1L, "unchanged" -> 1L))
  }

  test("q97: adjacency-above-chance outranks raw frequency") {
    // "zig zag" always adjacent (6 times, never apart — unique
    // separators keep the reverse pair and separator pairs below the
    // support floor) vs "of the": as frequent, but of/the also appear
    // in many other contexts → bigger marginals → lower PMI
    val glue = (1 to 6).map(i => s"of w$i the v$i of u$i the").mkString(" ")
    val dir = docsDir(Seq(
      (0L, (1 to 6).map(i => s"zig zag s$i").mkString(" "), "en", "s0"),
      (1L, (1 to 6).map(i => s"of the c$i").mkString(" "), "en", "s0"),
      (2L, glue, "en", "s0")))
    val rows = text.PipelineQueries.q97.run(spark, dir).collect()
    assert(rows.forall(_.getLong(2) >= 5L), "support floor c12 >= 5")
    val top = rows.head
    assert((top.getString(0), top.getString(1)) === (("zig", "zag")),
      "the always-adjacent pair must outrank the frequent-but-diffuse one")
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs.contains(("of", "the")), "of-the passes support but ranks below")
  }

  test("q98: truncation losses at each context length are exact") {
    val dir = docsDir(Seq(
      (0L, Seq.fill(100)("w").mkString(" "), "en", "s0"),
      (1L, Seq.fill(200)("w").mkString(" "), "en", "s0"),
      (2L, Seq.fill(600)("w").mkString(" "), "en", "s0"),
      (3L, "", "en", "s0")))
    val out = text.PipelineQueries.q98.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(128L) === ((2L, 356L, 544L, 544.0 / 900)))
    assert(out(256L) === ((1L, 556L, 344L, 344.0 / 900)))
    assert(out(512L) === ((1L, 812L, 88L, 88.0 / 900)))
    assert(out(1024L) === ((0L, 900L, 0L, 0.0)))
  }

  test("q101: the interleaved order is a dense per-bucket grid, one doc per slot") {
    // q83's graded-difficulty corpus: scores rise with i
    val docs = (0 until 12).map { i =>
      val t = (("m x " * i) + (s"m y$i " * (12 - i))).trim
      (i.toLong, t, "en", "s0")
    }
    val dir = docsDir(docs)
    val rows = text.PipelineQueries.q101.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 12, "every scored doc gets exactly one slot")
    assert(rows.forall { case (_, b, r, g) => g === r * 4 + b },
      "global position is the round-robin grid formula")
    assert(rows.map(_._4).distinct.length === 12, "no two docs share a slot")
    for ((b, grp) <- rows.groupBy(_._2))
      assert(grp.map(_._3).sorted.toSeq === (0L until grp.length.toLong).toSeq,
        s"bucket $b ranks must be dense 0..n-1")
    // within a bucket, doc order follows doc_id (the curriculum is stable)
    for ((_, grp) <- rows.groupBy(_._2))
      assert(grp.sortBy(_._3).map(_._1).toSeq === grp.map(_._1).sorted.toSeq)
  }

  test("q107: bucket routing, batch counts, and padding waste are exact") {
    // token counts 50, 100, 300, 600 → buckets 64, 128, 512, 512
    val dir = docsDir(Seq(
      (0L, Seq.fill(50)("w").mkString(" "), "en", "s0"),
      (1L, Seq.fill(100)("w").mkString(" "), "en", "s0"),
      (2L, Seq.fill(300)("w").mkString(" "), "en", "s0"),
      (3L, Seq.fill(600)("w").mkString(" "), "en", "s0")))
    val out = text.PipelineQueries.q107.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // ctx 64: 1 doc, 50 kept, batch 64, 1 batch, pad 14
    assert(out(64L) === ((1L, 50L, 64L, 1L, 14L)))
    assert(out(128L) === ((1L, 100L, 32L, 1L, 28L)))
    // ctx 512: docs 2 and 3; doc 3 truncates to 512 → kept 300+512
    assert(out(512L) === ((2L, 812L, 8L, 1L, 212L)))
    assert(!out.contains(256L), "no doc routes to an empty bucket")
  }
}
