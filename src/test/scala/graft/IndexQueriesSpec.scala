package graft

import java.nio.file.Files

/** Hand-computed fixtures for the search-infrastructure wave
  * (q117–q120): binary aHash near-dup, postings γ-compression,
  * per-source caps, chunk-overlap audit.
  */
class IndexQueriesSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-idx").toFile.getAbsolutePath
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ahash_bands: histogram math matches a scalar reimplementation") {
    val payloads = Seq("", "a", "hello world hello world", "abcdefg" * 40)
    for (s <- payloads) {
      val bytes = s.getBytes("UTF-8")
      val bins = new Array[Int](64)
      val ng = math.max(bytes.length - 1, 0)
      for (i <- 0 until ng)
        bins(((bytes(i) & 0xff) * 31 + (bytes(i + 1) & 0xff)) % 64) += 1
      val mean = ng / 64
      val expect = (0 until 4).map { j =>
        (0 until 16).map(k => if (bins(16 * j + k) > mean) 1 << k else 0).sum
      }
      val got = functions.AHashBands.compute(bytes).toIntArray().toSeq
      assert(got === expect, s"payload of ${bytes.length} bytes")
    }
  }

  test("q117: identical payloads collide at hamming 0; disjoint ones don't pair") {
    // two byte-identical docs, one ±1-word edit, one unrelated alphabet
    val base = Seq.fill(60)(Seq("spark", "shuffle", "columnar", "codegen",
      "parquet", "arrow", "vector", "batch")).flatten.mkString(" ")
    val edited = base.replaceFirst("arrow", "arroz")
    val other = Seq.fill(120)("zq xw vy uk jh").mkString(" ")
    val dir = docsDir(Seq(
      (0L, base, "en", "s0"), (1L, base, "en", "s0"),
      (2L, edited, "en", "s0"), (3L, other, "en", "s1")))
    val rows = multimodal.MultimodalQueries.q117.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byPair = rows.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byPair((0L, 1L)) === ((4L, 0L)), "identical payloads: 4 bands equal, hamming 0")
    assert(byPair.contains((0L, 2L)) && byPair((0L, 2L))._2 <= 2L,
      "one-word edit stays within the near-dup threshold")
    assert(!rows.exists(r => r._1 == 3L || r._2 == 3L),
      "the unrelated-alphabet doc pairs with nothing")
  }

  test("q118: gamma costs on a hand-built posting list") {
    // term "x" in docs 0,1,3,7 → coded deltas 1,1,2,4 → γ bits 1+1+3+5 = 10
    // term "y" only in doc 3  → coded delta 4 → γ bits 5
    val dir = docsDir(Seq(
      (0L, "x", "en", "s0"), (1L, "x", "en", "s0"),
      (3L, "x y", "en", "s0"), (7L, "x", "en", "s0")))
    val rows = text.IndexQueries.q118.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("x") === ((4L, 10L, 256L, 39L)))
    assert(rows("y") === ((1L, 5L, 64L, 78L)))
  }

  test("q119: cap sweep keeps the longest docs and prices the share") {
    // source s0: chars 100, 80, 60, 40 — cap 5 keeps all (n_docs < cap);
    // synthetic caps here are 5/10/20 so use 6 docs to exercise cap 5
    val docs = (0L until 6L).map(i =>
      (i, "w" * (100 - 10 * i.toInt), "en", "s0"))
    val dir = docsDir(docs)
    val rows = text.IndexQueries.q119.run(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // total chars = 100+90+80+70+60+50 = 450; cap 5 keeps top 5 = 400
    assert(rows(5L) === ((5L, 400L, 1L, 400L * 1000 / 450)))
    assert(rows(10L) === ((6L, 450L, 0L, 1000L)))
    assert(rows(20L) === ((6L, 450L, 0L, 1000L)))
  }

  test("q123: OOV share is monotone in V and exact on a tiny vocab") {
    // 3 terms: "a"×4, "b"×2, "c"×1 — every V cutoff ≥ 3 covers all
    val dir = docsDir(Seq(
      (0L, "a a b c", "en", "s0"),
      (1L, "a a b", "fr", "s0")))
    val rows = text.IndexQueries.q123.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(("en", 256L)) === ((4L, 0L, 0L)))
    assert(rows(("fr", 4096L)) === ((3L, 0L, 0L)))
    assert(rows.size === 6)
  }

  test("q124: growth curve counts firsts at each cut") {
    // docs 0..3; 25% cut → doc 0 only; new terms per doc: 2,1,1,0
    val dir = docsDir(Seq(
      (0L, "a b", "en", "s0"),
      (1L, "a c", "en", "s0"),
      (2L, "d", "en", "s0"),
      (3L, "a b c d", "en", "s0")))
    val rows = text.IndexQueries.q124.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(25L) === ((1L, 2L, 2L, 1000L)))
    assert(rows(50L) === ((2L, 4L, 3L, 750L)))
    assert(rows(75L) === ((3L, 5L, 4L, 800L)))
    assert(rows(100L) === ((4L, 9L, 4L, 444L)))
  }

  test("q120: chunk counts and overlap on exact boundary cases") {
    val dir = docsDir(Seq(
      (0L, "a" * 256, "en", "s0"),            // exactly one window: 1 chunk, no overlap
      (1L, "b" * 257, "en", "s0"),            // 2 chunks: 256 + 65 → overlap 64
      (2L, "c" * (256 + 192), "en", "s0"),    // 2 chunks: 256 + 256 → overlap 64
      (3L, "d" * 100, "fr", "s0")))           // short doc: 1 chunk of 100
    val rows = text.IndexQueries.q120.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // en: docs 0,1,2 → chunks 1+2+2 = 5; chunk chars 256 + 321 + 512 = 1089
    // overlap = 1089 - (256 + 257 + 448) = 128
    assert(rows.contains(("en", 3L, 5L, 1089L, 128L)))
    assert(rows.contains(("fr", 1L, 1L, 100L, 0L)))
  }
}
