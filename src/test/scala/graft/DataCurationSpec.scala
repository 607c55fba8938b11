package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics tests for the round-4 data-curation operators — benchmark
  * decontamination (q66), SimHash near-dup pairs (q67), int8 quantized
  * retrieval recall (q68), and content-defined chunk dedup (q69) — on
  * crafted corpora where the right answers are hand-checkable. The
  * DuckDB oracle pins cross-engine equality; these pin the MEANING.
  */
class DataCurationSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def vecsDir(rows: Seq[(Long, Seq[Float])]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The q60/q66 split hash, for picking doc_ids that land in a split. */
  private def split(id: Long): String = {
    val h = (id * 2654435761L) % 1000
    if (h < 900) "train" else if (h < 950) "val" else "test"
  }

  test("q66: train docs sharing a 5-gram with a test doc are flagged") {
    val testId = (0L until 1000L).find(split(_) == "test").get
    val trainIds = (0L until 1000L).filter(split(_) == "train").take(3)
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val dir = docsDir(Seq(
      (testId, benchText),
      // copies 6 consecutive benchmark words → contains shared 5-grams
      (trainIds(0), "intro words then the quick brown fox jumps over and more"),
      (trainIds(1), "completely unrelated corpus text with many plain words here"),
      (trainIds(2), "")))
    val out = text.PipelineQueries.q66.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === trainIds.toSet, "only train docs are emitted")
    assert(out(trainIds(0)).getInt(4) === 1, "overlapping doc flagged")
    // "the quick brown fox jumps" and "quick brown fox jumps over"
    assert(out(trainIds(0)).getLong(2) === 2L, "exactly 2 shared 5-grams")
    assert(out(trainIds(1)).getInt(4) === 0, "clean doc not flagged")
    assert(out(trainIds(2)).getLong(1) === 0L, "empty doc has 0 grams")
    assert(out(trainIds(2)).getInt(4) === 0)
  }

  test("q67: identical docs pair at hamming 0 with all 4 bands shared") {
    val dup = "key agg row scan slow fast table value part hash " * 5
    val dir = docsDir(Seq(
      (0L, dup), (1L, dup),
      (2L, "batch window spark order data column agg join small line " * 5),
      (3L, "vector stream group filter sort merge query big customer mid " * 5)))
    val rows = text.TextQueries.q67.run(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val byPair = rows.toMap
    assert(byPair.contains((0L, 1L)), "identical docs must be paired")
    assert(byPair((0L, 1L)) === ((4L, 0L)), "4 bands shared, hamming 0")
    assert(rows.forall { case ((a, b), (nb, hd)) => a < b && hd <= 3 && nb >= 1 },
      "every pair is ordered, within distance 3, and bucket-joined")
  }

  test("q68: collinear int8 quantization preserves the exact ranking") {
    // probes 0-7 = scaled unit basis vectors in 8-dim; candidates 8-15 =
    // 3x the matching probe (exactly collinear → cos 1, and the symmetric
    // int8 code of x equals that of 3x, so both rankings must agree)
    val dim = 8
    def basis(i: Int, scale: Float) =
      Seq.tabulate(dim)(j => if (j == i) scale else 0.0f)
    val rows = (0 until 8).map(i => (i.toLong, basis(i, 1.5f + i))) ++
      (0 until 8).map(i => ((8 + i).toLong, basis(i, 3 * (1.5f + i))))
    val out = vec.VectorQueries.q68.run(spark, vecsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.length === 8)
    out.foreach { case (qId, exact1, int81, m, ov5, r5) =>
      assert(exact1 === qId + 8, s"probe $qId exact top-1 is its collinear twin")
      assert(int81 === qId + 8, s"probe $qId int8 top-1 survives quantization")
      assert(m === 1)
      assert(ov5 === 5L && r5 === 1.0, "orthogonal ties break by c_id in both spaces")
    }
  }

  test("q70: funnel stages are monotone and drops are conserved") {
    val rows = text.TextQueries.q70.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("total", "lang_match", "quality", "exact_dedup", "near_dedup", "train_split"))
    rows.sliding(2).foreach { case Array((_, _, prev, _), (_, name, cur, dropped)) =>
      assert(cur <= prev, s"$name must not gain documents")
      assert(dropped === prev - cur, s"$name drop count must reconcile")
    }
    assert(rows.last._3 > 0, "a non-degenerate corpus survives to training")
  }

  test("q73: near-dup groups spanning splits are flagged as leaks") {
    val rows = text.TextQueries.q73.run(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4)), r.getInt(5)))
    assert(rows.nonEmpty, "the sf0.01 corpus has multi-member near-dup groups")
    rows.foreach { case (n, bySplit, leaked) =>
      assert(n >= 2 && bySplit.sum === n, "split membership partitions each group")
      assert(leaked === (if (bySplit.count(_ > 0) > 1) 1 else 0),
        "leak flag ⟺ members in more than one split")
    }
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0),
      "corpus exhibits both leaked and clean groups")
  }

  test("q74: the budget cut is a consistent global prefix sum") {
    val rows = text.PipelineQueries.q74.run(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val B = 10000L
    rows.foreach { case (_, _, start, sel) =>
      assert(sel === (if (start < B) 1 else 0), "selection rule is tok_start < B")
    }
    // offsets must reconstruct exactly from the priority ordering
    def prio(id: Long) = (id * 2654435761L) % 1000000007L
    var cum = 0L
    rows.sortBy { case (id, _, _, _) => (prio(id), id) }.foreach {
      case (id, n, start, _) =>
        assert(start === cum, s"doc $id offset must equal the running sum")
        cum += n
    }
    val selTokens = rows.filter(_._4 == 1).map(_._2).sum
    assert(selTokens >= B, "greedy fill crosses the budget with its last doc")
    assert(rows.count(_._4 == 1) < rows.length, "the cut must exclude someone at sf0.01")
  }

  test("q75: datasheet counts volumes, dups, and quality per source") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "sA"),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "sA"),   // exact dup of 0
      (2L, "spam ham spam ham spam ham spam ham spam ham", "en", "sA"), // fails quality
      (3L, "one two three four five six seven eight nine ten", "de", "sB"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.PipelineQueries.q75.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out("sA") === ((3L, 1L, 1L, 2L)),
      "sA: 3 docs, 1 lang, 1 exact dup, 2 quality passes")
    assert(out("sB") === ((1L, 1L, 0L, 1L)), "sB: clean singleton source")
  }

  test("q76: reference-typical docs outscore word salad (unseen bigrams → 0)") {
    // reference model trains on the TRAIN split; a doc of bigrams the
    // reference has never seen must back off to score 0 — the property
    // that requires a held-out reference (a self-trained model would
    // award singleton bigrams p = 1 and rank salad HIGHEST)
    val trainIds = (0L until 1000L).filter(split(_) == "train")
    val saladId = (0L until 1000L).find(split(_) == "test").get
    val typical = "the market opens the market closes the market settles"
    val dir = docsDir(Seq(
      (trainIds(0), typical),
      (trainIds(1), typical + " and the market opens again"),
      (trainIds(2), "the market opens and the market closes early today"),
      (saladId, "zx qv plo wk njd rr uio eeq ws mnb")))
    val out = text.PipelineQueries.q76.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    val scores = out.view.mapValues(_._1).toMap
    assert(scores(saladId) === 0L,
      s"every salad bigram is unseen by the train-split model → 0; got $scores")
    assert(out(saladId)._2 === 1, "salad flagged atypical")
    assert(Seq(trainIds(0), trainIds(1), trainIds(2))
      .forall(id => scores(id) > scores(saladId)),
      s"typical docs must outscore salad: $scores")
  }

  test("q69: shared boilerplate yields shared chunks; prefix shifts only locally") {
    // lexically diverse (numbered clauses) so the 8-char window hashes
    // vary — a short repeated phrase can deterministically miss every
    // 1/64 cut and produce a single chunk
    val boiler = (0 until 60)
      .map(i => s"clause $i subsection ${i * 7 % 13} of the service terms")
      .mkString(" ")
    val dir = docsDir(Seq(
      (0L, "unique preamble alpha beta. " + boiler + " unique tail gamma."),
      (1L, "different opening words entirely. " + boiler + " other ending."),
      // content-defined cuts re-synchronize inside the copied region even
      // after an insertion — the property fixed-width chunking lacks
      (2L, "INSERTED PREFIX CHANGES OFFSETS. unique preamble alpha beta. " +
        boiler + " unique tail gamma."),
      (3L, "totally unrelated text with no duplicated content whatsoever"),
      (4L, "")))
    val out = text.TextQueries.q69.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L)._1 >= 2L, "boilerplate long enough to span multiple chunks")
    assert(out(0L)._2 > 0L && out(1L)._2 > 0L, "boilerplate chunks shared")
    assert(out(2L)._2 > 0L, "shifted copy still shares chunks (CDC resync)")
    assert(out(3L)._2 === 0L, "unique doc shares nothing")
    assert(out(4L) === ((0L, 0L)), "empty doc has no chunks")
  }

  private def docsDirSrc(rows: Seq[(Long, String, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q77: a vector is dropped iff a lower-id cell-mate is within tau") {
    val z = Seq.fill(2)(0f)
    val dir = vecsDir(Seq(
      (1L, Seq(1f, 0f) ++ z),            // exemplar: kept
      (2L, Seq(1f, 0f) ++ z),            // identical to 1 → dropped
      (3L, Seq(0f, 1f) ++ z),            // orthogonal to everything → kept
      (4L, Seq(0.9f, 0.1f) ++ z)))       // cos≈0.99 vs 1 AND 2 → dropped
    val out = vec.VectorQueries.q77.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))).toMap
    assert(out(1L) === ((0L, -1L, 1)), "lowest id in its dup group is kept")
    assert(out(2L) === ((1L, 1L, 0)), "exact duplicate dominated by vec 1")
    assert(out(3L) === ((0L, -1L, 1)), "orthogonal vector untouched")
    assert(out(4L)._3 === 0, "near-duplicate dropped")
    assert(out(4L)._1 === 2L && out(4L)._2 === 1L,
      "dominated by both lower-id dup-group members, min recorded")
  }

  test("q77: a degenerate cell of identical vectors stays cap-bounded, dedup intact") {
    // 600 identical vectors in ONE cell (cap = 256) + 1 orthogonal: the
    // all-pairs region is capped, overflow rows compare only against the
    // exemplar, and the kept-set is still exactly {exemplar, orthogonal}
    val dir = vecsDir(
      (1L to 600L).map(i => (i, Seq(1f, 0f, 0f, 0f))) :+ (601L, Seq(0f, 1f, 0f, 0f)))
    val out = vec.VectorQueries.q77.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(4)))).toMap
    assert(out.filter(_._2._2 == 1).keySet === Set(1L, 601L),
      "only the min-id exemplar and the orthogonal vector survive")
    assert(out(600L)._1 === 1L,
      "beyond-cap members carry exactly the one star pair, not |cell| pairs")
    val totalPairs = out.values.map(_._1).sum
    assert(totalPairs === (256L * 255L) / 2 + (600L - 256L),
      s"candidate fan-out must be CAP²/2 + overflow, got $totalPairs")
  }

  test("q78: OOV fraction measures tokens outside the top-16 vocabulary") {
    // 17 distinct words: a01/a02 appear twice (docA + docB), a03..a16
    // once, 'rare' once. Top-16 by (count desc, word asc) excludes
    // exactly 'rare' (ties at count 1 break alphabetically).
    val docA = (1 to 16).map(i => f"a$i%02d").mkString(" ")
    val dir = docsDir(Seq(
      (0L, docA),
      (1L, "a01 a02 rare"),
      (2L, "")))
    val out = text.PipelineQueries.q78.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(out(0L) === ((16L, 0L, 0.0)), "all of docA is in-vocab")
    assert(out(1L) === ((3L, 1L, 1.0 / 3)), "'rare' is the only OOV token")
    assert(out(2L) === ((0L, 0L, -1.0)), "empty doc: zero tokens, null rate")
  }

  test("q79: source-pair trigram Jaccard; sub-trigram sources drop out") {
    val dir = docsDirSrc(Seq(
      (0L, "a b c d", "sA"),   // grams {a b c, b c d}
      (1L, "a b c x", "sB"),   // grams {a b c, b c x}
      (2L, "too short", "sC"))) // < 3 words → no gram set at all
    val rows = text.PipelineQueries.q79.run(spark, dir).collect()
    assert(rows.length === 1, "only the two gram-bearing sources pair up")
    val r = rows.head
    assert((r.getString(0), r.getString(1)) === (("sA", "sB")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 2L, 1L)))
    assert(r.getDouble(5) === 1.0 / 3, "jaccard = |∩| / |∪| = 1/3")
  }

  test("q81: lexical and semantic verdicts disagree exactly where embeddings say so") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    val boiler = "identical boilerplate paragraph repeated verbatim across documents"
    Seq((1L, boiler), (2L, boiler), (3L, boiler), (4L, "totally different content here"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc 3's embedding is orthogonal to 1/2; doc 4 has NO embedding row
    Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)), (3L, Seq(0f, 1f, 0f, 0f)))
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = text.TextQueries.q81.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.isNullAt(3)))).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "only identical texts become LSH candidates")
    assert(out((1L, 2L)) === ((1, 1, 1, false)), "lex dup + identical embedding agree")
    assert(out((1L, 3L)) === ((1, 0, 0, false)),
      "orthogonal embedding → semantic verdict disagrees with lexical")
    assert(out((2L, 3L)) === ((1, 0, 0, false)))
  }

  test("q84: KMV estimates the exact shingle cardinality; sub-k sources stay NULL") {
    // deterministic "random" text: enough distinct 8-char shingles for a
    // meaningful estimate on the big source, fewer than k=64 on the small
    def scramble(seed: Long, n: Int): String =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
        .drop(1).take(n).map(x => ('a' + math.floorMod(x >>> 33, 26)).toChar).mkString
    val big = (0 until 4).map(i => (i.toLong, scramble(i + 1, 400), "big"))
    val small = Seq((10L, "abcdefghij", "small")) // 3 shingles
    val dir = docsDirSrc(big ++ small)
    def exactShingles(texts: Seq[String]): Long =
      texts.flatMap(t => (1 to math.max(t.length - 7, 1)).map(i =>
        t.substring(i - 1, math.min(i + 7, t.length)))).distinct.size.toLong
    val out = text.TextQueries.q84.run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("small").getLong(1) === exactShingles(small.map(_._2)))
    assert(out("small").isNullAt(2) && out("small").isNullAt(3) && out("small").isNullAt(4),
      "fewer than k distinct shingles → the sketch is undefined, not silently exact")
    val b = out("big")
    assert(b.getLong(1) === exactShingles(big.map(_._2)))
    assert(!b.isNullAt(3))
    assert(b.getLong(4) < 500L,
      s"KMV estimate ${b.getLong(3)} should sit within 50% of exact ${b.getLong(1)}")
  }

  test("q85: positives come from dup groups; strided negatives are audited") {
    val boiler = "identical boilerplate paragraph repeated verbatim across documents"
    // N=4: anchors 0/1 are dups (one group); strides {1,11,37,101} mod 4
    // land on ids {1,3,1,1} for anchor 0 — three of its four negatives
    // are secretly its own dup-mate and must be flagged
    val dir = docsDir(Seq(
      (0L, boiler), (1L, boiler),
      (2L, "first unique document with entirely different words inside"),
      (3L, "second unique document about something else altogether now")))
    val rows = text.TextQueries.q85.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(4), r.getInt(5)))).toMap
    assert(rows.size === 16, "4 anchors x 4 strides")
    assert(rows((0L, 1L)) === ((1L, 1L, 1)), "dup-mate drawn as negative is flagged")
    assert(rows((0L, 11L)) === ((1L, 3L, 0)), "honest negative passes the audit")
    assert(rows((0L, 37L))._3 === 1 && rows((0L, 101L))._3 === 1)
    assert(rows((1L, 1L))._1 === 0L, "anchor 1's positive is its group-mate 0")
    assert(rows((2L, 1L))._1 === -1L, "singleton anchors have no positive")
    assert(Seq(1L, 11L, 37L, 101L).forall(st => rows((2L, st))._3 === 0),
      "singleton anchor draws no false negatives")
  }

  test("q82: manifest checksums are content-addressed and hand-computable") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def horner(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
    val trainIds = (0L until 100L).filter(split(_) == "train").take(2)
    val testId = (0L until 1000L).find(split(_) == "test").get
    val byId = Map(trainIds(0) -> "alpha doc", trainIds(1) -> "beta doc",
      testId -> "gamma doc")
    val dir = docsDir(byId.toSeq.map { case (id, t) => (id, t) })
    val out = text.PipelineQueries.q82.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    val trainDocs = trainIds.sorted.map(byId)
    assert(out("train") === ((2L, trainDocs.map(_.length.toLong).sum,
      trainDocs.map(horner).sum, md5hex(trainDocs.map(md5hex).mkString))),
      "train manifest row is exactly the hand-computed volumes + checksums")
    assert(out("test") === ((1L, byId(testId).length.toLong,
      horner(byId(testId)), md5hex(md5hex(byId(testId))))))
    assert(!out.contains("val"), "no val-split doc → no manifest row")
  }

  test("q88: a pasted 8-word run is shared; unique and short docs are clean") {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val dir = docsDir(Seq(
      (0L, boiler),                                   // 1 window, fully shared
      (1L, s"one two three $boiler"),                 // 4 windows, 1 shared
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),         // 3 windows, none shared
      (3L, "tiny doc")))                              // < 8 words → no windows
    val out = text.PipelineQueries.q88.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out(0L) === ((1L, 1L, 1L, Some(1.0))), "whole doc is the shared window")
    assert(out(1L) === ((4L, 4L, 1L, Some(0.25))), "only the pasted run is shared")
    assert(out(2L) === ((3L, 3L, 0L, Some(0.0))), "unique doc shares nothing")
    assert(out(3L) === ((0L, 0L, 0L, None)), "sub-window doc: no windows, NULL frac")
  }

  test("q89: chunk grid covers every token with stride-48 starts and a short tail") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val words100 = (1 to 100).map(i => s"w$i")
    val words5 = (1 to 5).map(i => s"v$i")
    val dir = docsDir(Seq(
      (0L, words100.mkString(" ")), (1L, words5.mkString(" ")), (2L, "")))
    val out = text.PipelineQueries.q89.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out.keySet === Set((0L, 0L), (0L, 1L), (1L, 0L)), "empty doc emits nothing")
    // 100 words: chunk 0 = tokens 1..64, chunk 1 = tokens 49..100 (52 long)
    assert(out((0L, 0L)) === ((0L, 64L, md5hex(words100.take(64).mkString(" ")))))
    assert(out((0L, 1L)) === ((48L, 52L, md5hex(words100.drop(48).mkString(" ")))))
    assert(out((1L, 0L)) === ((0L, 5L, md5hex(words5.mkString(" ")))),
      "short doc is its own single chunk")
  }

  test("q90: sqrt-temperature weights upweight tails; quotas floor to the epoch") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    // 16 + 4 + 1 docs → sqrt counts 4, 2, 1; denominator 7
    val rows = (0 until 16).map(i => (i.toLong, "a", "s_big")) ++
      (16 until 20).map(i => (i.toLong, "b", "s_mid")) :+ ((20L, "c", "s_tiny"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.PipelineQueries.q90.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("s_big") === ((16L, 4.0 / 7, 57142L, (4.0 / 7) / (16.0 / 21))))
    assert(out("s_mid") === ((4L, 2.0 / 7, 28571L, (2.0 / 7) / (4.0 / 21))))
    assert(out("s_tiny") === ((1L, 1.0 / 7, 14285L, (1.0 / 7) / (1.0 / 21))))
    assert(out("s_tiny")._4 === 3.0, "tail source is 3x upsampled")
    assert(out("s_big")._4 < 1.0, "head source is downsampled")
  }

  test("q91: near-dups of the anchor never surface as negatives") {
    val dir = docsDir(Seq(
      (0L, "zebra quokka axolotl pangolin wombat"),
      (1L, "zebra quokka axolotl pangolin wombat"),     // exact dup of anchor 0
      (2L, "zebra quokka axolotl pangolin crocodile"),  // overlap, NOT a near-dup
      (7L, "wombat stew recipe with vegetables"),
      (23L, "unrelated filler text entirely")))
    val rows = text.PipelineQueries.q91.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val anchor0 = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(!anchor0.exists(_._3 == 1L), "dup-group mate is excluded")
    assert(!anchor0.exists(_._3 == 0L), "the anchor itself is excluded")
    assert(anchor0.map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1L, 2L, 4L), (2L, 7L, 1L)),
      "doc 2 (4 rare terms) outranks doc 7 (1 term)")
    for (a <- Seq(0L, 7L, 23L)) {
      val rnks = rows.filter(_._1 == a).map(_._2).sorted.toSeq
      assert(rnks === (1L to rnks.length).toSeq, s"anchor $a ranks are contiguous")
    }
  }

  test("q92: PQ reconstructs a 4-pattern corpus exactly — recall@5 is perfect") {
    // 4 distinct (subspace0 | subspace1) patterns x 3 copies: the 4-code
    // codebooks can represent every vector exactly, so ADC == exact L2
    // and the audit must report full agreement
    def pat(a: Float, b: Float): Seq[Float] =
      Seq.fill(32)(a) ++ Seq.fill(32)(b)
    val pats = Seq(pat(1f, 0f), pat(1f, 5f), pat(0f, 0f), pat(0f, 5f))
    val rows = (0 until 12).map(i => (i.toLong, pats(i % 4)))
    val dir = vecsDir(rows)
    val out = vec.VectorQueries.q92.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet === (0L to 7L).toSet, "all 8 probes report")
    for ((q, (top1, ov, rec)) <- out) {
      assert(top1 === 1, s"probe $q: exact and PQ top-1 must agree")
      assert(ov === 5L && rec === 1.0, s"probe $q: recall@5 must be perfect")
    }
  }

  test("q93: fertility ratios split bytes from chars exactly on non-ASCII text") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    Seq((0L, "hello world", "en"), (1L, "héllo wörld", "de"), (2L, "", "zz"))
      .map { case (id, t, lang) => (id, t, lang, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextQueries.q93.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(8)) None else Some(r.getDouble(8))))).toMap
    assert(out("en") === ((2L, 2L, 11L, 11L, Some(11.0 / 2))), "ASCII: bytes == chars")
    assert(out("de") === ((2L, 2L, 11L, 13L, Some(13.0 / 2))),
      "two 2-byte letters: 11 chars but 13 bytes; BPE still sees 2 tokens")
    assert(out("zz") === ((0L, 0L, 0L, 0L, None)), "empty doc: zero sums, NULL ratios")
  }

  test("q94: MMR promotes the diverse candidate over near-collinear higher-rel ones") {
    import math.{cos, sin, toRadians => rad}
    def v(deg: Double): Seq[Float] =
      Seq(cos(rad(deg)).toFloat, sin(rad(deg)).toFloat, 0f, 0f)
    // probe at 0°; candidates a/b at ±10° (rel .985), c at 20° (rel .940),
    // d at −80° (rel .174 but orthogonal to a) — relevance top-3 would be
    // {a, b, c}; MMR must pick d SECOND because a's clones score ~0
    val dir = vecsDir(Seq(0L -> v(0), 1L -> v(10), 2L -> v(-10),
      3L -> v(20), 4L -> v(-80)))
    val out = vec.VectorQueries.q94.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.map(_._2).toSeq === Seq(1L, 4L, 2L, 3L),
      "pick order: most relevant, then the diverse outlier, then the clones")
    assert(out.length === 4, "pool smaller than k runs dry gracefully")
    assert(out.head._3 === None, "first pick has no preceding-sim")
    // d's max-sim-to-previous is vs a: orthogonal ⟹ ~0
    assert(math.abs(out(1)._3.get) < 1e-6, "the diverse pick is orthogonal to pick 1")
  }

  test("q80: synthetic PII spans are counted and redacted byte-exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir = docsDir((0L to 4L).map(i => (i, "hello")))
    val out = text.PipelineQueries.q80.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5), r.getInt(6)))).toMap
    assert(out(0L) === ((1L, 0L, 0L, md5hex("hello contact <EMAIL> now"), 0)))
    assert(out(1L) === ((0L, 1L, 0L, md5hex("hello node <IP> up"), 0)))
    assert(out(2L) === ((0L, 0L, 1L, md5hex("hello call <PHONE> today"), 0)))
    assert(out(3L) === ((1L, 1L, 0L, md5hex("hello mail <EMAIL> via <IP>"), 0)))
    assert(out(4L) === ((0L, 0L, 0L, md5hex("hello"), 1)), "PII-free doc untouched")
  }

  test("q99: centroid drift sees orthogonal halves at 0 and aligned at 1") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    // label 0: even vecs on x-axis, odd vecs on y-axis → cos drift 0
    // label 1: odd half is a scaled copy of the even half → cos drift 1
    Seq(
      (0L, Seq(1f, 0f), 0), (2L, Seq(3f, 0f), 0),
      (1L, Seq(0f, 1f), 0), (3L, Seq(0f, 2f), 0),
      (10L, Seq(1f, 1f), 1), (12L, Seq(3f, 3f), 1),
      (11L, Seq(2f, 2f), 1))
      .toDF("vec_id", "embedding", "label")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = vec.VectorQueries.q99.run(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(out(0)._1 === 2L && out(0)._2 === 2L)
    assert(math.abs(out(0)._3) < 1e-15, "orthogonal half-centroids → drift cos 0")
    assert(out(1)._1 === 2L && out(1)._2 === 1L)
    assert(math.abs(out(1)._3 - 1.0) < 1e-12, "scaled-copy halves → drift cos ≈ 1")
  }

  test("q100: wider probes buy recall monotonically; the sweep counts are exact") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-cur").toFile.getAbsolutePath
    // two well-separated clusters; every vector is a probe (id < 8) —
    // nprobe=1 sees only the own cell, nprobe=2 reaches the other one
    Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0), (2L, Seq(0.8f, 0.2f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1), (5L, Seq(0.2f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = vec.VectorQueries.q100.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows((1L, 0L)) === ((2L, 2L, 0.2)), "own cell: 2 candidates, both in top-10")
    assert(rows((2L, 0L)) === ((5L, 5L, 0.5)), "second probe reaches the far cluster")
    assert(rows((4L, 0L)) === ((5L, 5L, 0.5)), "only 2 cells exist: nprobe=4 ≡ 2")
    for (q <- 0L to 5L) {
      assert(rows((1L, q))._1 <= rows((2L, q))._1 && rows((2L, q))._1 <= rows((4L, q))._1,
        s"candidate count must be monotone in nprobe for q$q")
      assert(rows((1L, q))._3 <= rows((2L, q))._3 && rows((2L, q))._3 <= rows((4L, q))._3,
        s"recall must be monotone in nprobe for q$q")
    }
  }

  test("q103: HRW routing matches an independent argmax; only new-shard moves") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hrw(id: Long, n: Int): Long =
      (0 until n).map(sh => md5hex(s"$id#$sh") -> sh.toLong).max._2
    val ids = 0L until 50L
    val dir = docsDir(ids.map(i => (i, "x" * (i.toInt % 7 + 1))))
    val expected = ids.groupBy(hrw(_, 8)).map { case (sh, g) =>
      sh -> ((g.size.toLong, g.map(i => (i % 7 + 1)).sum,
        g.count(i => hrw(i, 9) != hrw(i, 8)).toLong))
    }
    val out = text.TextQueries.q103.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === expected, "per-shard counts/chars/moves must match the reference argmax")
    // HRW's contract: every reassignment lands ON the new shard (so a
    // 9-way re-derivation would show shard 8 gaining exactly the movers)
    assert(ids.forall(i => hrw(i, 9) == hrw(i, 8) || hrw(i, 9) == 8L))
    val movedTotal = out.values.map(_._3).sum
    assert(movedTotal < ids.size / 2, "consistent hashing moves a small minority")
  }

  test("q105: redundancy concentrates where the quality screens already fail") {
    // clean docs: one duplicated pair + one unique (redundancy 1/3)
    // spam docs (fail top2gram+dup3gram): one duplicated pair + nothing
    // unique → redundancy 1/2 — lift visible in the 2-row table
    val clean1 = (1 to 40).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val clean2 = (1 to 40).map(i => s"delta$i epsi$i zeta$i").mkString(" ")
    val spam = "spam ham spam ham spam ham spam ham spam ham spam ham spam ham"
    val dir = docsDir(Seq(
      (0L, clean1), (1L, clean1), (2L, clean2),
      (3L, spam), (4L, spam)))
    val out = text.TextQueries.q105.run(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) === ((3L, 1L, 1.0 / 3)), "clean bucket: dup copy of doc 0")
    assert(out(0) === ((2L, 1L, 0.5)), "fail bucket: dup copy of doc 3")
  }

  test("q106: the contingency partitions the corpus and agrees with the q70 funnel") {
    val dir = "/root/testdata/sf0.001"
    val cells = text.TextQueries.q106.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        ((r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(cells.values.map(_._2).sum === 500L, "cells partition the corpus")
    assert(math.abs(cells.values.map(_._3).sum - 1.0) < 1e-12)
    for (((l, q, e, n), (ff, _, _)) <- cells)
      assert(ff === 4 - l - q - e - n, "failed-filter count derives from the flags")
    val funnel = text.TextQueries.q70.run(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val allPass = cells.get((1L, 1L, 1L, 1L)).map(_._2).getOrElse(0L)
    assert(allPass === funnel(4),
      "the all-pass cell must equal the funnel's stage-4 survivor count")
  }

  test("q154: priority-sample estimates track true mass; tiny groups are exact") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ps").toString
    // heavy-tailed weights in a big source (estimator band) and one
    // group smaller than K (τ undefined → estimator must be EXACT)
    val big = (0 until 800).map(i =>
      (i.toLong, "t", "en", "big", (10L + (i % 97) * (i % 89))))
    val tiny = (0 until 5).map(i =>
      (10000L + i, "t", "en", "tiny", 100L + i))
    (big ++ tiny).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.PipelineQueries.q154.run(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val b = out("big")
    assert(b.getLong(2) === 32L, "k_eff = K for the big source")
    val est = b.getDouble(4); val truth = b.getLong(5).toDouble
    assert(math.abs(est - truth) / truth < 0.5,
      s"DLT estimate from 32 samples should land near truth: est=$est true=$truth")
    val t = out("tiny")
    assert(t.getLong(2) === 5L, "k_eff = group size when n < K")
    assert(t.getDouble(4) === t.getLong(5).toDouble,
      "without a (K+1)-th priority the estimator degenerates to the exact sum")
  }
}
