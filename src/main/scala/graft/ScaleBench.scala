package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Scale-up linearity probe for the dedup/ANN layer and the
  * behavioral-analytics family: synthesizes a 10× documents +
  * embeddings + events corpus from sf0.1 and times the catalog
  * queries at 1× vs 10×, printing per-query step ratios.
  *
  * The copies are CONTENT-DECORRELATED so density stays realistic
  * rather than exploding: each document copy rewrites ten frequent
  * letters through a rotated substitution alphabet (in-copy near-dup
  * structure preserved exactly — identical texts stay identical — while
  * cross-copy shingle Jaccard collapses); each embedding copy rotates
  * the component order (decorrelating hyperplane codes across copies).
  * A 10× corpus therefore has ~10× the docs, ~10× the near-dup groups,
  * and roughly constant group size — the realistic growth mode.
  *
  * Usage: `sbt "runMain graft.ScaleBench"` — writes the corpus under
  * target/scale{N} once (reused after), prints one JSON line per scale.
  */
object ScaleBench {

  /** Copy multiplier — 10 by default; set SPARK_GRAFT_SCALE_COPIES=100
    * for the 100x probe. Decorrelation composes two independent
    * substitution alphabets for text (10 x 10 = 100 distinct maps) and
    * rotation x sign-flip patterns for embeddings (64 x flips), so no
    * two copies share a transform up to 100x. The 1000x probe (round
    * 12) adds a THIRD text dimension: the hundreds digit rotates the
    * combined 20-letter alphabet by 2*(k/100). The image of the first
    * 10-letter block under that rotation is a distinct 20-cycle
    * interval per digit, so the composite permutation uniquely encodes
    * (k%10, k/10%10, k/100) — 1000 distinct maps, and k<100 keeps the
    * identity so the 10x/100x corpora are byte-identical to prior
    * rounds' artifacts.
    *
    * EMBEDDING transforms are coarser (spec-pinned, round 15): the
    * flip stage cycles through only 6 single-bit masks ((j−1) % 6 for
    * j = k/64 ≥ 1) plus the j = 0 identity, so there are exactly
    * 64 rotations × 7 flips = 448 distinct transforms — shared-label
    * copies k and k+384 (k ≥ 64) carry EXACT duplicate vectors at
    * 1000×. Copy 0 (the probe set: identity transform) has no twin,
    * so the recall audits are unaffected; in `percopy` label mode the
    * per-copy clEn offsets separate the twins geometrically anyway.
    * Consumers needing fully distinct embeddings at 1000× should use
    * percopy mode.
    */
  private val Copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
  private val alphabet = "etaoinsrhl"
  private val alphabet2 = "dcumfpgwyb"

  private def rotated(a: String, k: Int): String =
    a.drop(k % a.length) + a.take(k % a.length)

  /** The composite text permutation copy `k` applies, as a pure char
    * map over the 20-letter domain — the driver-side twin of the three
    * `translate` stages in [[gen]], built from the SAME alphabet/rotation
    * values. Exists so ScaleBenchGenSpec can pin the corpus-design
    * invariants (1000 distinct permutations; k < 100 leaves the third
    * stage an identity) — the round-12 t3-transcription bug class — and
    * verify the map against the actual column ops.
    */
  private[graft] def textPermutation(k: Int): Map[Char, Char] = {
    def tmap(from: String, to: String): Map[Char, Char] = from.zip(to).toMap
    val m1 = if (k % 10 == 0) Map.empty[Char, Char]
      else tmap(alphabet, rotated(alphabet, k % 10))
    val m2 = if ((k / 10) % 10 == 0) Map.empty[Char, Char]
      else tmap(alphabet2, rotated(alphabet2, (k / 10) % 10))
    val ab = alphabet + alphabet2
    val m3 = if (k / 100 == 0) Map.empty[Char, Char]
      else tmap(ab, rotated(ab, 2 * (k / 100)))
    ab.map { c =>
      val c1 = m1.getOrElse(c, c)
      val c2 = m2.getOrElse(c1, c1)
      c -> m3.getOrElse(c2, c2)
    }.toMap
  }

  /** The copy-`k` embedding transform: component rotation + a sign
    * stage. `decor` selects the sign stage:
    *
    *   - `"flips"` (default, byte-identical to every prior round's
    *     corpus): the 6-mask single-bit flip family — 64 × 7 = 448
    *     distinct transforms, so shared-label copies k and k+384
    *     (k ≥ 64) carry EXACT duplicate vectors at 1000×
    *     (ScaleBenchGenSpec pins this).
    *   - `"signs"` (opt-in, SPARK_GRAFT_EMB_DECOR=signs): an md5-derived
    *     full sign vector per copy — a SIGNED PERMUTATION, i.e. an
    *     isometry: every in-copy dot product (and so the in-copy
    *     near-dup structure under cosine) is preserved exactly up to
    *     fold order, while cross-copy directions decorrelate and the
    *     448-transform ceiling disappears (2⁶⁴ sign patterns). This is
    *     the count-growth corpus for NEAR-DUP geometry — the percopy
    *     label mode's counterpart one level down, at the vector values
    *     themselves: true near-dup mass grows ∝ N (in-copy only)
    *     instead of ∝ N² (the 448-ceiling direction groups).
    */
  private[graft] def embTransform(k: Int, dim: Int, decor: String)
                                 (e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rot = k % dim
    val rotatedC =
      if (rot == 0) e
      else concat(slice(e, rot + 1, dim - rot), slice(e, 1, rot))
    val j = k / dim
    if (j == 0) rotatedC
    else if (decor == "signs")
      transform(rotatedC, (x, i) =>
        when(conv(md5(concat(lit(s"edx#$k#"), i.cast("string"))
            .cast("binary")).substr(1, 1), 16, 10).cast("long") % 2 === 1, -x)
          .otherwise(x))
    else
      transform(rotatedC, (x, i) =>
        when(shiftright(i, (j - 1) % 6).bitwiseAND(lit(1)) === 1, -x).otherwise(x))
  }

  private def delRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delRec))
    f.delete(); ()
  }

  /** Crash-safe materialization: write to `<dest>.tmp`, then rename into
    * place. A run killed mid-write leaves only the tmp dir, so the
    * presence check ([[present]]) never sees a partial artifact; the
    * `_SUCCESS` marker additionally invalidates partials left by
    * pre-fix rounds that wrote to `dest` directly.
    */
  /** Balanced pairwise union of the per-copy frames. A plain
    * `reduce(_ unionByName _)` builds a Copies-deep LEFT-LEANING plan
    * whose recursive analysis blows the JVM stack around ~4-5 k
    * branches (measured: 2500 copies fine, 5000 -> StackOverflow in
    * LazyTry under the analyzer); the balanced tree is depth
    * ceil(log2 Copies) (~13 at 5000) and analyzes in linear time.
    */
  @annotation.tailrec
  private def treeUnion(dfs: Seq[DataFrame]): DataFrame =
    if (dfs.lengthCompare(1) == 0) dfs.head
    else treeUnion(dfs.grouped(2).map {
      case Seq(a, b) => a.unionByName(b)
      case Seq(a) => a
    }.toSeq)

  /** One write JOB per ≤ WriteChunk copies (append into the same .tmp
    * dir, single rename at the end): even with the balanced union, a
    * single 5000-branch write job dies on spark.driver.maxResultSize —
    * every task ships per-operator SQL-metric accumulator updates, and
    * ~50 k operators × ~1 k tasks exceeds the 1 GiB driver cap. Chunked
    * jobs keep the per-task payload proportional to the chunk, and the
    * commit contract is unchanged (the rename is still the atomic
    * publish; _SUCCESS lands with the final chunk).
    */
  private val WriteChunk = 500

  private def writeCommitted(dfs: Seq[DataFrame], dest: String): Unit = {
    val tmp = new java.io.File(dest + ".tmp")
    if (tmp.exists()) delRec(tmp)
    dfs.grouped(WriteChunk).foreach { chunk =>
      treeUnion(chunk).write.mode("append").parquet(tmp.getPath)
    }
    val d = new java.io.File(dest)
    if (d.exists()) delRec(d)
    require(tmp.renameTo(d), s"rename ${tmp.getPath} -> $dest failed")
  }

  private def present(outDir: String, t: String): Boolean =
    new java.io.File(s"$outDir/$t.parquet/_SUCCESS").exists()

  /** Each table is guarded independently — a failure in one leg (or a
    * pre-existing artifact from an earlier run) never forces or blocks
    * regeneration of the others.
    */
  /** Optional comma-separated table subset (SPARK_GRAFT_SCALE_TABLES) —
    * extreme-scale probes (e.g. 1000×) only need the tables their
    * queries read; generating the full five-table corpus there would
    * cost tens of GB for legs nothing consumes.
    */
  private val genTables: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_SCALE_TABLES").map(_.split(",").toSet)

  private def wanted(t: String): Boolean = genTables.forall(_.contains(t))

  private def gen(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    if (wanted("documents") && !present(outDir, "documents")) {
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      val nD = docs.count()
      writeCommitted((0 until Copies).map { k =>
        val t1 = if (k % 10 == 0) col("text")
          else translate(col("text"), alphabet, rotated(alphabet, k % 10))
        val t2 = if ((k / 10) % 10 == 0) t1
          else translate(t1, alphabet2, rotated(alphabet2, (k / 10) % 10))
        val ab = alphabet + alphabet2
        val t3 = if (k / 100 == 0) t2
          else translate(t2, ab, rotated(ab, 2 * (k / 100)))
        docs.select(
          (col("doc_id") + lit(k * nD)).as("doc_id"),
          t3.as("text"),
          col("lang"), col("source"), col("n_chars"))
      }, s"$outDir/documents.parquet")
    }

    if (wanted("embeddings") && !present(outDir, "embeddings")) {
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      val nE = emb.count()
      val dim = emb.select(size(col("embedding"))).first().getInt(0)
      // Label mode. "shared" (default): every copy keeps the base label,
      // so the clEn cluster COUNT stays 10 and in-cluster DENSITY grows
      // Copies× — in-cluster values are rotated iid-uniform noise, so at
      // 1000× each cluster is ~200k points with full distance
      // concentration: the adversarial no-local-structure regime where
      // exact-top-k recall is unavailable to ANY sublinear index (the
      // round-14 receipts measure exactly that). "percopy": each copy
      // gets fresh labels (label + k·nLabels), so the clEn cluster COUNT
      // grows Copies× at fixed ~200-point cluster size — the growth mode
      // real embedding corpora have (new content adds new local
      // neighborhoods; it does not thicken existing noise balls). The
      // ANN serving receipts use percopy; see PERF.md round 15.
      val perCopyLabels =
        sys.env.getOrElse("SPARK_GRAFT_EMB_LABEL_MODE", "shared") == "percopy"
      // stride = max(label)+1, NOT countDistinct: with a non-contiguous
      // label domain (say {0, 2}) a distinct-count stride would collide
      // label L + k·stride across copies, silently merging clusters and
      // corrupting the percopy geometry premise
      val nLab =
        if (perCopyLabels)
          emb.agg(max(col("label"))).first().getInt(0) + 1
        else 0
      // rotation + sign stage per copy — see [[embTransform]] for the
      // two sign modes (default 6-mask flips vs md5 sign vectors)
      val embDecor = sys.env.getOrElse("SPARK_GRAFT_EMB_DECOR", "flips")
      writeCommitted((0 until Copies).map { k =>
        emb.select(
          (col("vec_id") + lit(k * nE)).as("vec_id"),
          embTransform(k, dim, embDecor)(col("embedding")).as("embedding"),
          (if (perCopyLabels) (col("label") + lit(k * nLab)).cast("int")
           else col("label")).as("label"))
      }, s"$outDir/embeddings.parquet")
    }

    // events: the realistic growth mode for a behavioral stream is MORE
    // USERS over the SAME wall-clock span (densities grow ~Copies×, the
    // session/retention/burst windows keep their extent). Each copy gets
    // fresh user_ids (user_id + k·stride) and a distinct sub-second
    // timestamp jitter (k·1009 µs — prime, so no two copies collide on
    // an exact microsecond grid), preserving per-user event ORDER and
    // the hourly/daily bucketing while decorrelating exact-ts joins.
    // The event_type alphabet is untouched: q149's bounded-pairs claim
    // and q132's transition matrix depend on it staying fixed.
    // Tables() normalizes `ts` to epoch-nano LONG whatever the parquet's
    // physical encoding, and the copy is written back as plain INT64
    // nanos — byte-compatible with every query's `ts div 1000`
    // arithmetic (Tables' normalization is a type-conditional no-op on
    // the round-trip read).
    if (wanted("events") && !present(outDir, "events")) {
      val ev = Tables(spark, baseDir, "events")
      val nEv = ev.count()
      val userStride = ev.agg(max("user_id")).first().getLong(0) + 1
      writeCommitted((0 until Copies).map { k =>
        ev.select(
          (col("event_id") + lit(k * nEv)).as("event_id"),
          (col("ts") + lit(k * 1009L * 1000L)).as("ts"),
          (col("user_id") + lit(k * userStride)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }, s"$outDir/events.parquet")
    }

    // orders: feeds the vacuum-audit probe (q179). Copies get fresh
    // order keys (file-ledger uniqueness: file_id = o_orderkey div 5
    // must not collide across copies) and a +k-cent price shift so the
    // byte ledger isn't the 1× ledger times Copies.
    if (wanted("orders") && !present(outDir, "orders")) {
      val ord = spark.read.parquet(s"$baseDir/orders.parquet")
      val okStride = ord.agg(max("o_orderkey")).first().getLong(0) + 5
      writeCommitted((0 until Copies).map { k =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * okStride))
          .withColumn("o_totalprice",
            round(col("o_totalprice") + lit(k * 0.01), 2))
      }, s"$outDir/orders.parquet")
    }

    // lineitem: feeds the distributed-exact-quantile probe (q65) and the
    // relational aggregate family at scale. Copies get fresh order keys
    // (join-key uniqueness) and a per-copy +k-cent price shift so the
    // 100× distribution is NOT just the 1× histogram with 100× counts —
    // every copy contributes distinct values, so the rank-pick
    // interpolation at 100× exercises ranks no smaller scale saw.
    // Flags/status/dates stay fixed: group cardinality is part of the
    // operator contract (3 return flags at any scale).
    if (wanted("lineitem") && !present(outDir, "lineitem")) {
      val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      val okStride = li.agg(max("l_orderkey")).first().getLong(0) + 1
      writeCommitted((0 until Copies).map { k =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(k * okStride))
          .withColumn("l_extendedprice",
            round(col("l_extendedprice") + lit(k * 0.01), 2))
      }, s"$outDir/lineitem.parquet")
    }
  }

  private val queryNames = Seq(
    "q27_text_stats", "q29_exact_dedup", "q30_shingle_stats",
    "q31_minhash_signatures", "q32_simhash", "q36_knn_bruteforce",
    "q39_embedding_neardup", "q44_ivf_ann", "q48_minhash_lsh_dedup",
    "q51_dedup_keep_longest", "q52_ivf_multiprobe", "q53_rolling_fingerprint",
    "q54_kmeans_ivf", "q57_bpe_tokens", "q58_repetition_quality",
    "q59_sequence_packing", "q61_tfidf_topterms",
    "q66_benchmark_decontam", "q67_simhash_neardup",
    "q68_int8_quant_recall", "q69_cdc_chunk_dedup", "q70_curation_funnel",
    "q71_simhash64_neardup", "q72_embedding_neardup_wide",
    "q73_split_leakage", "q74_token_budget", "q75_corpus_datasheet",
    "q76_corpus_likelihood",
    // q77 semantic dedup is EXCLUDED by the same analysis as the 8-bit
    // band points: its 10 label-cells are fixed, so a 10× corpus grows
    // every cell 10× and the in-cell pair count 100× — quadratic BY the
    // toy clustering, not the operator (SemDeDup's contract is k ∝ N;
    // see the q77 scaladoc). Including it would just re-measure that.
    "q78_vocab_oov", "q79_source_overlap", "q80_pii_redaction",
    "q81_hybrid_neardup", "q82_release_manifest", "q83_curriculum_buckets",
    "q84_kmv_distinct", "q85_contrastive_pairs", "q86_bm25_topk",
    "q87_phrase_search", "q88_dup_substrings", "q89_rag_chunks",
    "q90_mixture_weights", "q91_hard_negatives", "q92_pq_adc_recall",
    "q93_tokenizer_fertility", "q94_mmr_diverse", "q95_stratified_sample",
    "q96_release_diff", "q97_pmi_collocations", "q98_truncation_curve",
    "q99_centroid_drift", "q100_ann_tuning", "q101_curriculum_order",
    "q102_minhash_calibration", "q103_hrw_sharding", "q104_canonical_rank",
    "q105_quality_dup_lift", "q106_filter_overlap", "q107_bucketed_batching",
    "q108_winnowing_overlap", "q109_cms_heavy_hitters", "q110_hll_distinct_audit",
    "q153_sorted_neighborhood", "q154_priority_sample_audit",
    "q155_shard_manifest", "q156_group_split_assign",
    "q157_suffix_dup_spans", "q158_changelog_snapshot",
    "q159_zorder_layout_audit", "q160_nn_descent_recall",
    "q161_graph_beam_search", "q162_incremental_mv", "q163_bpe_merge_train", "q164_kmv_source_overlap", "q165_knn_label_propagation", "q166_graph_insert_audit", "q167_kcenter_coreset",
    "q168_graph_ann_clustered", "q182_sharded_nn_descent",
    "q183_ivf_multiprobe_serve", "q184_embedding_neardup_indep",
    "q169_record_linkage", "q170_time_travel_read", "q171_weighted_quantiles", "q172_frequent_itemsets",
    "q173_record_linkage_snm",
    "q174_hybrid_rrf_fusion", "q175_compaction_planner",
    "q176_ohlc_bars", "q177_dup_graph_triangles", "q178_frame_sample_scenes",
    "q179_vacuum_audit", "q180_image_resize_audit", "q181_vpin_toxicity",
    "q112_bloom_decontam", "q113_contamination_spans", "q114_dedup_pagerank", "q115_zonemap_pruning",
    "q117_binary_ahash_neardup", "q118_postings_gamma_audit", "q119_source_cap_sweep",
    "q120_chunk_overlap_audit", "q121_dsir_importance", "q122_edit_verified_dedup",
    "q123_vocab_size_sweep", "q124_vocab_growth", "q126_dedup_topology",
    "q127_next_token_accuracy", "q128_dedup_threshold_sweep",
    "q129_asset_feature_rollup", "q135_skyline_docs", "q138_dim_truncation_recall",
    "q140_rake_keywords", "q150_release_gate",
    // behavioral-analytics family over the synthesized events stream
    // (round-6 addition: these were the only catalog queries with no
    // linearity datapoint)
    "q132_event_transitions", "q136_funnel_conversion",
    "q137_retention_cohorts", "q139_last_touch_attribution",
    "q141_event_value_percentiles", "q142_robust_anomaly_screen",
    "q143_recency_engagement", "q146_hourly_burst_detection",
    "q149_session_basket_lift", "q151_ab_srm_audit", "q152_funnel_latency")

  /** Optional comma-separated subset (SPARK_GRAFT_SCALE_ONLY) — the
    * 100× probe runs the width-scaled pairs only; fixed-8-bit band
    * queries are N²/2⁸ by design there (see PERF.md) and would swamp
    * the run demonstrating exactly that.
    */
  private val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)

  private def timeAll(spark: SparkSession, dir: String): Seq[(String, Double)] =
    SparkEntry.catalog
      .filter(q => queryNames.contains(q.name) && only.forall(_.contains(q.name)))
      .map { q =>
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      q.name -> dt
    }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_SCALE_SUFFIX names a VARIANT corpus dir (e.g. "pc" for
    // the percopy-label embeddings) so it never clobbers the default
    // artifacts other probes reuse. Percopy label mode DEFAULTS the
    // suffix to "pc" rather than allowing an unsuffixed run: without
    // this, percopy either silently kept an existing shared-label
    // corpus (the _SUCCESS guard) or wrote percopy embeddings into the
    // default path every other probe assumes is shared-label — the two
    // corpora could alias.
    val suffix = sys.env.get("SPARK_GRAFT_SCALE_SUFFIX").getOrElse(
      (if (sys.env.get("SPARK_GRAFT_EMB_LABEL_MODE").contains("percopy")) "pc"
       else "") +
        (if (sys.env.get("SPARK_GRAFT_EMB_DECOR").contains("signs")) "dx"
         else ""))
    val out = new java.io.File(s"target/scale$Copies$suffix").getAbsolutePath
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // gen() self-guards per table (committed `_SUCCESS` markers), so an
    // existing scale dir is upgraded in place and a crashed leg is
    // retried without regenerating the healthy artifacts
    gen(spark, base, out)
    if (sys.env.get("SPARK_GRAFT_SCALE_GEN_ONLY").contains("1")) {
      println(s"""{"metric":"scale_gen_only","dir":"$out"}""")
      spark.stop(); return
    }

    // JIT/codegen warmup at the small scale so both measured scales are
    // equally warm
    timeAll(spark, "/root/testdata/sf0.01")

    val t1 = timeAll(spark, base)
    val t10 = timeAll(spark, out)
    def json(ts: Seq[(String, Double)], sf: String) = {
      val qs = ts.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      s"""{"metric":"scale_total","value":${f"${ts.map(_._2).sum}%.3f"},"unit":"sec","queries":$qs,"sf":"$sf"}"""
    }
    println(json(t1, base))
    println(json(t10, out))
    val r = t1.zip(t10).map { case ((n, a), (_, b)) => n -> (if (a > 0) b / a else 0.0) }
    println(r.map { case (n, x) => "\"" + n + "\":" + f"$x%.2f" }
      .mkString(s"""{"metric":"step_ratio_${Copies}x",""", ",", "}"))
    spark.stop()
  }
}
