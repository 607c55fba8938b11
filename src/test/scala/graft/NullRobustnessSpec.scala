package graft

import org.apache.spark.sql.functions._

/** Null-robustness sweep: a 100 TB corpus HAS null/empty rows, but the
  * driver testdata has none, so the oracle gate can never catch a crash
  * on them. This spec replays the catalog's text/multimodal/behavioral
  * entry points over a null-injected copy of the sf0.001 tables — the
  * sweep that originally caught four crashes (q62/q74 non-nullable
  * encoder, q122 ANSI divide-by-zero on empty-vs-empty pairs, q129 NPE
  * on a null payload).
  */
class NullRobustnessSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 3, lit(null: String))
          .when(pmod(col("doc_id"), lit(11)) === 5, lit(""))
          .otherwise(col("text")))
      .withColumn("lang",
        when(pmod(col("doc_id"), lit(13)) === 4, lit(null: String)).otherwise(col("lang")))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("value",
        when(pmod(col("event_id"), lit(17)) === 2, lit(null: java.lang.Double))
          .otherwise(col("value")))
      .withColumn("props",
        when(pmod(col("event_id"), lit(19)) === 3, lit(null: String)).otherwise(col("props")))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // lineitem: null prices/quantities exercise the relational
    // aggregate/quantile paths (q42's driver-side bin walk ranks only
    // binnable rows — a null-heavy flag group must not MatchError)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("l_extendedprice",
        when(pmod(col("l_orderkey"), lit(23)) === 7, lit(null: java.lang.Double))
          .otherwise(col("l_extendedprice")))
      .withColumn("l_quantity",
        when(pmod(col("l_orderkey"), lit(29)) === 11, lit(null: java.lang.Double))
          .otherwise(col("l_quantity")))
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    // orders: null totalprice exercises the vacuum ledger's byte sum
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(31)) === 9, lit(null: java.lang.Double))
          .otherwise(col("o_totalprice")))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  private val names = Seq(
    // the four originally-crashing queries (q42's driver bin walk joined
    // the class in round 8 — null prices made the rank plan MatchError)
    "q42_sketch_aggregates", "q65_exact_quantiles",
    "q62_greedy_packing", "q74_token_budget",
    "q122_edit_verified_dedup", "q129_asset_feature_rollup",
    // representative kernels / families over the same nullable columns
    "q27_text_stats", "q28_lang_id", "q29_exact_dedup", "q48_minhash_lsh_dedup",
    "q57_bpe_tokens", "q80_pii_redaction", "q153_sorted_neighborhood",
    "q154_priority_sample_audit", "q155_shard_manifest",
    "q156_group_split_assign", "q132_event_transitions", "q152_funnel_latency", "q162_incremental_mv",
    "q163_bpe_merge_train", "q164_kmv_source_overlap",
    // round-8 additions: suffix ranking (null/empty text), changelog
    // compaction + zorder audit (null props → null key/morton)
    "q157_suffix_dup_spans", "q158_changelog_snapshot", "q159_zorder_layout_audit",
    // round-9 additions: record linkage (null text → no title), time
    // travel (null props/value), weighted quantiles (null price/quantity)
    "q169_record_linkage", "q170_time_travel_read", "q171_weighted_quantiles",
    // round-10 addition: rank-windowed linkage (null text → no title;
    // null lang irrelevant — the rank key is the title itself)
    "q173_record_linkage_snm",
    // round-10 second wave: RRF fusion (null text → empty lexical leg),
    // compaction planner (null quantities drop out of the byte sum),
    // OHLC bars (null-mid ticks filtered), triangles (ride the dedup
    // memos over null/empty text)
    "q174_hybrid_rrf_fusion", "q175_compaction_planner",
    "q176_ohlc_bars", "q177_dup_graph_triangles",
    // frame sampling (null text → zero-frame asset row survives the left join)
    "q178_frame_sample_scenes",
    // vacuum audit (null totalprice drops out of the ledger byte sum)
    "q179_vacuum_audit",
    // resize audit (null text → zero raster, octave 0)
    "q180_image_resize_audit",
    // VPIN (null value → null mid ticks filtered before bucketing)
    "q181_vpin_toxicity")

  for (name <- names)
    test(s"$name survives null/empty text, lang, value, and props rows") {
      val out = SparkEntry.queries(name)(spark, dir)
      // materialize fully — crashes here are the regression being pinned
      assert(out.collect().length >= 0)
    }
}
