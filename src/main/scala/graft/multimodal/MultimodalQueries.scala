package graft.multimodal

import graft.Q
import org.apache.spark.sql.functions._

/** Catalog queries over the multimodal asset layer: near-dup detection
  * on OPAQUE BINARY payloads — the image/audio analog of text dedup,
  * run entirely on bytes the engine never decodes (the builder brief's
  * multimodal plumbing: a real codec would slot into
  * [[Multimodal.extractFeatures]]'s partition boundary without touching
  * this plan).
  */
object MultimodalQueries {

  // --------------------------------------------------------------- q117
  /** Binary perceptual-hash near-dup: 64-bit byte-bigram aHash
    * ([[graft.functions.AHashBands]]) split into four 16-bit bands;
    * candidate pairs via the band-equality self-join (the q48 LSH
    * pattern on Hamming space: for τ ≤ 3 pigeonhole makes banding
    * EXACT — a pair at Hamming ≤ 3 cannot differ in all 4 bands);
    * verify = exact Hamming over the band codes, keep τ ≤ 2 (the
    * corpus's ±4-char-edit families sit at ≤ 2, background mass starts
    * at 3+).
    *
    * Scale: the hash is one O(n) codegen'd pass per payload; the join
    * shuffles 4 small (id, code) rows per asset, never payload bytes.
    * Band buckets are bounded the same way q48's LSH buckets are — a
    * hot code (e.g. all-zero bands from tiny payloads) is the salting
    * candidate at 100 TB, and AQE's skew-join split handles the
    * residual. Hamming verification touches only candidate pairs.
    */
  val q117 = Q("q117_binary_ahash_neardup",
    (s, dir) => {
      graft.functions.AHashBands.ensureRegistered(s)
      val hashed = Multimodal.syntheticAssets(s, dir).toDF()
        .select(col("asset_id"), expr("ahash_bands(payload)").as("bands"))
      val banded = hashed.select(col("asset_id"), col("bands"),
        posexplode(col("bands")).as(Seq("band_idx", "band_code")))
      banded.as("a").join(banded.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_code") === col("b.band_code") &&
            col("a.asset_id") < col("b.asset_id"))
        .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
          col("a.bands").as("ba"), col("b.bands").as("bb"))
        .groupBy("id_a", "id_b", "ba", "bb")
        .agg(count(lit(1)).as("n_bands_equal"))
        .withColumn("hamming",
          expr("CAST(aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v) AS BIGINT)"))
        .filter(col("hamming") <= 2)
        .select("id_a", "id_b", "n_bands_equal", "hamming")
        .transform(graft.Q.presentSorted(_, "id_a", "id_b"))
    },
    // The oracle rebuilds the same hash from hex(encode(text)) nibbles —
    // the payload IS the UTF-8 text bytes ([[Multimodal.syntheticAssets]]),
    // so both engines hash identical octet streams with identical integer
    // math, then mirror the banding + Hamming verify bit-for-bit.
    Some("""WITH bytes AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), blist AS (
      SELECT doc_id, greatest(n - 1, 0) AS ng,
        list_transform(generate_series(1, n), k ->
          (strpos('0123456789ABCDEF', substr(hx, 2*k-1, 1)) - 1) * 16 +
          (strpos('0123456789ABCDEF', substr(hx, 2*k, 1)) - 1)) AS bs
      FROM bytes
    ), grams AS (
      SELECT doc_id, ng,
        list_transform(generate_series(1, ng), k ->
          (bs[k] * 31 + bs[k+1]) % 64) AS gs
      FROM blist
    ), hist AS (
      SELECT doc_id, ng,
        list_transform(generate_series(0, 63), i ->
          len(list_filter(gs, g -> g = i))) AS bins
      FROM grams
    ), bands AS (
      SELECT doc_id,
        list_transform(generate_series(0, 3), j ->
          list_reduce(list_prepend(0, list_transform(generate_series(0, 15), k ->
            CASE WHEN bins[16*j + k + 1] > ng // 64 THEN 1 << k ELSE 0 END)),
            (a, x) -> a + x)) AS bands
      FROM hist
    ), banded AS (
      SELECT doc_id, j AS band_idx, bands[j + 1] AS band_code, bands
      FROM bands, generate_series(0, 3) t(j)
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.bands AS ba, b.bands AS bb,
        count(*) AS nbe
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_code = b.band_code
        AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), scored AS (
      SELECT id_a, id_b, CAST(nbe AS BIGINT) AS n_bands_equal,
        CAST(list_reduce(list_prepend(0, list_transform(generate_series(1, 4), j ->
          bit_count(xor(CAST(ba[j] AS BIGINT), CAST(bb[j] AS BIGINT))))),
          (a, x) -> a + x) AS BIGINT) AS hamming
      FROM cand
    )
    SELECT id_a, id_b, n_bands_equal, hamming
    FROM scored WHERE hamming <= 2
    ORDER BY id_a, id_b"""))

  // --------------------------------------------------------------- q129
  /** Asset feature rollup through the REAL decode path: the
    * [[Multimodal.extractFeatures]] `mapPartitions` batch boundary
    * (where a vectorized codec lives) feeds a per-kind rollup — asset
    * count, byte mass, header checksum mass, distinct content
    * fingerprints (exact-dup count across modality). This routes the
    * partition-local decode plumbing through the ORACLED catalog: the
    * oracle recomputes every feature from the payload bytes
    * (octet_length / first-16-byte sum via hex nibbles / md5), so a
    * drift in the decode stub's byte handling fails the gate.
    *
    * Scale: decode is embarrassingly parallel map-side work; the
    * rollup shuffles 4 longs per asset — payloads never cross the
    * exchange. `n_distinct_fp` is the one distinct-agg (fingerprints
    * are 32-byte strings, the shuffle the dedup layer already pays).
    */
  val q129 = Q("q129_asset_feature_rollup",
    (s, dir) => {
      val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(s, dir)).toDF()
      feats.groupBy("kind")
        .agg(count(lit(1)).as("n_assets"),
          sum("n_bytes").as("sum_bytes"),
          sum("header_sum").as("sum_header"),
          countDistinct("fingerprint").as("n_distinct_fp"))
        .select("kind", "n_assets", "sum_bytes", "sum_header", "n_distinct_fp")
        .orderBy("kind")
    },
    Some("""WITH assets AS (
      SELECT doc_id AS asset_id,
        ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        encode(text) AS payload, hex(encode(text)) AS hx,
        octet_length(encode(text)) AS n
      FROM documents
    ), feats AS (
      SELECT asset_id, kind, CAST(n AS BIGINT) AS n_bytes,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(generate_series(1, least(n, 16)), k ->
            CAST((strpos('0123456789ABCDEF', substr(hx, 2*k-1, 1)) - 1) * 16 +
                 (strpos('0123456789ABCDEF', substr(hx, 2*k, 1)) - 1) AS BIGINT))),
          (a, x) -> a + x) AS BIGINT) AS header_sum,
        md5(text) AS fingerprint
      FROM assets JOIN documents ON documents.doc_id = assets.asset_id
    )
    SELECT kind, CAST(count(*) AS BIGINT) AS n_assets,
      CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      CAST(SUM(header_sum) AS BIGINT) AS sum_header,
      CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_distinct_fp
    FROM feats GROUP BY kind ORDER BY kind"""))

  def all: Seq[Q] = Seq(q117, q129)
}
