package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup queries over `documents` (LLM-data-pipeline
  * layer): token/quality stats, language ID, exact dedup, shingling,
  * MinHash LSH signatures, SimHash, n-gram Jaccard.
  *
  * Scale notes: everything except the signature groupBys is a pure
  * projection; MinHash/SimHash explode shingles then aggregate by doc_id
  * (map-side combinable: min over strings / integer sums), so the shuffle
  * carries only partial aggregates, not the shingle stream.
  */
object TextQueries {

  private val N = 8 // shingle size

  private val shinglesSqlExpr =
    s"list_distinct(list_transform(generate_series(1, greatest(length(text) - ${N - 1}, 1)), i -> substr(text, i, $N)))"

  private def occSql(word: String): String = {
    val p = "concat(' ', lower(text), ' ')"
    val w = s" $word "
    s"CAST((length($p) - length(regexp_replace($p, '$w', '', 'g'))) / ${w.length} AS BIGINT)"
  }

  // ---------------------------------------------------------------- q27
  val q27 = Q("q27_text_stats",
    (s, dir) => {
      val t = col("text")
      val tokens = TextMetrics.tokenCount(t).cast("long")
      val chars = TextMetrics.charsNoWs(t).cast("long")
      val stops = Seq("the", "and", "of").map(TextMetrics.wordOccurrences(t, _)).reduce(_ + _)
      Tables(s, dir, "documents")
        .withColumn("n_tokens", tokens)
        .withColumn("chars_no_ws", chars)
        .withColumn("n_stopwords", stops)
        .withColumn("avg_token_len",
          when(col("n_tokens") > 0, col("chars_no_ws").cast("double") / col("n_tokens")))
        .withColumn("stop_ratio",
          when(col("n_tokens") > 0, col("n_stopwords").cast("double") / col("n_tokens")))
        .withColumn("quality_score",
          when(col("n_tokens") > 0,
            lit(0.5) * least(lit(1.0), col("n_tokens") / lit(200.0)) +
              lit(0.3) * least(lit(1.0), col("stop_ratio") * lit(10.0)) +
              lit(0.2) * least(lit(1.0), col("chars_no_ws") / lit(400.0))).otherwise(lit(0.0)))
        .select("doc_id", "lang", "source", "n_tokens", "chars_no_ws", "n_stopwords",
          "avg_token_len", "stop_ratio", "quality_score")
        .orderBy("doc_id")
    },
    Some(s"""WITH b AS (
      SELECT doc_id, lang, source,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
        length(regexp_replace(text, '\\s', '', 'g')) AS chars_no_ws,
        ${occSql("the")} + ${occSql("and")} + ${occSql("of")} AS n_stopwords
      FROM documents
    ), r AS (
      SELECT *,
        CASE WHEN n_tokens > 0 THEN CAST(chars_no_ws AS DOUBLE) / n_tokens END AS avg_token_len,
        CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / n_tokens END AS stop_ratio
      FROM b
    )
    SELECT doc_id, lang, source, n_tokens, chars_no_ws, n_stopwords, avg_token_len, stop_ratio,
      CASE WHEN n_tokens > 0
           THEN 0.5::DOUBLE * least(1.0::DOUBLE, n_tokens / 200.0::DOUBLE)
              + 0.3::DOUBLE * least(1.0::DOUBLE, stop_ratio * 10.0::DOUBLE)
              + 0.2::DOUBLE * least(1.0::DOUBLE, chars_no_ws / 400.0::DOUBLE)
           ELSE 0.0::DOUBLE END AS quality_score
    FROM r ORDER BY doc_id"""),
    headline = true)

  // ---------------------------------------------------------------- q28
  val q28 = Q("q28_lang_id",
    (s, dir) => {
      val t = col("text")
      val scored = Tables(s, dir, "documents")
        .withColumns(TextMetrics.langMarkers.map { case (l, _) =>
          s"s_$l" -> TextMetrics.langScore(t, l)
        }.toMap)
      val pred = when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr"), col("s_zh")), lit("en"))
        .when(col("s_es") >= greatest(col("s_de"), col("s_fr"), col("s_zh")), lit("es"))
        .when(col("s_de") >= greatest(col("s_fr"), col("s_zh")), lit("de"))
        .when(col("s_fr") >= col("s_zh"), lit("fr"))
        .otherwise(lit("zh"))
      scored.withColumn("pred_lang", pred)
        .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
        .select("doc_id", "lang", "s_en", "s_es", "s_de", "s_fr", "s_zh", "pred_lang", "is_match")
        .orderBy("doc_id")
    },
    Some {
      val scores = TextMetrics.langMarkers.map { case (l, words) =>
        words.map(occSql).mkString(" + ") + s" AS s_$l"
      }.mkString(",\n        ")
      s"""WITH sc AS (
      SELECT doc_id, lang,
        $scores
      FROM documents
    )
    SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
      CASE WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
           WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
           WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
           WHEN s_fr >= s_zh THEN 'fr'
           ELSE 'zh' END AS pred_lang,
      CAST(CASE WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
           WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
           WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
           WHEN s_fr >= s_zh THEN 'fr'
           ELSE 'zh' END = lang AS INTEGER) AS is_match
    FROM sc ORDER BY doc_id"""
    })

  // ---------------------------------------------------------------- q29
  val q29 = Q("q29_exact_dedup",
    (s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"),
          sum("n_chars").as("total_chars"))
        .orderBy("fp")
    },
    Some("""SELECT md5(text) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY fp ORDER BY fp"""))

  // ---------------------------------------------------------------- q30
  val q30 = Q("q30_shingle_stats",
    (s, dir) => {
      // countDistinct via hash agg — per-row array_distinct is O(len²)
      val counts = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextMetrics.shinglesRaw(N)).as("sh"))
        .groupBy("doc_id").agg(countDistinct(col("sh")).as("n_distinct"))
      Tables(s, dir, "documents")
        .withColumn("n_positions", greatest(length(col("text")) - lit(N - 1), lit(1)).cast("long"))
        .join(counts, Seq("doc_id"))
        .withColumn("distinct_ratio", col("n_distinct").cast("double") / col("n_positions"))
        .select("doc_id", "n_positions", "n_distinct", "distinct_ratio")
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
      CAST(greatest(length(text) - ${N - 1}, 1) AS BIGINT) AS n_positions,
      CAST(len($shinglesSqlExpr) AS BIGINT) AS n_distinct,
      CAST(len($shinglesSqlExpr) AS DOUBLE) / greatest(length(text) - ${N - 1}, 1) AS distinct_ratio
    FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q31
  val q31 = Q("q31_minhash_signatures",
    (s, dir) => {
      // raw shingles: the min aggregate is duplicate-insensitive
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextMetrics.shinglesRaw(N)).as("sh"))
      val sigs = (0 to 3).map(k => TextMetrics.minhashAgg(col("sh"), k).as(s"mh$k"))
      sh.groupBy("doc_id")
        .agg(sigs.head, sigs.tail: _*)
        .withColumn("band", TextMetrics.bandId((0 to 3).map(k => col(s"mh$k"))))
        .orderBy("doc_id")
    },
    Some(s"""WITH sh AS (
      SELECT doc_id, unnest($shinglesSqlExpr) AS sh FROM documents
    ), m AS (
      SELECT doc_id,
        ${(0 to 3).map(k => s"min(md5(sh || '#$k')) AS mh$k").mkString(", ")}
      FROM sh GROUP BY doc_id
    )
    SELECT doc_id, mh0, mh1, mh2, mh3, md5(mh0 || mh1 || mh2 || mh3) AS band
    FROM m ORDER BY doc_id"""),
    headline = true)

  // ---------------------------------------------------------------- q32
  val q32 = Q("q32_simhash",
    (s, dir) => {
      // md5 materialized once per shingle row — the 32 vote aggregates
      // would otherwise each recompute it (32 md5 calls per row)
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextMetrics.shinglesRaw(N)).as("sh"))
        .distinct()
        .select(col("doc_id"), md5(col("sh").cast("binary")).as("h"))
      val votes = (1 to 32).map(j => TextMetrics.simhashVote(col("h"), j).as(s"v$j"))
      sh.groupBy("doc_id")
        .agg(votes.head, votes.tail :+ count(lit(1)).as("n_shingles"): _*)
        .withColumn("simhash", TextMetrics.simhashFingerprint((1 to 32).map(j => col(s"v$j"))))
        .select("doc_id", "n_shingles", "simhash")
        .orderBy("doc_id")
    },
    Some {
      val votes = (1 to 32)
        .map(j => s"SUM(CASE WHEN substr(h, $j, 1) >= '8' THEN 1 ELSE -1 END) AS v$j")
        .mkString(",\n        ")
      val fp = (1 to 32)
        .map(j => s"CASE WHEN v$j > 0 THEN ${1L << (j - 1)} ELSE 0 END")
        .mkString(" + ")
      s"""WITH sh AS (
      SELECT doc_id, md5(unnest($shinglesSqlExpr)) AS h FROM documents
    ), v AS (
      SELECT doc_id, COUNT(*) AS n_shingles,
        $votes
      FROM sh GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, CAST($fp AS BIGINT) AS simhash
    FROM v ORDER BY doc_id"""
    })

  // ---------------------------------------------------------------- q33
  val q33 = Q("q33_ngram_jaccard_pairs",
    (s, dir) => {
      // raw arrays: array_intersect/array_union dedupe internally
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), TextMetrics.shinglesRaw(N).as("sh"))
      val a = sh.as("a"); val b = sh.as("b")
      a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_inter"),
          size(array_union(col("a.sh"), col("b.sh"))).cast("long").as("n_union"))
        .withColumn("jaccard",
          when(col("n_union") > 0, col("n_inter").cast("double") / col("n_union")))
        .orderBy("id_a")
    },
    Some(s"""WITH sh AS (
      SELECT doc_id, $shinglesSqlExpr AS sh FROM documents
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS n_union
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    )
    SELECT id_a, id_b, n_inter, n_union,
      CASE WHEN n_union > 0 THEN CAST(n_inter AS DOUBLE) / n_union END AS jaccard
    FROM p ORDER BY id_a"""))

  def all: Seq[Q] = Seq(q27, q28, q29, q30, q31, q32, q33)
}
