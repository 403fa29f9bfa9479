package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventAnalytics, Retrieval}
import graft.sim.Similarity

/**
 * Round-10 wave B: corpus retrieval + composition monitoring.
 *
 *  - q_bm25        BM25 top-k retrieval with integer milli-unit scoring
 *  - q_rrf         hybrid retrieval: reciprocal-rank fusion of BM25 + cosine
 *  - q_novelty     per-doc marginal novelty (first-holder 5-gram share)
 *  - q_ks_drift    pairwise two-sample KS distance between source length
 *                  distributions
 *  - q_seasonality hour-of-week activity profile per event type
 *
 * Same contract discipline as the rest of the book: integer-exact (or
 * fixed-op-order IEEE for the cosine rank list) arithmetic, every oracle a
 * DuckDB replay of the identical expression tree.
 */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Query fixture shared by q_bm25 / q_rrf: 3 highest-df word-BIGRAM terms
    * of >= 4 chars with df < n_docs/10 (informative head; see
    * Retrieval.topDfTerms). Bigram phrase terms on purpose: the synthetic
    * corpus has a ~30-word vocabulary, so every unigram sits in >75% of
    * docs (bit-length idf 0 — an all-zero ranking), while bigram df spreads
    * 1..~n_docs/10 and every term is informative. */
  private val QTerms = 3
  private val QMinLen = 4
  private val QMaxDfDiv = 10L
  private val QGram = 2
  private val Bm25K = 20
  private val RrfListK = 50
  private val RrfTopK = 20

  // =================================================================== queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qt = Retrieval.topDfTerms(docs, "text", QTerms, QMinLen, QMaxDfDiv, QGram)
      Retrieval.bm25TopK(docs, "doc_id", "text", qt, Bm25K, QGram)
        .orderBy(col("rank"))
    }),

    "q_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qt = Retrieval.topDfTerms(docs, "text", QTerms, QMinLen, QMaxDfDiv, QGram)
      val lex = Retrieval.bm25TopK(docs, "doc_id", "text", qt, RrfListK, QGram)
      val q = emb.where(col("vec_id") === 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val vec = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "qid", "qv", k = RrfListK)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(lex, vec, "doc_id", kConst = 60L, scale = 1000000L, topK = RrfTopK)
        .orderBy(col("rank"))
    }),

    "q_novelty" -> ((s, dir) => {
      CorpusStats.noveltyProfile(t(s, dir, "documents"), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    "q_ks_drift" -> ((s, dir) => {
      CorpusStats.ksDrift(t(s, dir, "documents"), "source", "n_chars")
        .orderBy(col("group_a"), col("group_b"))
    }),

    "q_seasonality" -> ((s, dir) =>
      EventAnalytics.seasonality(Tables.events(s, dir), "event_type", "ts"))
  )

  // ==================================================================== oracle

  import PipelineQueries.{duckToks, duckShingleSet, cosineSql}

  /** Shared BM25 CTE chain ending in `bmr` = (doc_id, n_hit_terms, dl,
    * score_milli, rk) ranked by score desc, doc_id asc. */
  private def bm25Ctes: String =
    s"""tk AS (SELECT doc_id, ${duckToks()} AS tk FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= $QGram
       |    THEN list_transform(range(len(tk) - ${QGram - 1}),
       |                        i -> array_to_string(list_slice(tk, i+1, i+$QGram), ' '))
       |    ELSE [] END) AS term
       |  FROM tk),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |               CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
       |qt AS (
       |  SELECT term FROM dfreq CROSS JOIN tot
       |  WHERE length(term) >= $QMinLen AND dfc * $QMaxDfDiv <= n_docs
       |  ORDER BY dfc DESC, term ASC LIMIT $QTerms
       |),
       |sc AS (
       |  SELECT tf.doc_id, tf.tf, dl.dl,
       |    CAST(length(bin(tot.n_docs // dfreq.dfc)) - 1 AS BIGINT) AS idf_bits,
       |    (dl.dl * 1000 * tot.n_docs) // tot.total_tokens AS ratio_milli
       |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN tot
       |),
       |ct AS (
       |  SELECT doc_id, dl,
       |    idf_bits * ((tf * 2200 * 1000)
       |      // (tf * 1000 + (1200 * (250 + (750 * ratio_milli) // 1000)) // 1000)) AS contrib
       |  FROM sc
       |),
       |bm AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
       |         CAST(max(dl) AS BIGINT) AS dl, CAST(sum(contrib) AS BIGINT) AS score_milli
       |  FROM ct GROUP BY 1
       |),
       |bmr AS (
       |  SELECT *, row_number() OVER (ORDER BY score_milli DESC, doc_id ASC) AS rk FROM bm
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT CAST(rk AS BIGINT) AS rank, doc_id, n_hit_terms, dl, score_milli
         |FROM bmr WHERE rk <= $Bm25K ORDER BY rank""".stripMargin,

    "q_rrf" ->
      s"""WITH $bm25Ctes,
         |lex AS (SELECT doc_id, CAST(rk AS BIGINT) AS rank_lex FROM bmr WHERE rk <= $RrfListK),
         |cs AS (
         |  SELECT e.vec_id AS doc_id, ROUND(${cosineSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 7) q
         |  WHERE e.vec_id != 7
         |),
         |vr AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS BIGINT) AS rank_vec
         |  FROM cs
         |),
         |vec AS (SELECT doc_id, rank_vec FROM vr WHERE rank_vec <= $RrfListK),
         |fused AS (
         |  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         |    coalesce(lex.rank_lex, 0) AS rank_lex,
         |    coalesce(vec.rank_vec, 0) AS rank_vec,
         |    (CASE WHEN lex.rank_lex IS NOT NULL THEN 1000000 // (60 + lex.rank_lex) ELSE 0 END)
         |      + (CASE WHEN vec.rank_vec IS NOT NULL THEN 1000000 // (60 + vec.rank_vec) ELSE 0 END)
         |      AS rrf_milli
         |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
         |),
         |fr AS (
         |  SELECT *, row_number() OVER (ORDER BY rrf_milli DESC, doc_id ASC) AS rk FROM fused
         |)
         |SELECT CAST(rk AS BIGINT) AS rank, doc_id,
         |  CAST(rank_lex AS BIGINT) AS rank_lex, CAST(rank_vec AS BIGINT) AS rank_vec,
         |  CAST(rrf_milli AS BIGINT) AS rrf_milli
         |FROM fr WHERE rk <= $RrfTopK ORDER BY rank""".stripMargin,

    "q_novelty" ->
      s"""WITH gr AS (SELECT doc_id, ${duckShingleSet("text", 5)} AS gs FROM documents),
         |g AS (SELECT doc_id, unnest(gs) AS g FROM gr),
         |fh AS (SELECT g, min(doc_id) AS first_id FROM g GROUP BY 1),
         |nov AS (
         |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN fh.first_id = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM g JOIN fh USING (g) GROUP BY 1
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(nov.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(nov.n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(CASE WHEN coalesce(nov.n_grams, 0) > 0
         |       THEN nov.n_novel * 1000 // nov.n_grams ELSE 0 END AS BIGINT) AS novelty_milli
         |FROM documents d LEFT JOIN nov ON d.doc_id = nov.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_ks_drift" ->
      """WITH c AS (
        |  SELECT source AS g, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |grid AS (SELECT DISTINCT v FROM c),
        |cdf AS (
        |  SELECT t.g, t.n, gr.v,
        |    CAST(sum(coalesce(c.c, 0)) OVER (
        |      PARTITION BY t.g ORDER BY gr.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM tot t CROSS JOIN grid gr
        |  LEFT JOIN c ON c.g = t.g AND c.v = gr.v),
        |p AS (
        |  SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
        |    max(abs(a.cum * b.n - b.cum * a.n)) AS max_gap
        |  FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
        |  GROUP BY 1, 2, 3, 4)
        |SELECT group_a, group_b, n_a, n_b,
        |  CAST(max_gap * 1000 // (n_a * n_b) AS BIGINT) AS ks_milli
        |FROM p ORDER BY group_a, group_b""".stripMargin,

    "q_seasonality" ->
      """WITH h AS (
        |  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
        |    CAST(hour(ts) AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type, dow ORDER BY c DESC, hr ASC) AS rk
        |  FROM h),
        |d AS (SELECT event_type, dow, CAST(sum(c) AS BIGINT) AS n_events
        |      FROM h GROUP BY 1, 2),
        |pk AS (SELECT event_type, dow, hr AS peak_hour, c AS peak_n FROM r WHERE rk = 1),
        |tt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot FROM h GROUP BY 1)
        |SELECT d.event_type, d.dow, d.n_events, pk.peak_hour, pk.peak_n,
        |  CAST(d.n_events * 1000 // tt.tot AS BIGINT) AS share_milli
        |FROM d JOIN pk USING (event_type, dow) JOIN tt USING (event_type)
        |ORDER BY d.event_type, d.dow""".stripMargin
  )
}
