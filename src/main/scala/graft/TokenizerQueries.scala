package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DatasetSplit
import graft.text.{SubwordTokenizer, TextFunctions}

/**
 * Round-8 wave: tokenizer-faithful token counting. Every budget / packing /
 * staging operator takes a caller-supplied token-count column; this wave
 * supplies one that counts SUBWORD tokens the way a real training tokenizer
 * would (corpus-trained gram vocabulary + greedy longest-prefix-match
 * segmentation — the WordPiece/BPE-inference family), and proves the
 * integration end to end by driving the token-budget allocator off subword
 * counts instead of whitespace words.
 *
 * Contract discipline as every wave: integer-exact arithmetic, DuckDB
 * value-exact replays (train = count + top-k; apply = recursive
 * longest-prefix walk over the distinct-word set), bounded driver model
 * (vocabSize rows), native codegen kernel, zero UDFs.
 */
object TokenizerQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val MaxLen = 4
  private val VocabSize = 256
  private val MinCount = 5L

  // =================================================================== queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_subword_vocab" -> ((s, dir) => {
      // the trained tokenizer model itself: top-256 character grams (len
      // 2..4) over all corpus words by (count desc, gram asc), count >= 5 —
      // two shuffles ending in TakeOrderedAndProject, the auditable
      // artifact every downstream subword count derives from.
      SubwordTokenizer.trainVocab(t(s, dir, "documents"), "text",
          maxLen = MaxLen, vocabSize = VocabSize, minCount = MinCount)
        .orderBy(col("cnt").desc, col("gram").asc)
    }),

    "q_bpe_tokens" -> ((s, dir) => {
      // tokenizer-faithful per-doc token counting: greedy longest-prefix
      // segmentation of every word against the trained vocab (native
      // kernel, vocab broadcast as ONE codegen reference object). n_chars /
      // n_subwords is the compression a real BPE run would report; the
      // n_subwords column is the drop-in sizeCol for any budget/packing op.
      val docs = t(s, dir, "documents")
      val k = SubwordTokenizer.kernel(
        SubwordTokenizer.trainVocab(docs, "text", MaxLen, VocabSize, MinCount), MaxLen)
      docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          aggregate(transform(col("toks"), w => length(w).cast("long")),
            lit(0L), (a, v) => a + v).as("n_chars"),
          SubwordTokenizer.subwordCount(col("toks"), k).as("n_subwords"))
        .orderBy(col("doc_id"))
    }),

    "q_bpe_budget" -> ((s, dir) => {
      // the integration proof: the data-constrained token budget allocator
      // driven by SUBWORD counts — same allocator, same oracle shape as
      // q_repetition_budget, but the size column now means what a trainer
      // means by "tokens".
      val docs = t(s, dir, "documents")
      val k = SubwordTokenizer.kernel(
        SubwordTokenizer.trainVocab(docs, "text", MaxLen, VocabSize, MinCount), MaxLen)
      val sizes = docs
        .select(col("lang"),
          SubwordTokenizer.subwordCount(
            TextFunctions.tokens(col("text")), k).as("n"))
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_docs"))
      DatasetSplit.budgetAllocation(sizes, "lang", "n_tokens",
          totalTarget = 100000L, maxEpochs = 4)
        .select(col("lang"), col("n_tokens"), col("n_docs"), col("weight_micro"),
          col("raw_alloc"), col("alloc"), col("epochs_micro"), col("shortfall"))
        .orderBy(col("lang"))
    })
  )

  // =================================================================== oracles

  import PipelineQueries.duckToks

  /** Shared replay: trained vocab + recursive greedy longest-prefix walk over
    * the distinct-word set → per-word subword count (`wcnt`), per-doc join-
    * back (`agg`). Composable prefix for every oracle in this wave. */
  private def walkReplay(extraDocCols: String = "") =
    s"""d AS (SELECT doc_id$extraDocCols, ${duckToks()} AS toks FROM documents),
       |w0 AS (SELECT unnest(toks) AS w FROM d),
       |grams AS (
       |  SELECT unnest(flatten(list_transform(range(2, ${MaxLen + 1}), l ->
       |    list_filter(
       |      list_transform(range(1, greatest(len(w) - l + 1, 1) + 1),
       |        i -> substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER))),
       |      g -> len(g) = l)))) AS gram
       |  FROM w0
       |),
       |vocab AS (
       |  SELECT gram FROM (
       |    SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
       |    HAVING count(*) >= $MinCount ORDER BY cnt DESC, gram ASC LIMIT $VocabSize)
       |),
       |uw AS (SELECT DISTINCT w FROM w0),
       |walk AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS cnt FROM uw
       |  UNION ALL
       |  SELECT k.w, k.pos + k.step, k.cnt + 1
       |  FROM (
       |    SELECT wk.w, wk.pos, wk.cnt,
       |      CASE
       |        WHEN len(wk.w) - wk.pos + 1 >= 4 AND substring(wk.w, CAST(wk.pos AS INTEGER), 4) IN (SELECT gram FROM vocab) THEN 4
       |        WHEN len(wk.w) - wk.pos + 1 >= 3 AND substring(wk.w, CAST(wk.pos AS INTEGER), 3) IN (SELECT gram FROM vocab) THEN 3
       |        WHEN len(wk.w) - wk.pos + 1 >= 2 AND substring(wk.w, CAST(wk.pos AS INTEGER), 2) IN (SELECT gram FROM vocab) THEN 2
       |        ELSE 1 END AS step
       |    FROM walk wk WHERE wk.pos <= len(wk.w)
       |  ) k
       |),
       |wcnt AS (SELECT w, cnt FROM walk WHERE pos > len(w)),
       |dw AS (SELECT doc_id, unnest(toks) AS w FROM d),
       |agg AS (SELECT doc_id, CAST(sum(c.cnt) AS BIGINT) AS n_subwords
       |        FROM dw JOIN wcnt c USING (w) GROUP BY doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q_subword_vocab" ->
      s"""WITH d AS (SELECT ${duckToks()} AS toks FROM documents),
         |w0 AS (SELECT unnest(toks) AS w FROM d),
         |grams AS (
         |  SELECT unnest(flatten(list_transform(range(2, ${MaxLen + 1}), l ->
         |    list_filter(
         |      list_transform(range(1, greatest(len(w) - l + 1, 1) + 1),
         |        i -> substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER))),
         |      g -> len(g) = l)))) AS gram
         |  FROM w0
         |)
         |SELECT gram, CAST(cnt AS BIGINT) AS cnt FROM (
         |  SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
         |  HAVING count(*) >= $MinCount ORDER BY cnt DESC, gram ASC LIMIT $VocabSize)
         |ORDER BY cnt DESC, gram ASC""".stripMargin,

    "q_bpe_tokens" ->
      s"""WITH RECURSIVE
         |${walkReplay()}
         |SELECT d.doc_id,
         |  CAST(len(d.toks) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(d.toks, w -> len(w))), 0) AS BIGINT) AS n_chars,
         |  CAST(coalesce(a.n_subwords, 0) AS BIGINT) AS n_subwords
         |FROM d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q_bpe_budget" ->
      s"""WITH RECURSIVE
         |${walkReplay(", lang")},
         |sz AS (
         |  SELECT d.lang,
         |    CAST(sum(coalesce(a.n_subwords, 0)) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM d LEFT JOIN agg a USING (doc_id) GROUP BY d.lang
         |),
         |w AS (
         |  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)
         |    AS weight_micro
         |  FROM sz
         |),
         |al AS (
         |  SELECT *, CAST((100000 * weight_micro) // (SELECT sum(weight_micro) FROM w)
         |    AS BIGINT) AS raw_alloc
         |  FROM w
         |)
         |SELECT lang, n_tokens, n_docs, weight_micro, raw_alloc,
         |  CAST(least(raw_alloc, n_tokens * 4) AS BIGINT) AS alloc,
         |  CAST(CASE WHEN n_tokens > 0
         |    THEN (least(raw_alloc, n_tokens * 4) * 1000000) // n_tokens
         |    ELSE 0 END AS BIGINT) AS epochs_micro,
         |  CAST(raw_alloc - least(raw_alloc, n_tokens * 4) AS BIGINT) AS shortfall
         |FROM al ORDER BY lang""".stripMargin
  )
}
