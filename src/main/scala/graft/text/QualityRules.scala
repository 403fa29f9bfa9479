package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gopher-style document quality rules (Rae et al. 2021, table A1 subset) as
 * integer-exact per-document flags — the standard pre-filter of web-scale
 * training pipelines. Every rule compares INTEGER counts (cross-multiplied
 * ratios, no doubles), so the flags are bit-stable at any scale and
 * replayable in any engine; regexes stay inside the Java-regex ∩ RE2 common
 * subset (same discipline as the PII counters).
 *
 * Rules (a doc passes when ALL hold):
 *   r_words      50 <= tokens <= 100000
 *   r_mean_len   mean token length in [3, 10]  (3n <= lensum <= 10n)
 *   r_symbols    '#' + '...' occurrences <= 10% of tokens
 *   r_bullets    bullet-started lines <= 90% of lines
 *   r_ellipsis   '...'-ended lines <= 30% of lines
 *   r_alpha      >= 80% of tokens contain a letter (tokens - digit-runs)
 *   r_stopwords  >= 2 stopword occurrences
 *
 * One token-stats kernel pass + native regexp_count projections: a single
 * corpus scan, no shuffle (callers aggregate the flags as they like).
 */
object QualityRules {

  def gopherFlags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val st = graft.functions.HashExpressions.tokenStats(text, Seq(TextFunctions.EnStopwords))
    val nToks = st.getField("ntoks")
    val lenSum = st.getField("lensum")
    val stopHits = st.getField("hits")(0)
    val nLines = size(split(text, "\n")).cast("long")
    val nSym = (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\."))).cast("long")
    val nBullet = regexp_count(text, lit("(?m)^[ \\t]*[-*•]")).cast("long")
    val nEll = regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("long")
    val nDigit = regexp_count(text, lit("\\b[0-9]+\\b")).cast("long")
    df.select(col(idCol),
        nToks.as("n_toks"), lenSum.as("len_sum"), stopHits.as("stop_hits"),
        nLines.as("n_lines"), nSym.as("n_sym"), nBullet.as("n_bullet"),
        nEll.as("n_ell"), nDigit.as("n_digit"))
      .withColumn("r_words", col("n_toks") >= 50L && col("n_toks") <= 100000L)
      .withColumn("r_mean_len",
        col("len_sum") >= col("n_toks") * 3L && col("len_sum") <= col("n_toks") * 10L)
      .withColumn("r_symbols", col("n_sym") * 10L <= col("n_toks"))
      .withColumn("r_bullets", col("n_bullet") * 10L <= col("n_lines") * 9L)
      .withColumn("r_ellipsis", col("n_ell") * 10L <= col("n_lines") * 3L)
      .withColumn("r_alpha", (col("n_toks") - col("n_digit")) * 10L >= col("n_toks") * 8L)
      .withColumn("r_stopwords", col("stop_hits") >= 2L)
      .withColumn("pass_all",
        col("r_words") && col("r_mean_len") && col("r_symbols") && col("r_bullets") &&
          col("r_ellipsis") && col("r_alpha") && col("r_stopwords"))
  }
}
