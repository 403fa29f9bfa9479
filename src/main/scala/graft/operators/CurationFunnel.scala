package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The end-to-end curation funnel in one pass, with per-stage observability —
 * the report every corpus-curation run needs: how many documents (and how
 * much text) survive each successive filter.
 *
 * Stages (cumulative — a doc is counted at stage k iff it passed 1..k):
 *   0  input
 *   1  length:      chars >= minChars
 *   2  token count: minToks <= tokens <= maxToks
 *   3  repetition:  duplicate-2-gram fraction <= maxDupPct/100 (integer
 *                   comparison (n2-d2)*100 <= n2*maxDupPct — no doubles)
 *   4  decontamination: no token-5-gram overlap with the eval set
 *
 * Each doc computes its survival LEVEL (the last stage it passes) in one
 * projection — token/2-gram stats come from the one-pass native ngram_stats
 * kernel, contamination from the broadcast eval-gram join — then
 * explode(sequence(0, level)) turns levels into per-stage rows for ONE
 * aggregation. Plan: one corpus scan + one broadcast join + one tiny
 * shuffle of (stage, partial) pairs; 5 stages cost the same as 1.
 */
object CurationFunnel {

  def funnel(
      docs: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      charsCol: String, minChars: Long = 200L, minToks: Long = 30L,
      maxToks: Long = 10000L, maxDupPct: Long = 30L): DataFrame = {
    val st = graft.functions.HashExpressions.ngramStats(col(textCol))
    val deco = Decontamination.overlap(docs, evalSet, idCol, textCol, 5)
      .select(col(idCol), col("contaminated"))
    val flagged = docs
      .select(col(idCol), col(charsCol).cast("long").as("_chars"),
        st.getField("n1").as("_n1"), st.getField("n2").as("_n2"),
        st.getField("d2").as("_d2"))
      .join(deco, Seq(idCol))
    // null text -> null kernel stats; coalesce to 0 so such docs fail the
    // token-count stage instead of null-skipping every WHEN into stage 4
    val n1 = coalesce(col("_n1"), lit(0L))
    val n2 = coalesce(col("_n2"), lit(0L))
    val d2 = coalesce(col("_d2"), lit(0L))
    val level = when(col("_chars") < minChars, 0L)
      .when(n1 < minToks || n1 > maxToks, 1L)
      .when((n2 - d2) * 100 > n2 * maxDupPct, 2L)
      .when(col("contaminated"), 3L)
      .otherwise(4L)
    flagged.withColumn("_level", level)
      .select(explode(sequence(lit(0L), col("_level"))).as("stage"), col("_chars"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_chars")).as("sum_chars"))
      .orderBy(col("stage"))
  }
}
