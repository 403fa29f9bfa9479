package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact repeated-substring detection (the Lee et al. 2021 "Deduplicating
 * Training Data Makes Language Models Better" signal): fixed-width
 * character windows are hashed at EVERY position, and a window is KEPT
 * when its own hash selects it (hash mod rate == 0) — winnowing-style
 * content-keyed sampling. Selection depends only on the window's bytes,
 * never its offset, so a paragraph pasted into two documents at different
 * positions selects the SAME windows in both (a fixed-stride scheme only
 * matches when the copies are phase-aligned mod the stride — its spec
 * counter-example is in Wave4OpsSpec). A kept window whose hash occurs in
 * two or more DISTINCT documents marks both as carrying corpus-duplicated
 * content — the boilerplate-paragraph contamination mode whole-document
 * MinHash misses.
 *
 * Scale shape: hashing every position costs one md5 per character — CPU-
 * heavy but embarrassingly parallel, map-side, and pre-shuffle; the 1/rate
 * selection happens in the same stage, so only len/rate rows per document
 * ever reach an exchange. The kept-window stream is materialized ONCE
 * (CachedProjections slot) and feeds two hash aggregations: the
 * duplicated-hash table (shuffle bounded by the distinct window
 * vocabulary, map-side partial aggregation) and the per-doc profile. The
 * join back is hash-on-md5 — uniformly distributed keys, no skew by
 * construction.
 */
object SubstringDedup {

  /**
   * Per-document repeated-window profile over `width`-char windows kept at
   * expected rate 1/`rate`. Returns (idCol, n_windows, n_repeated,
   * has_repeat) where n_windows counts this document's KEPT windows and
   * n_repeated those whose content also occurs in at least one OTHER
   * document. Documents shorter than `width` — or whose every window is
   * deselected, probability (1-1/rate)^len — contribute no rows.
   */
  def repeatedWindowProfile(
      df: DataFrame, idCol: String, textCol: String,
      width: Int = 40, rate: Int = 10): DataFrame = {
    require(width >= 8 && rate >= 1)
    val t = col("_t")
    val h = md5(t.substr(col("_pos"), lit(width)))
    val selector = conv(substring(col("h"), 1, 8), 16, 10).cast("long") % rate
    val wins = CachedProjections.swap("substr_wins",
      df.select(col(idCol), col(textCol).as("_t"))
        .withColumn("_pos", explode(
          when(length(t) >= width, sequence(lit(1), length(t) - (width - 1), lit(1)))
            .otherwise(array().cast("array<int>"))))
        .select(col(idCol), h.as("h"))
        .where(selector === 0))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .where(col("_nd") >= 2)
      .select(col("h"), lit(1L).as("_dup"))
    wins.join(dup, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_repeated"))
      .withColumn("has_repeat", col("n_repeated") > 0)
  }
}
