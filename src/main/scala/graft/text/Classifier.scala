package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-trained text classifiers for curation — the "quality classifier"
 * stage of an LLM data pipeline (CCNet / GPT-3 / LLaMA all gate their crawl
 * on one): a model is TRAINED distributed (count aggregations over the
 * corpus), then APPLIED distributed (the model table rides a broadcast join
 * against the token stream).
 *
 * Everything is integer-exact: log-likelihoods are quantized to whole bits
 * via integer bit-length (floor(log2(n)) = length(bin(n)) - 1), so scores
 * replay bit-for-bit in any engine — same discipline as the surprisal and
 * TF-IDF operators.
 *
 * Scale shape (both classifiers):
 *   - training = one explode + one hash aggregation, shuffle bounded by
 *     VOCABULARY (or the fixed hash-bucket count), never token count;
 *   - inference = one map-side explode + one broadcast join against the
 *     model + one per-doc aggregation. No stage holds more than the model
 *     in memory; the corpus is scanned exactly twice (train, score) and
 *     the two scans pipeline independently.
 */
object TextClassifiers {

  /** floor(log2(n+1)) as a pure-integer column (n >= 0). */
  private def qbits(n: Column): Column =
    (length(bin(n + lit(1L))) - lit(1)).cast("long")

  /**
   * Multinomial Naive Bayes with bit-quantized log-likelihood ratios.
   *
   * Train: per token t, pos/neg occurrence counts over the corpus where
   * `labelCol` (0/1) marks the positive class. The model row carries
   * bits(t) = floor(log2(c_pos+1)) - floor(log2(c_neg+1)) — the quantized
   * log-ratio; +1 smoothing keeps zero counts finite (bits=0 for unseen).
   *
   * Returns (token, c_pos, c_neg, bits).
   */
  def naiveBayesTrain(df: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val toks = df.select(col(labelCol).cast("long").as("_y"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    toks.groupBy(col("token"))
      .agg(sum(col("_y")).as("c_pos"),
        sum(lit(1L) - col("_y")).as("c_neg"))
      .withColumn("bits", qbits(col("c_pos")) - qbits(col("c_neg")))
  }

  /**
   * Score every document under a trained NB model: per-doc score =
   * prior bits (floor(log2(n_pos+1)) - floor(log2(n_neg+1)), doc counts)
   * + sum over TOKEN OCCURRENCES of the model's bits. `pred` = score > 0.
   *
   * The model broadcasts (token vocabularies are ~1e6-1e7 rows — tens of
   * MB); docs with no in-vocab token score exactly the prior. Output:
   * (id, n_toks, score, pred).
   */
  def naiveBayesScore(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      model: DataFrame): DataFrame = {
    val priors = df.agg(
      sum(col(labelCol).cast("long")).as("_np"),
      sum(lit(1L) - col(labelCol).cast("long")).as("_nn"))
      .select((qbits(col("_np")) - qbits(col("_nn"))).as("_prior"))
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val scored = toks
      .join(broadcast(model.select(col("token"), col("bits"))), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("_s"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(priors))
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (coalesce(col("_s"), lit(0L)) + col("_prior")).as("score"),
        (coalesce(col("_s"), lit(0L)) + col("_prior") > 0L).cast("long").as("pred"))
  }

  /**
   * Driver-held form of a trained NB model: (token -> bits, prior bits).
   * The model fetch is one vocab-sized collect — the streaming-inference
   * path, where the model must ride to every micro-batch as broadcast
   * state (the batch path keeps the join form instead).
   */
  def naiveBayesModel(df: DataFrame, textCol: String, labelCol: String): (Map[String, Long], Long) = {
    val m = naiveBayesTrain(df, textCol, labelCol)
      .select(col("token"), col("bits"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p = df.agg(
      sum(col(labelCol).cast("long")).as("_np"),
      sum(lit(1L) - col(labelCol).cast("long")).as("_nn"))
      .select((qbits(col("_np")) - qbits(col("_nn"))).as("_prior"))
      .head().getLong(0)
    (m, p)
  }

  /**
   * STATELESS-MAP NB scoring against a driver-held model: per row, one
   * native kernel fold over the token array — no explode, no join, no
   * aggregation, so the identical column expression runs unchanged on a
   * Structured Streaming source (append mode, no watermark needed).
   * Tokens outside the vocabulary contribute 0 bits. Agrees with
   * `naiveBayesScore` row-for-row on any corpus whose tokens the model
   * covers (StreamingTrainingOpsSpec proves batch ≡ stream).
   *
   * The vocab rides as ONE codegen reference object with O(log vocab)
   * binary-search lookups (graft.functions.VocabKernel) — the earlier
   * `element_at(<typedlit map>, t)` form was O(vocab) per token (literal
   * maps have no index) and serialized the whole vocab into the
   * expression tree of every task; at the documented 1e6–1e7-token NB
   * vocabularies that form is unusable, this one is not.
   */
  def naiveBayesScoreMap(
      df: DataFrame, idCol: String, textCol: String,
      bits: Map[String, Long], prior: Long): DataFrame = {
    val kernel = graft.functions.VocabExpressions.kernel(bits)
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol),
      size(toks).cast("long").as("n_toks"),
      (graft.functions.VocabExpressions.scoreSum(toks, kernel) + lit(prior)).as("score"))
      .withColumn("pred", (col("score") > 0L).cast("long"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for Language
   * Models via Importance Resampling"): represent target and raw corpora as
   * HASHED n-gram bucket distributions (the hashing trick — fixed model
   * size `buckets` regardless of vocabulary), weight each raw doc by its
   * log-likelihood ratio under the two bucket models, keep the
   * highest-weight docs. Quantized to whole bits like everything else.
   *
   * `targetCol` (0/1) marks target-domain docs. Per bucket b:
   * bits(b) = floor(log2(c_target+1)) - floor(log2(c_raw+1)) (c_raw counts
   * ALL docs, target included — the "raw" distribution of the paper).
   * Counts are unnormalized, so each gram also carries the normalizer
   * floor(log2(N_raw+1)) - floor(log2(N_target+1)) (N = total gram
   * occurrences) — the quantized log(N_r/N_t) that turns count ratios into
   * probability ratios. Per doc:
   * weight = Σ_grams bits(bucket) + n_grams · normalizer, i.e. the
   * quantized log(p_target(doc)/p_raw(doc)).
   *
   * The model is `buckets` rows TOTAL (default 1024) — broadcast for free
   * at any corpus size; that fixed-size-model property is exactly why DSIR
   * scales where per-vocab models need care. Output:
   * (id, n_grams, weight, keep = weight >= 0).
   */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String, targetCol: String,
      buckets: Int = 1024): DataFrame = {
    val grams = df.select(col(idCol), col(targetCol).cast("long").as("_y"),
      explode(graft.functions.HashExpressions.wordNGrams(col(textCol), 2)).as("g"))
      .withColumn("bucket", pmod(TextFunctions.stableHash(col("g")), lit(buckets.toLong)))
    val model = grams.groupBy(col("bucket"))
      .agg(sum(col("_y")).as("c_target"), count(lit(1)).as("c_raw"))
      .withColumn("bits", qbits(col("c_target")) - qbits(col("c_raw")))
    val norm = model.agg(sum(col("c_raw")).as("_nr"), sum(col("c_target")).as("_nt"))
      .select((qbits(col("_nr")) - qbits(col("_nt"))).as("_norm"))
    val scored = grams
      .join(broadcast(model.select(col("bucket"), col("bits"))), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("bits")).as("_s"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(norm))
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        (coalesce(col("_s"), lit(0L)) +
          coalesce(col("n_grams"), lit(0L)) * col("_norm")).as("weight"))
      .withColumn("keep", (col("weight") >= 0L).cast("long"))
  }

  /**
   * Exact per-group ROC-AUC of a score column against a binary label — the
   * evaluation every quality-gate classifier needs before its threshold is
   * trusted, via the Mann–Whitney rank-sum identity:
   *
   *   AUC = (R⁺ − P(P+1)/2) / (P·N)
   *
   * with R⁺ = sum of the positives' AVERAGE ranks under (score asc). Ties
   * take the average rank of their run; since 2·avg = min_rank + max_rank
   * = 2·rank + (ties−1), everything stays integer: the output
   * `auc_micro = (R2 − P(P+1))·10⁶ div (2·P·N)` with R2 = Σ(2·rank+ties−1)
   * is exact and engine-replayable (big products ride DECIMAL(38,0), so
   * groups up to ~7·10¹⁸ rows never overflow — far past any corpus).
   *
   * Scale shape: ONE sort-window shuffle keyed by the group (rank + tie
   * counts share it), then a group aggregation collapsing map-side to
   * |groups| rows. Groups with a single class are dropped (AUC undefined).
   */
  def aucByGroup(
      df: DataFrame, groupCol: String, labelCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byG = Window.partitionBy(col(groupCol))
    val byGS = Window.partitionBy(col(groupCol), col("_sc"))
    df.select(col(groupCol), col(labelCol).cast("long").as("_y"),
        col(scoreCol).as("_sc"))
      .withColumn("_rnk", rank().over(byG.orderBy(col("_sc"))).cast("long"))
      .withColumn("_ties", count(lit(1)).over(byGS))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_y")).as("n_pos"),
        sum(when(col("_y") === 1L, (lit(2L) * col("_rnk") + col("_ties") - 1L)
          .cast("decimal(28,0)")).otherwise(lit(0L).cast("decimal(28,0)"))).as("_r2"))
      .withColumn("n_neg", col("n_docs") - col("n_pos"))
      .where(col("n_pos") > 0L && col("n_neg") > 0L)
      .withColumn("auc_micro",
        expr("""CAST((CAST(_r2 AS DECIMAL(38,0))
                      - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000
                     div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"""))
      .select(col(groupCol), col("n_docs"), col("n_pos"), col("n_neg"),
        col("auc_micro"))
  }

  /**
   * Classifier CALIBRATION bins (the reliability diagram behind any quality
   * gate threshold choice): rank docs by score, cut the population into
   * `bins` equal-frequency bins, and report each bin's observed positive
   * rate — AUC ([[aucByGroup]]) says the gate ORDERS well; this says what a
   * score cut actually buys at each decile. Equal-FREQUENCY bins on purpose:
   * they are deterministic under the integer-quantized score (ties broken
   * by id asc), where equal-width bins would be empty/degenerate on a
   * bit-quantized score range.
   *
   * Output: (bin, n, n_pos, pos_rate_milli, sum_score), bin 0 = highest
   * scores. Scale shape: the scored table collapses to one global rank
   * (a sort of the DOC table, the userConcentration shape) and a
   * `bins`-row aggregate; all integer.
   */
  def calibrationBins(scored: DataFrame, idCol: String, labelCol: String,
                      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2)
    import org.apache.spark.sql.expressions.Window
    val totals = scored.agg(count(lit(1)).as("_n"))
    scored.select(col(idCol).as("_id"), col(labelCol).cast("long").as("_y"),
        col(scoreCol).as("_sc"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("_sc").desc, col("_id").asc)))
      .crossJoin(broadcast(totals))
      // rk is IntegerType — stage the *bins product through BIGINT so it
      // cannot wrap past ~2^31/bins rows (round-11 advice fix)
      .withColumn("bin", expr(s"CAST((CAST(rk AS BIGINT) - 1) * $bins div _n AS BIGINT)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_sc")).as("sum_score"))
      .withColumn("pos_rate_milli", expr("CAST(n_pos * 1000 div n AS BIGINT)"))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate_milli"), col("sum_score"))
      .orderBy(col("bin"))
  }

  /**
   * The 100 TB twin of [[calibrationBins]] (round 13; the exact form ranks
   * the whole scored corpus through ONE `row_number()` task — the last
   * single-partition sort in the book). The score is integer-quantized, so
   * the equal-frequency bins are EXACTLY derivable from the bounded
   * (score, label) → count histogram:
   *
   *  1. one hash-agg collapses the corpus to the histogram (map-side
   *     partials; |distinct scores|·2 rows — thousands, not billions);
   *  2. a cumulative window over THAT bounded table (the
   *     q_percentiles_hist discipline: the global sort touches the
   *     histogram, never the docs) places each (score, y) group at rank
   *     interval [cb+1, cb+cnt];
   *  3. integer interval arithmetic splits each group across the bins its
   *     interval overlaps: bin b covers ranks rk with (rk−1)·bins div n =
   *     b, i.e. rk−1 ∈ [ceil(b·n/bins), ceil((b+1)·n/bins) − 1].
   *
   * Tie policy: within a tied score, positives rank BEFORE negatives
   * (score desc, y desc) — the histogram carries no ids, so the exact
   * form's id-order split of a mixed-label tie group straddling a bin
   * boundary is the one thing it cannot replay. Any deterministic
   * within-tie policy prices the reliability diagram identically
   * (per-bin aggregates don't care which equal-scored doc went where);
   * the oracle replays this contract as `ORDER BY score DESC, y DESC`
   * rank selection, so the green row doubles as the hist ≡ rank proof.
   * Output schema identical to [[calibrationBins]]; results identical
   * whenever no mixed-label tie group straddles a boundary
   * (Round13OpsSpec pins both the equivalence and the straddle case).
   */
  def calibrationBinsHist(scored: DataFrame, idCol: String, labelCol: String,
                          scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2)
    import org.apache.spark.sql.expressions.Window
    val h = scored.select(col(labelCol).cast("long").as("_y"), col(scoreCol).as("_sc"))
      .groupBy(col("_sc"), col("_y"))
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col("_sc").desc, col("_y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = scored.agg(count(lit(1)).as("_n"))
    h.withColumn("_cb", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .crossJoin(broadcast(totals))
      // every bin this group's rank interval [cb+1, cb+cnt] overlaps —
      // a group spans at most ceil(cnt·bins/n)+1 bins, so the explode
      // fan-out is ≤ histogram rows + bins regardless of corpus size
      .withColumn("bin", explode(sequence(
        expr(s"CAST(_cb * $bins div _n AS BIGINT)"),
        expr(s"CAST((_cb + _cnt - 1) * $bins div _n AS BIGINT)"))))
      .withColumn("_lo", expr(s"CAST((bin * _n + $bins - 1) div $bins AS BIGINT)"))
      .withColumn("_hi", expr(s"CAST(((bin + 1) * _n + $bins - 1) div $bins - 1 AS BIGINT)"))
      .withColumn("_take",
        expr("least(_cb + _cnt - 1, _hi) - greatest(_cb, _lo) + 1"))
      .groupBy(col("bin"))
      .agg(sum(col("_take")).as("n"),
        sum(when(col("_y") === 1L, col("_take")).otherwise(0L)).as("n_pos"),
        sum(col("_sc") * col("_take")).as("sum_score"))
      .withColumn("pos_rate_milli", expr("CAST(n_pos * 1000 div n AS BIGINT)"))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate_milli"), col("sum_score"))
      .orderBy(col("bin"))
  }
}
