package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/**
 * Benchmark decontamination for training corpora: flag every training
 * document that shares at least one token n-gram with an evaluation/
 * benchmark set (the standard n-gram-overlap decontamination step of
 * LLM data pipelines).
 *
 * Scale shape: the EVAL side is small by construction (benchmarks are
 * thousands of documents, not billions), so its distinct hashed n-gram set
 * broadcasts; the training corpus is scanned ONCE — gram projection,
 * explode, broadcast left-join, per-doc aggregate — with no shuffle of raw
 * text and no second pass. Gram hashing reuses the codegen'd
 * shingle-hash-set kernel of the dedup family, so eval and train sides are
 * guaranteed hash-compatible.
 */
object Decontamination {

  /**
   * Per-training-doc overlap profile against `eval`:
   * (id, n_grams, n_contaminated, contaminated) where n_contaminated
   * counts the doc's DISTINCT n-grams that occur anywhere in the eval set.
   * Documents shorter than n tokens have n_grams = 0 and are clean.
   */
  def overlap(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val evGrams = eval
      .select(explode(HashExpressions.shingleHashSet(col(textCol), n)).as("g"))
      .distinct()
      .withColumn("_hit", lit(1L))
    val trGrams = train
      .select(col(idCol), explode_outer(HashExpressions.shingleHashSet(col(textCol), n)).as("g"))
    trGrams.join(broadcast(evGrams), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("g")).as("n_grams"), // non-null: short docs stay 0
        coalesce(sum(col("_hit")), lit(0L)).as("n_contaminated"))
      .select(col(idCol), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated") > 0L).as("contaminated"))
  }

  /**
   * Contamination ATTRIBUTION — the audit behind any decontamination
   * decision: for every (training doc, eval doc) pair sharing at least one
   * token n-gram, the count of shared distinct grams. `overlap` says "this
   * doc is dirty"; this says WHICH benchmark hit it and how hard, which is
   * what you review before dropping data. Same scale shape: the per-eval-doc
   * gram table is still benchmark-sized and broadcasts; the corpus is
   * scanned once and the shuffle carries only surviving (train, eval) pairs.
   */
  def attribution(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val ev = eval.select(col(idCol).as("eval_id"),
      explode(HashExpressions.shingleHashSet(col(textCol), n)).as("g"))
    val tr = train.select(col(idCol),
      explode(HashExpressions.shingleHashSet(col(textCol), n)).as("g"))
    tr.join(broadcast(ev), Seq("g"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared")) // both sides per-doc-distinct grams
  }

  /** Distinct hashed n-gram set of an eval corpus, collected to the driver —
    * benchmarks are small by construction (thousands of docs), so this is a
    * bounded model, exactly like a trained quantizer. */
  def evalGrams(eval: DataFrame, textCol: String, n: Int = 5): Array[Long] =
    eval.select(explode(HashExpressions.shingleHashSet(col(textCol), n)).as("g"))
      .distinct().orderBy(col("g")).collect().map(_.getLong(0))

  /**
   * MAP-ONLY variant of `overlap` against a driver-held eval gram set: the
   * same (id, n_grams, n_contaminated, contaminated) profile as a pure
   * per-row projection — no join, no aggregation, no state. This is the
   * streaming-natural form (run it unchanged on a readStream) and the
   * cheapest batch form when the eval set is already collected; semantics
   * are identical to `overlap` (StreamingCorpusOpsSpec proves it).
   */
  def overlapMap(
      train: DataFrame, grams: Array[Long],
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val g = HashExpressions.shingleHashSet(col(textCol), n)
    val hits = size(array_intersect(g, lit(grams)))
    train.select(col(idCol), size(g).cast("long").as("n_grams"),
      hits.cast("long").as("n_contaminated"), (hits > 0).as("contaminated"))
  }

  /** Bloom bitset over an eval corpus's distinct hashed n-grams: m/8 bytes
    * of driver state no matter how many benchmarks go in. */
  def evalBloom(eval: DataFrame, textCol: String, n: Int = 5,
      k: Int = 3, m: Int = 65536): Array[Long] =
    Sketches.bloomBuild(
      eval.select(explode(HashExpressions.shingleHashSet(col(textCol), n)).as("gl"))
        .select(col("gl").cast("string").as("g")), "g", k, m)

  /**
   * CONSTANT-MEMORY variant of `overlapMap`: probe each training doc's
   * grams against the Bloom bitset instead of the exact gram list. Same
   * map-only scale shape (no join, no shuffle, streaming-natural), but the
   * broadcast state is m/8 bytes even when the eval set has billions of
   * grams — the piece `overlapMap` can't promise. One-sided error: every
   * truly contaminated doc is flagged (no false negatives); a clean doc is
   * mis-flagged with probability ~(1 - e^{-kn/m})^k per gram.
   * Output: (id, n_grams, n_bloom_hits, flagged).
   */
  def overlapBloom(
      train: DataFrame, words: Array[Long],
      idCol: String, textCol: String, n: Int = 5,
      k: Int = 3, m: Int = 65536): DataFrame = {
    // grams materialize once; the probe is ONE native kernel call per row
    // (the HOF filter formulation ran interpreted: a fresh 3xmd5 expression
    // walk per gram) - bit-identical, oracle unchanged
    val withGrams = train.withColumn("_grams",
      HashExpressions.shingleHashSet(col(textCol), n))
    val hits = HashExpressions.bloomHits(col("_grams"), words, k, m)
    withGrams.select(col(idCol), size(col("_grams")).cast("long").as("n_grams"),
      hits.cast("long").as("n_bloom_hits"), (hits > 0).as("flagged"))
  }
}
