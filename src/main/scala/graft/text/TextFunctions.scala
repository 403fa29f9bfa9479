package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale corpus processing, built ONLY from
 * `org.apache.spark.sql.functions` higher-order functions so every operator
 * stays inside whole-stage codegen (no UDFs, no serialization breaks) and
 * scales linearly over a 100 TB corpus scan.
 *
 * All hashing is integer arithmetic mod 2^31-1 on md5-derived token values,
 * chosen because the identical computation is expressible in other engines
 * (DuckDB oracle) for bit-exact cross-checking.
 */
object TextFunctions {

  /** Prime modulus keeping all products within 63 bits. */
  val P: Long = 2147483647L // 2^31 - 1

  /** Lowercased alphanumeric tokens; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace tokens (token counting baseline). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Stable 31-bit hash of a string: first 8 hex chars of md5, mod P. */
  def stableHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % P

  /** Per-token 31-bit hashes. */
  def tokenHashes(text: Column): Column = transform(tokens(text), stableHash _)

  /** Distinct token-hash set (order-insensitive representation of the doc). */
  def tokenHashSet(text: Column): Column = array_distinct(tokenHashes(text))

  /**
   * Word n-gram shingles as strings ("tok1 tok2 tok3"); sequence-sensitive,
   * which is what near-dup detection needs on small-vocabulary corpora.
   */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array())
  }

  /** Distinct hashed shingle set. */
  def shingleHashSet(text: Column, n: Int): Column =
    array_distinct(transform(wordShingles(text, n), stableHash _))

  /**
   * Order-sensitive document fingerprint: polynomial rolling hash over the
   * token-hash sequence, mod P.
   */
  def fingerprint(text: Column): Column =
    aggregate(tokenHashes(text), lit(0L), (acc, h) => (acc * 31L + h) % P)

  /** Jaccard similarity of two pre-deduplicated arrays (single shared
    * array_intersect subtree; codegen CSE evaluates it once). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  // ----------------------------------------------------------- quality

  /** Character length, token stats, punctuation and stopword ratios. */
  def charLen(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /**
   * Composite quality score in [0,1]: rewards mid-length docs, mild
   * punctuation, a natural stopword rate and word lengths. The exact formula
   * is arbitrary but FIXED — it is part of the cross-engine contract.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(charLen(text).cast("double") / 500.0, lit(1.0))
    val punct = when(charLen(text) > 0,
      punctCount(text).cast("double") / charLen(text).cast("double")).otherwise(lit(0.0))
    val punctScore = lit(1.0) - least(punct * 10.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 3.0, lit(1.0))
    val wlen = meanTokenLen(text)
    val wlenScore = when(wlen >= 3.0 && wlen <= 8.0, lit(1.0)).otherwise(lit(0.5))
    (lenScore * 0.3) + (punctScore * 0.2) + (stopScore * 0.3) + (wlenScore * 0.2)
  }

  // ----------------------------------------------------------- language id

  /** (language, ascii stopword list) pairs used by the n-gram/stopword
    * language heuristic; priority order breaks ties. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "de", "que", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "en", "de", "que", "un", "une", "pour"),
    "zh" -> Seq.empty // non-ascii script: zero ascii stopword hits
  )

  /** Stopword-hit count for one language. */
  def langScore(text: Column, lang: String): Column = {
    val words = LangStopwords.toMap.apply(lang)
    if (words.isEmpty) lit(0L)
    else size(filter(tokens(text), t => t.isInCollection(words))).cast("long")
  }

  /**
   * Predicted language: argmax of stopword hits with fixed priority order
   * (earlier language wins ties); "und" (undetermined) when all scores are 0.
   */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(text, l) }
    // deterministic CASE chain: lang i wins if score_i >= score_j for all j
    val names = scores.map(_._1)
    val cols = scores.map(_._2)
    val allZero = cols.reduce(_ + _) === 0L
    val cases = names.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      val isMax = cols.zipWithIndex.filter(_._2 != i).map { case (c, _) => cols(i) >= c }
        .reduce(_ && _)
      when(isMax, lit(l)).otherwise(els)
    }
    when(allZero, lit("und")).otherwise(cases)
  }
}
