package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{UnicodeExpressions, UnicodeKernels}

/**
 * Unicode-aware text surface: NFC canonicalization, a Unicode-category
 * tokenizer and a script-histogram language/script ID. The rest of the text
 * book tokenizes ASCII-style ([[TextFunctions.tokens]]); a real multilingual
 * corpus routes through these first (normalize → tokenize → the existing
 * operators compose unchanged on the token arrays).
 *
 * Contract discipline:
 *  - NFC via the codegen'd kernel (java.text.Normalizer; oracle replays with
 *    DuckDB `nfc_normalize` — same UAX #15 algorithm).
 *  - Tokens are maximal runs of Unicode letters/digits, CASE-PRESERVING on
 *    purpose: `\p{L}\p{N}` means the same Unicode categories in Java regex
 *    and RE2, but Unicode lowercasing does NOT agree across engines for the
 *    locale-sensitive edge cases (Turkish İ, ß), so case folding stays out
 *    of the cross-engine contract.
 *  - Script ID is a pure codepoint-range table ([[UnicodeKernels.Buckets]]),
 *    deterministic and engine-replayable forever.
 *
 * Scale shape: all three are map-side projections inside whole-stage
 * codegen — no shuffle, no UDF, no driver state.
 */
object UnicodeText {

  /** Bucket names in histogram index order. */
  val Scripts: Seq[String] = UnicodeKernels.Buckets.map(_._1)

  /** NFC-normalized text (canonical composition; UAX #15). */
  def nfc(text: Column): Column = UnicodeExpressions.nfcNormalize(text)

  /** Unicode-category tokens: maximal runs of letters, combining marks and
    * digits (any script), case-preserving; empty tokens dropped. `\p{M}` is
    * included so abugida vowel signs / viramas (Devanagari matras, Arabic
    * diacritics) stay INSIDE their word instead of splitting it. All three
    * classes are Unicode general categories in both Java regex and RE2.
    *
    * Han/Kana codepoints ([[UnicodeKernels.CjkSplit]]) are split into
    * single-codepoint tokens (round 12): those scripts have no word
    * separators, so a maximal run made a whole sentence ONE token —
    * token budgets and fertility were meaningless there. Implemented by
    * spacing each such codepoint before the run split; the oracle replays
    * the identical regexes from the same range constants. The combining
    * kana voicing marks U+3099/309A stay ATTACHED to their base kana
    * (round 13: NFD Japanese previously shed them as bare-mark tokens). */
  def uTokens(text: Column): Column = {
    val spaced = regexp_replace(text, UnicodeKernels.cjkSplitRegex, " $1 ")
    filter(split(spaced, "[^\\p{L}\\p{M}\\p{N}]+"), t => t =!= "")
  }

  /** Per-script codepoint histogram, array<long> in [[Scripts]] order. */
  def scriptCounts(text: Column): Column = UnicodeExpressions.scriptHistogram(text)

  /** Dominant script of a histogram: argmax over the LETTER buckets (digits
    * excluded — shared by every script), ties broken by bucket order, "und"
    * when no letter bucket is hit. Mirrors [[TextFunctions.langId]]'s
    * deterministic CASE-chain shape. */
  def dominantScript(counts: Column): Column = {
    val letterIdx = Scripts.zipWithIndex.filter(_._1 != "digit")
    val cols = letterIdx.map { case (_, i) => counts(i) }
    val allZero = cols.reduce(_ + _) === 0L
    val cases = letterIdx.map(_._1).zipWithIndex.foldRight(lit("und")) { case ((name, i), els) =>
      val isMax = cols.zipWithIndex.filter(_._2 != i)
        .map { case (c, _) => cols(i) >= c }.reduce(_ && _)
      when(isMax, lit(name)).otherwise(els)
    }
    when(allZero, lit("und")).otherwise(cases)
  }
}
