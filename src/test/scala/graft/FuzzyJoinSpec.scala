package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.FuzzyJoin

/**
 * Round-11 indel-recall closure for blocked edit-distance ER: the
 * substitution-only pigeonhole misses pairs whose edits shift piece
 * positions; the PassJoin segment×window variant is proven to recover
 * planted insertion/deletion mutants (including the adversarial
 * leading-char deletion that shifts EVERY piece), to agree with the
 * substitution-only form where both apply, and to stay bounded under a
 * planted hot block.
 */
class FuzzyJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // 32+ chars of distinct-ish tokens so canonical prefixes are full length
  private def base(i: Int) = s"alpha bravo charlie delta echo foxtrot golf hotel $i"

  test("indel blocking recovers 1-insertion and 1-deletion mutants") {
    val rows = Seq(
      1L -> base(1),
      2L -> base(2),
      // insertion inside the first word of doc 1
      101L -> ("alxpha bravo charlie delta echo foxtrot golf hotel 1"),
      // deletion inside the first word of doc 2
      102L -> ("alha bravo charlie delta echo foxtrot golf hotel 2"))
    val got = FuzzyJoin.editDistancePairsIndel(rows.toDF("doc_id", "text"),
        "doc_id", "text", prefixLen = 32, maxDist = 3, maxBlock = 64)
      .select("a", "b", "dist").as[(Long, Long, Long)].collect().toSet
    // docs 1 and 2 share the 32-char prefix (the trailing digit is past the
    // window) and collapse to rep 1; both mutants pair against that rep
    assert(got.exists(p => p._1 == 1L && p._2 == 101L),
      s"insertion mutant not recovered: $got")
    assert(got.exists(p => p._1 == 1L && p._2 == 102L),
      s"deletion mutant not recovered: $got")
    // the only other legal pair is mutant-vs-mutant (their mutual distance
    // may or may not clear maxDist); nothing else exists to pair
    assert(got.forall(p => Set((1L, 101L), (1L, 102L), (101L, 102L))((p._1, p._2))),
      s"unexpected extra pairs: $got")
  }

  test("leading-char deletion: substitution-only blocking misses, indel catches") {
    // deleting the FIRST char shifts every fixed-position piece by one, so
    // no ordinal-aligned piece matches exactly -> editDistancePairs has no
    // candidate; the shifted windows do
    val rows = Seq(
      1L -> "abcdefgh ijklmnop qrstuvwx yzabcdef",
      2L -> "bcdefgh ijklmnop qrstuvwx yzabcdef x")
    val df = rows.toDF("doc_id", "text")
    val subOnly = FuzzyJoin.editDistancePairs(df, "doc_id", "text", 32, 3, 64)
      .count()
    val indel = FuzzyJoin.editDistancePairsIndel(df, "doc_id", "text", 32, 3, 64)
      .select("a", "b", "dist").as[(Long, Long, Long)].collect().toSeq
    assert(subOnly == 0L, "substitution-only unexpectedly found the shifted pair")
    // dist 2 on the 32-char prefixes: the front deletion plus the char that
    // slides into the truncation window at the end
    assert(indel == Seq((1L, 2L, 2L)), s"indel variant: $indel")
  }

  test("identical prefixes collapse to one rep with multiplicity") {
    val rows = Seq(1L -> base(7), 2L -> base(7), 3L -> base(7),
      10L -> ("zlpha bravo charlie delta echo foxtrot golf hotel 7"))
    val got = FuzzyJoin.editDistancePairsIndel(rows.toDF("doc_id", "text"),
        "doc_id", "text", 32, 3, 64)
      .select("a", "b", "n_a", "n_b", "dist").as[(Long, Long, Long, Long, Long)]
      .collect().toSeq
    // the 3 identical docs are ONE rep (id 1, n=3); one pair against the mutant
    assert(got == Seq((1L, 10L, 3L, 1L, 1L)))
  }

  test("hot blocks are dropped at maxBlock on both projections") {
    // 20 docs sharing the same first 8-char piece but pairwise-far texts:
    // with maxBlock=8 the shared (ordinal 0) block is dropped entirely and
    // no quadratic candidate set is generated; pairs may still form via
    // unshared later pieces, but here the tails are all-distant so the
    // output is empty — the point is it RUNS with the hot block excised
    val rows = (0 until 20).map { i =>
      (i.toLong, s"sameword$i ${"%08d".format(i * 7919)} tail$i block$i words$i")
    }
    val got = FuzzyJoin.editDistancePairsIndel(rows.toDF("doc_id", "text"),
      "doc_id", "text", 32, 3, 8)
    assert(got.count() == 0L)
    // and the planted near-pair inside a SMALL block still survives the cap
    // (mutation at char 5 — INSIDE the 32-char prefix window)
    val rows2 = rows ++ Seq((100L, "uniquely different opening text here"),
      (101L, "uniqxely different opening text here"))
    val got2 = FuzzyJoin.editDistancePairsIndel(rows2.toDF("doc_id", "text"),
        "doc_id", "text", 32, 3, 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got2.contains((100L, 101L)))
  }

  test("short prefixes (round 12): near-dup short docs and short-vs-full pairs are found") {
    // prefixes shorter than the 32-char grid lose trailing pieces to the
    // length filter — before the short pass, two ~10-char docs within 3
    // edits could share no surviving block and were silently missed
    val rows = Seq(
      1L -> "hello cat",        // 9-char canonical prefix
      2L -> "hello bat",        // 1 substitution away
      3L -> "hello c",          // 2 deletions from doc 1
      4L -> "completely different text here entirely unrelated",
      // short-vs-full boundary: a 30-char prefix against its 32-char parent
      5L -> "alpha bravo charlie delta echo foxtrot",
      6L -> "alpha bravo charlie delta ec")
    val got = FuzzyJoin.editDistancePairsIndel(rows.toDF("doc_id", "text"),
        "doc_id", "text", prefixLen = 32, maxDist = 3, maxBlock = 64)
      .select("a", "b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1L),
      s"short-short substitution pair missed: $got")
    assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 2L),
      s"short-short deletion pair missed: $got")
    // doc 5's canonical prefix is 32 chars (full), doc 6's is 28 (short):
    // length band |32-28| > 3 means NOT a candidate — but prefix distance
    // is what the operator contracts on; verify no false pair either way
    assert(!got.exists(p => p._2 == 4L && p._1 <= 3L), s"false positive: $got")
  }
}
