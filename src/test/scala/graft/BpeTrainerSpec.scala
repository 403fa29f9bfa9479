package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.text.BpeTrainer

/** Distributed BPE training: hand-checked merge application (greedy
  * left-to-right non-overlap, including the overlap and token==merged
  * traps), deterministic argmax learning on a tiny corpus, and the scale
  * guard (driver sees one row per merge, never a count table). */
class BpeTrainerSpec extends AnyFunSuite with SparkTestSession {

  private def seg(word: String, left: String, right: String): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(word)).toDF("w")
      .select(BpeTrainer.applyMerge(BpeTrainer.chars(col("w")), left, right).as("t"))
      .head().getSeq[String](0)
  }

  test("applyMerge is greedy left-to-right non-overlapping") {
    assert(seg("abab", "a", "b") == Seq("ab", "ab"))
    // overlap trap: "aaa" + (a,a) -> [aa, a], NOT [a, aa] and NOT [aaa]
    assert(seg("aaa", "a", "a") == Seq("aa", "a"))
    assert(seg("aaaa", "a", "a") == Seq("aa", "aa"))
    // a freshly merged token never re-merges within the same step
    assert(seg("abb", "a", "b") == Seq("ab", "b"))
    // no occurrence -> unchanged
    assert(seg("xyz", "a", "b") == Seq("x", "y", "z"))
  }

  test("train learns the frequency-ordered merges with deterministic ties") {
    import spark.implicits._
    // "banana" x3 + "bandana" x1:
    //   step 1: an = 2*3 + 2*1 = 8 wins (na = 7, ba = 4)
    //   step 2 over [b,an,an,a] x3 + [b,an,d,an,a]: (b,an) = 4 TIES (an,a)
    //   = 4 — the (count desc, left asc, right asc) break picks (an,a)
    val docs = Seq.fill(3)("banana").toDF("text")
      .unionAll(Seq("bandana").toDF("text"))
    val (merges, words) = BpeTrainer.train(docs, "text", nMerges = 2, minPairCount = 2L)
    assert(merges.map(m => (m.step, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "n", 8L), (2, "an", "a", 4L)),
      merges.toString)
    val toks = words.select(col("w"), col("toks")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("banana") == Seq("b", "an", "ana"))
    assert(toks("bandana") == Seq("b", "an", "d", "ana"))
  }

  test("train stops early when no pair clears minPairCount") {
    import spark.implicits._
    val docs = Seq("ab", "cd", "ef").toDF("text") // every pair count = 1
    val (merges, _) = BpeTrainer.train(docs, "text", nMerges = 4, minPairCount = 2L)
    assert(merges.isEmpty)
  }

  test("segmentCounts sums trained token lengths per doc") {
    import spark.implicits._
    val docs = Seq((1L, "banana banana"), (2L, "bandana"), (3L, "zz"))
      .toDF("doc_id", "text")
    val (_, words) = BpeTrainer.train(
      docs.unionAll(docs).unionAll(docs).select(col("text")), "text", 2, 2L)
    val out = BpeTrainer.segmentCounts(docs, "doc_id", "text", words)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // zz: pair (z,z) count 3 >= 2 -> may be merged; recompute from words
    val toks = words.select(col("w"), size(col("toks")).cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(1L) == ((2L, 2 * toks("banana"))))
    assert(out(2L) == ((1L, toks("bandana"))))
    assert(out(3L) == ((1L, toks("zz"))))
  }
}
