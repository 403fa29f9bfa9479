package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.text.{SubwordKernel, SubwordTokenizer, TextFunctions}

/** The greedy longest-prefix segmenter: hand-checked walk semantics, the
  * train/apply round trip, and the plan shape (broadcast model, no join). */
class SubwordTokenizerSpec extends AnyFunSuite with SparkTestSession {

  test("greedy walk takes the longest vocab prefix, else one char") {
    val k = new SubwordKernel(Array("ab", "abc", "cd"), 4)
    // "abcd": "abc" (longest at 0) + "d" (no 2+ match at 3) = 2 tokens
    assert(k.countWord("abcd") == 2L)
    // "abab": "ab" + "ab" = 2; "xxxx": no vocab entry -> 4 single chars
    assert(k.countWord("abab") == 2L)
    assert(k.countWord("xxxx") == 4L)
    // greedy, not optimal: "abcd" with vocab {ab, bcd} -> "ab","c","d" = 3
    val g = new SubwordKernel(Array("ab", "bcd"), 4)
    assert(g.countWord("abcd") == 3L)
    // maxLen bounds the probe: a 5-gram in the vocab is never matched
    val m = new SubwordKernel(Array("abcde"), 4)
    assert(m.countWord("abcde") == 5L)
    assert(k.countWord("") == 0L && k.countWord("z") == 1L)
  }

  test("trainVocab counts windows with multiplicity and tie-breaks by gram") {
    import spark.implicits._
    // "ababa": ab x2, ba x2, aba x2, bab x1, abab x1, baba x1 (len-4 windows)
    val df = Seq(Tuple1("ababa ababa")).toDF("text")
    val v = SubwordTokenizer.trainVocab(df, "text", maxLen = 4, vocabSize = 4, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // doc has the word twice -> counts double; top-4 by (cnt desc, gram asc)
    assert(v.toSeq == Seq("ab" -> 4L, "aba" -> 4L, "ba" -> 4L, "abab" -> 2L))
  }

  test("subwordCount matches a driver-side replay on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = SubwordTokenizer.trainVocab(docs, "text", 4, 256, 5L)
    val k = SubwordTokenizer.kernel(vocab, 4)
    val got = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        SubwordTokenizer.subwordCount(col("toks"), k).as("n"))
      .collect()
    got.take(50).foreach { r =>
      val words = r.getSeq[String](1)
      assert(r.getLong(2) == words.map(k.countWord).sum,
        s"doc ${r.getLong(0)} kernel vs replay mismatch")
    }
    assert(got.forall(_.getLong(2) >= 0L))
  }

  test("apply plan is map-side: no join, no extra shuffle for the count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = SubwordTokenizer.kernel(
      SubwordTokenizer.trainVocab(docs, "text", 4, 64, 5L), 4)
    val plan = docs
      .select(col("doc_id"),
        SubwordTokenizer.subwordCount(TextFunctions.tokens(col("text")), k).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"apply must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"vocab must broadcast as a kernel, not join:\n$plan")
  }
}
