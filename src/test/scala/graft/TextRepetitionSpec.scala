package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.HashExpressions
import graft.text.TextFunctions

/** The native one-pass NGramStats kernel must agree with the declarative
  * wordNGrams/dupNGramFrac definitions it replaces in the hot path, on the
  * edge cases included (empty, single-token, all-duplicate). Plus the PII
  * pattern counters. */
class TextRepetitionSpec extends AnyFunSuite with SparkTestSession {

  test("ngramStats kernel equals declarative n-gram definitions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat again"),
      (2L, "spam spam spam spam spam"),
      (3L, "one"),
      (4L, ""),
      (5L, "a b c d e f g"),
      (6L, "Mixed CASE tokens, mixed case TOKENS!")).toDF("id", "text")

    val st = HashExpressions.ngramStats(col("text"))
    val rows = docs.select(
        col("id"),
        st.getField("n1"), st.getField("d1"),
        st.getField("n2"), st.getField("d2"),
        st.getField("n3"), st.getField("d3"),
        size(TextFunctions.tokens(col("text"))).cast("long"),
        size(array_distinct(TextFunctions.tokens(col("text")))).cast("long"),
        size(TextFunctions.wordNGrams(col("text"), 2)).cast("long"),
        size(array_distinct(TextFunctions.wordNGrams(col("text"), 2))).cast("long"),
        size(TextFunctions.wordNGrams(col("text"), 3)).cast("long"),
        size(array_distinct(TextFunctions.wordNGrams(col("text"), 3))).cast("long"))
      .collect()
    for (r <- rows; k <- 0 until 6)
      assert(r.getLong(1 + k) == r.getLong(7 + k),
        s"doc ${r.getLong(0)} stat $k: kernel ${r.getLong(1 + k)} vs declarative ${r.getLong(7 + k)}")
  }

  test("dupLineFrac counts duplicate trimmed lines") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha\nbeta\n alpha \ngamma"), // 'alpha' duplicated after trim
      (2L, "solo"),
      (3L, "\n\n")).toDF("id", "text")
    val got = df.select(col("id"), round(TextFunctions.dupLineFrac(col("text")), 6).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.25)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("PII counters find emails, urls and long digit runs") {
    import spark.implicits._
    val text = "mail a.b+c@ex-ample.org and x@y.io, see https://a.b/c?d=1 or http://z.q " +
      "call 12345678 or 123456 short ref 99999999999"
    val df = Seq((1L, text)).toDF("id", "text")
    val r = df.select(
        TextFunctions.emailCount(col("text")),
        TextFunctions.urlCount(col("text")),
        TextFunctions.longDigitRunCount(col("text"))).collect().head
    assert(r.getInt(0) == 2, s"emails: $r")
    assert(r.getInt(1) == 2, s"urls: $r")
    assert(r.getInt(2) == 2, s"digit runs: $r") // 12345678 and 99999999999; 123456 too short
  }
}
