package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SubstringDedup
import graft.filter.SparkTestSession
import graft.operators.CorpusStats
import graft.sim.{Quantization, Similarity}
import graft.text.TextFunctions

/**
 * Behavior specs for the round-5 fourth-wave operators: repeated-substring
 * detection, PII redaction, quantized TF-IDF, and int8 embedding
 * quantization. The driver's DuckDB oracle pins exact outputs on the real
 * tables; these specs pin the SEMANTICS on constructed inputs where the
 * right answer is known by inspection.
 */
class Wave4OpsSpec extends AnyFunSuite with SparkTestSession {

  test("substring dedup flags cross-doc repeats, not unique text") {
    import spark.implicits._
    val shared = "The quick brown fox jumps over the lazy dog again and again until done."
    val docs = Seq(
      (1L, shared + " Unique tail for document one, padded to be long enough."),
      (2L, "A totally different opening sentence here. " + shared),
      (3L, "Nothing in this document appears anywhere else at all; " +
        "it is entirely singular text with no repeated windows present.")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.repeatedWindowProfile(docs, "doc_id", "text", 40, 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1)._1 > 0 && out(1)._2, "doc 1 shares a window with doc 2")
    assert(out(2)._1 > 0 && out(2)._2, "doc 2 shares a window with doc 1")
    assert(out(3)._1 === 0L && !out(3)._2, "doc 3 is unique")
  }

  test("substring dedup: within-doc repetition alone is not a cross-doc repeat") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij" * 12), // the same window repeats INSIDE one doc only
      (2L, "zyxwvutsrq" * 12)
    ).toDF("doc_id", "text")
    val out = SubstringDedup.repeatedWindowProfile(docs, "doc_id", "text", 40, 10)
      .agg(sum(col("n_repeated"))).first().getLong(0)
    assert(out === 0L, "distinct-doc count must gate the repeat flag")
  }

  test("redactPii removes every email and long digit run, in order") {
    import spark.implicits._
    val df = Seq(
      "mail a.user+x@sub.example.com and b@x.org ref 12345678 done",
      "no pii here at all",
      "digits 1234567 only"
    ).toDF("text").select(TextFunctions.redactPii(col("text")).as("red"))
    val red = df.as[String].collect()
    assert(red(0) === "mail <EMAIL> and <EMAIL> ref <ID> done")
    assert(red(1) === "no pii here at all")
    assert(red(2) === "digits <ID> only")
    // nothing matchable survives its own redaction
    val counts = df.select(
      TextFunctions.emailCount(col("red")).as("e"),
      TextFunctions.longDigitRunCount(col("red")).as("d"))
      .agg(sum(col("e")), sum(col("d"))).first()
    assert(counts.getLong(0) === 0L && counts.getLong(1) === 0L)
  }

  test("tfIdfTop ranks a rare term above ubiquitous ones") {
    import spark.implicits._
    // 'zebra' appears once in one doc; 'common' in all 8 docs (idf 0)
    val docs = (1L to 8L).map { i =>
      (i, if (i == 3) "common zebra common filler" else "common filler extra common")
    }.toDF("doc_id", "text")
    val top = CorpusStats.tfIdfTop(docs, "doc_id", "text", 2)
    val doc3 = top.where(col("doc_id") === 3 && col("rk") === 1).first()
    assert(doc3.getString(2) === "zebra")
    assert(doc3.getLong(4) === 3L, "tf=1 * floor(log2(8/1))=3")
    // 'common' is in every doc: idf bits = floor(log2(8/8)) = 0 → score 0
    val commonScores = top.where(col("tok") === "common").select(col("score"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(commonScores.subsetOf(Set(0L)))
  }

  test("int8 quantization round-trips: dequant cosine ~ float cosine") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i => (i, Array.fill(32)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val query = Array.fill(32)(rng.nextGaussian())
    val qd = Quantization.withInt8(vecs, "embedding")
      .withColumn("qcos", Quantization.dequantCosine(col("qvec"), col("scale"),
        lit(query).cast("array<double>")))
      .withColumn("fcos", Similarity.cosine(
        transform(col("embedding"), v => v.cast("double")), lit(query).cast("array<double>")))
    val maxErr = qd.agg(max(abs(col("qcos") - col("fcos")))).first().getDouble(0)
    assert(maxErr < 0.02, f"dequantized cosine drift $maxErr%.4f exceeds int8 tolerance")
    // codes stay in int8 range and the absmax element saturates at ±127
    val bad = qd.select(explode(col("qvec")).as("c")).where(abs(col("c")) > 127).count()
    assert(bad === 0L)
    val satPerVec = qd.select(size(filter(col("qvec"), c => abs(c) === 127)).as("n")).agg(min(col("n"))).first().getInt(0)
    assert(satPerVec >= 1, "the max-|x| element must map to ±127")
  }

  test("sourceOverlap counts distinct shared contents, not copy multiplicity") {
    import spark.implicits._
    import graft.dedup.ExactDedup
    val rows = Seq(
      (1L, "shared page", "a"), (2L, "shared page", "b"),
      (3L, "shared page", "b"),  // second copy in b must NOT double-count
      (4L, "other page", "a"), (5L, "other page", "c"),
      (6L, "only in a", "a")
    ).toDF("doc_id", "text", "source")
    val m = ExactDedup.sourceOverlap(rows, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "b") -> 1L, ("a", "c") -> 1L), m)
  }

  test("quantization profile is map-side only: no exchange in the plan") {
    import spark.implicits._
    val vecs = (1L to 50L).map(i => (i, Array.fill(8)(i.toFloat))).toDF("vec_id", "embedding")
    val plan = Quantization.int8Profile(vecs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
