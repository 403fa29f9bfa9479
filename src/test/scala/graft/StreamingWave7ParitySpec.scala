package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.CorpusStats

/**
 * Batch ≡ streaming for the wave-7 corpus operators:
 *  - readability is a pure per-row projection — the same code runs
 *    unchanged on a stream (append mode) and agrees row for row;
 *  - prefix clustering is ONE incremental aggregation — streamed clusters
 *    after any number of micro-batches equal the batch clusters of the
 *    union (complete mode), exactly like exact dedup;
 *  - OOV scoring under a FIXED vocabulary kernel is a stateless map (the
 *    NB-classifier deployment shape: train the vocab on a batch corpus,
 *    score any stream against it).
 */
class StreamingWave7ParitySpec extends AnyFunSuite with SparkTestSession {

  test("readability is a stateless projection: batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "Hello world. This is fine!"),
      (2L, "One two three four five."),
      (3L, "a"),
      (4L, "!!!")) // zero words: dropped in both paths
    val expected = CorpusStats.readability(rows.toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Long, Long, Long)].collect().sorted

    val stream = MemoryStream[(Long, String)]
    val sq = CorpusStats.readability(stream.toDS().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("readability_parity")
      .outputMode("append").start()
    stream.addData(rows.take(2)); sq.processAllAvailable()
    stream.addData(rows.drop(2)); sq.processAllAvailable()
    val streamed = spark.table("readability_parity")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }

  test("prefix clustering accumulates incrementally on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((10L, "terms of service apply here"),
      (3L, "something else entirely now"))
    val batch2 = Seq((7L, "terms of service apply there"),
      (5L, "one more unique body text"))
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val expected = graft.dedup.ExactDedup.prefixClusters(all,
      "doc_id", "text", 4).as[(String, Long, Long)].collect().toSet

    val stream = MemoryStream[(Long, String)]
    val sq = graft.dedup.ExactDedup.prefixClusters(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", 4)
      .writeStream.format("memory").queryName("prefix_parity")
      .outputMode("complete").start()
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    val streamed = spark.table("prefix_parity")
      .as[(String, Long, Long)].collect().toSet
    sq.stop()
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("OOV scoring under a fixed vocab kernel is a stateless map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // vocab trained once on a batch corpus (the deployment shape); the
    // per-doc in-vocab count then streams unchanged
    val kern = graft.functions.VocabExpressions.kernel(
      Map("the" -> 1L, "cat" -> 1L))
    def score(df: org.apache.spark.sql.DataFrame) = {
      val tk = graft.text.TextFunctions.tokens(col("text"))
      df.select(col("doc_id"),
        size(tk).cast("long").as("n_tok"),
        graft.functions.VocabExpressions.scoreSum(tk, kern).as("n_in"))
    }
    val rows = Seq((1L, "the cat sat"), (2L, "dog runs"), (3L, "the the"))
    val expected = score(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().sorted
    assert(expected.toSeq == Seq((1L, 3L, 2L), (2L, 2L, 0L), (3L, 2L, 2L)))

    val stream = MemoryStream[(Long, String)]
    val sq = score(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("oov_parity")
      .outputMode("append").start()
    stream.addData(rows.take(1)); sq.processAllAvailable()
    stream.addData(rows.drop(1)); sq.processAllAvailable()
    val streamed = spark.table("oov_parity")
      .as[(Long, Long, Long)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }
}
