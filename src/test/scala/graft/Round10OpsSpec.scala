package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics}

/**
 * Round-10 operator fixtures: the inter-arrival Fano-factor burstiness
 * profile (bot/automation triage) and the Self-BLEU-style max-overlap
 * histogram (synthetic-data diversity probe). Hand-computed expectations
 * on planted inputs.
 */
class Round10OpsSpec extends AnyFunSuite with SparkTestSession {

  import java.sql.Timestamp
  private def ts(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  test("burstiness: metronomic user fano 0, bursty user large, singletons absent") {
    import spark.implicits._
    // metronome: gaps all 10s -> variance 0 -> fano 0
    val metro = (0 until 6).map(i => ("metro", ts(10L * i)))
    // bursty: gaps [0, 0, 0, 100] -> n=4, s1=100, s2=10000
    // fano = (4*10000 - 100^2)*1000 div (4*100) = 30000000 div 400 = 75000
    val bursty = Seq(("bursty", ts(0)), ("bursty", ts(0)), ("bursty", ts(0)),
      ("bursty", ts(0)), ("bursty", ts(100)))
    // single event: no gaps -> absent from output
    val single = Seq(("single", ts(5)))
    // same-instant pair: s1 = 0 -> fano 0 (guarded division)
    val instant = Seq(("instant", ts(7)), ("instant", ts(7)))
    val df = (metro ++ bursty ++ single ++ instant).toDF("user_id", "ts")
    val out = EventAnalytics.burstiness(df, "user_id", "ts").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!out.contains("single"))
    assert(out("metro") == ((5L, 50L, 0L)), s"metro=${out("metro")}")
    assert(out("bursty") == ((4L, 100L, 75000L)), s"bursty=${out("bursty")}")
    assert(out("instant") == ((1L, 0L, 0L)), s"instant=${out("instant")}")
  }

  test("burstiness: poisson-ish gaps land near fano 1000") {
    import spark.implicits._
    // gaps drawn deterministically from an exponential-ish ladder; the
    // Fano factor of an exponential(λ) sample is ~mean (not 1000) — use
    // gaps with variance ≈ mean: e.g. [1,1,2,0,1,2,0,1] (mean 1, var 0.5)
    // fano = (8*12 - 8^2)*1000 div (8*8) = 32000 div 64 = 500
    val gaps = Seq(1L, 1L, 2L, 0L, 1L, 2L, 0L, 1L)
    val times = gaps.scanLeft(0L)(_ + _)
    val df = times.map(t => ("u", ts(t))).toDF("user_id", "ts")
    val r = EventAnalytics.burstiness(df, "user_id", "ts").collect().head
    assert(r.getLong(1) == 8L && r.getLong(2) == 8L && r.getLong(3) == 500L,
      s"got ${r.mkString(",")}")
  }

  test("burstiness: batch ≡ stream across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      ("u1", ts(0)), ("u1", ts(10)), ("u1", ts(20)), ("u1", ts(500)),
      ("u2", ts(3)), ("u2", ts(3)), ("u2", ts(3)),   // all-zero gaps
      ("u3", ts(7)))                                  // singleton: absent
    val batch = EventAnalytics.burstiness(
        rows.toDF("user_id", "ts"), "user_id", "ts")
      .as[(String, Long, Long, Long)].collect().toSet
    // split mid-u1 so the carried last-timestamp state crosses a batch
    val (b1, b2) = rows.splitAt(3)
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val sq = graft.operators.EventStreams.burstinessProfile(
        stream.toDS().toDF("user_id", "ts"), "user_id", "ts")
      .writeStream.format("memory").queryName("burst_parity")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      val got = spark.table("burst_parity")
        .withColumn("_n", monotonically_increasing_id())
        .orderBy(col("_n").desc)
        .select("user_id", "n_gaps", "sum_gap_sec", "fano_milli")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (_, v) => v.head }.toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally sq.stop()
  }

  test("selfOverlapHistogram: identical docs at 1000, disjoint docs at 0") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared),                        // identical pair -> max_ov 1000
      (2L, shared),
      (3L, "one two three four five six"), // shares nothing -> 0
      (4L, "seven eight nine ten eleven"), // shares nothing -> 0
      (5L, "too short"))                   // < 4 words -> dropped
      .toDF("doc_id", "text")
    val out = CorpusStats.selfOverlapHistogram(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 1000L -> 2L), s"got $out")
  }

  test("selfOverlapHistogram: containment is asymmetric by design") {
    import spark.implicits._
    // doc 2 is a strict prefix of doc 1: every one of doc 2's 4-grams is
    // in doc 1 (containment 1000), while doc 1 has extra grams (bucket
    // below 1000) — the probe flags the EXCERPT as non-diverse, not the
    // original, which is the right asymmetry for synthetic-data screening
    val long = "a b c d e f g h i j k l m n o p"
    val prefix = "a b c d e f g h"
    val df = Seq((1L, long), (2L, prefix)).toDF("doc_id", "text")
    val out = CorpusStats.selfOverlapHistogram(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1: 13 grams, 5 shared -> 5000/13 = 384 -> bucket 300
    // doc2: 5 grams, all shared -> 1000
    assert(out == Map(300L -> 1L, 1000L -> 1L), s"got $out")
  }
}
