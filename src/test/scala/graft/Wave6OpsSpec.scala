package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics}

/**
 * Round-8 wave-6 specs: conversion attribution, RFM segmentation, PMI
 * collocations, quantized char entropy, and multi-order n-gram diversity —
 * behavior against hand replays plus the plan-shape guards that make the
 * 100 TB claims checkable (single exchange for attribution, no global
 * window for RFM).
 */
class Wave6OpsSpec extends AnyFunSuite with SparkTestSession {

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 60000L)

  // ------------------------------------------------------------ attribution

  private def evDF(rows: Seq[(Long, String, Int, Long)]) = {
    import spark.implicits._
    rows.map { case (u, et, t, id) => (u, et, ts(t), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  test("attribution credits first and last pre-conversion touches only") {
    // user 1: ad -> email -> purchase -> ad   (first=ad, last=email;
    //         the post-purchase ad must not count)
    // user 2: email -> purchase               (first=last=email)
    // user 3: ad -> ad                        (never converts: no credit)
    val ev = evDF(Seq(
      (1L, "ad", 0, 10L), (1L, "email", 1, 11L), (1L, "purchase", 2, 12L),
      (1L, "ad", 3, 13L),
      (2L, "email", 0, 20L), (2L, "purchase", 1, 21L),
      (3L, "ad", 0, 30L), (3L, "ad", 1, 31L)))
    val out = EventAnalytics.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("ad" -> ((1L, 0L)), "email" -> ((1L, 2L))))
  }

  test("attribution breaks timestamp ties by event_id and ignores conversion-less users") {
    // both touches at the same ts: event_id 40 < 41 decides first vs last
    val ev = evDF(Seq(
      (4L, "search", 0, 41L), (4L, "ad", 0, 40L), (4L, "purchase", 1, 42L)))
    val out = EventAnalytics.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("ad" -> ((1L, 0L)), "search" -> ((0L, 1L))))
  }

  test("attribution plan: the user-keyed window and touch agg share ONE exchange") {
    val ev = evDF(Seq((1L, "ad", 0, 1L), (1L, "purchase", 1, 2L)))
    val p = EventAnalytics.attribution(ev, "user_id", "event_type", "ts",
      "event_id", "purchase").queryExecution.executedPlan.toString
    val userExchanges =
      "Exchange hashpartitioning\\(user_id".r.findAllIn(p).toList
    assert(userExchanges.size == 1,
      s"expected one user_id exchange (window+groupBy co-partitioned), got ${userExchanges.size}:\n${p.take(3000)}")
  }

  // ---------------------------------------------------------------- RFM

  test("rfmSegments buckets a hand-replayed customer set exactly") {
    import spark.implicits._
    val d = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    // cust 1: orders day 0 and day 9 (recency vs max date 2024-01-10 = 1
    //         day -> bucket len(bin(2))=2), freq 2 -> bucket 2,
    //         monetary 150.75 -> floor 150 -> bin(151) len 8
    // cust 2: one order on the max date: recency 0 -> bucket 1, freq 1 ->
    //         bucket 1, monetary 20.10 -> bin(21) len 5
    val orders = Seq(
      (1L, d("2024-01-01"), 100.50), (1L, d("2024-01-09"), 50.25),
      (2L, d("2024-01-10"), 20.10))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = EventAnalytics.rfmSegments(orders, "o_custkey", "o_orderdate",
        "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDecimal(4), r.getLong(5))).toMap
    assert(out.keySet == Set((2L, 2L, 8L), (1L, 1L, 5L)))
    assert(out((2L, 2L, 8L))._1 == 1L)
    assert(out((2L, 2L, 8L))._2.doubleValue() == 150.75)
    assert(out((1L, 1L, 5L))._3 == 1L)
  }

  test("rfmSegments plan has no window (ntile would be a global sort)") {
    import spark.implicits._
    val orders = Seq((1L, ts(0), 10.0)).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val p = EventAnalytics.rfmSegments(orders, "o_custkey", "o_orderdate",
      "o_totalprice").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "ref date must broadcast: " + p.take(3000))
  }

  // ---------------------------------------------------------------- PMI

  test("pmiCollocations matches a BigInt staged-lift replay") {
    import spark.implicits._
    val docs = (1 to 6).map(i =>
      (i.toLong, "new york is big and new york is far plus word" + i))
      .toDF("doc_id", "text")
    val out = CorpusStats.pmiCollocations(docs, "doc_id", "text",
        minCount = 5L, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // hand corpus stats: per doc tokens = new york is big and new york is
    // far plus wordN -> 11 tokens, 10 bigrams; 6 docs
    val toks = (1 to 6).flatMap(i =>
      s"new york is big and new york is far plus word$i".split(" "))
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigrams = (1 to 6).flatMap { i =>
      val t = s"new york is big and new york is far plus word$i".split(" ")
      t.sliding(2).map(_.mkString(" ")).toSeq
    }
    val bigCnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tu = BigInt(toks.size); val tb = BigInt(bigrams.size)
    val expected = bigCnt.filter(_._2 >= 5).map { case (g, c2) =>
      val Array(w1, w2) = g.split(" ")
      val lift = (((BigInt(c2) * tu / uni(w1)) * tu / uni(w2)) * 1000000 / tb).toLong
      g -> ((c2, uni(w1), uni(w2), lift))
    }
    assert(out == expected)
    // 'new york' is a genuine collocation: every 'york' follows 'new'
    assert(out("new york")._4 > 1000000L, "collocation lift must exceed 1x")
  }

  // ---------------------------------------------------------- char entropy

  test("charEntropy: uniform 4-symbol text scores exactly 2000 millibits") {
    import spark.implicits._
    val docs = Seq((1L, "abcd" * 10), (2L, "aaaaaaa"), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    val out = CorpusStats.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((40L, 2000L)))   // 4 classes x 10: log2(40/10)=2 bits
    assert(out(2L) == ((7L, 0L)))       // single class: zero entropy
    assert(!out.contains(3L))           // no alnum chars -> no row
  }

  test("charEntropy is case-insensitive and counts alnum only") {
    import spark.implicits._
    val out = CorpusStats.charEntropy(
        Seq((1L, "AbAb, ab!")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // 6 chars, classes a:3 b:3 -> bits floor(log2(2))=1 each -> 1000 milli
    assert(out == ((6L, 1000L)))
  }

  // ------------------------------------------------------ n-gram diversity

  test("ngramDiversity replays distinct counts and TTR per order") {
    import spark.implicits._
    val docs = Seq(
      ("tpl", "the cat sat"), ("tpl", "the cat sat"),
      ("var", "one two three"), ("var", "four five six"))
      .toDF("source", "text")
    val out = CorpusStats.ngramDiversity(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // tpl: 6 tokens / 3 distinct; 4 bigrams / 2; 2 trigrams / 1
    assert(out(("tpl", 1L)) == ((6L, 3L, 500L)))
    assert(out(("tpl", 2L)) == ((4L, 2L, 500L)))
    assert(out(("tpl", 3L)) == ((2L, 1L, 500L)))
    // var: fully diverse at every order
    assert(out(("var", 1L)) == ((6L, 6L, 1000L)))
    assert(out(("var", 2L)) == ((4L, 4L, 1000L)))
    assert(out(("var", 3L)) == ((2L, 2L, 1000L)))
  }
}
