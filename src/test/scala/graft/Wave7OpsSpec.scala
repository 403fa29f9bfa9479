package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ExactDedup
import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, DatasetSplit, EventAnalytics}

/**
 * Round-8 wave-7 specs: OOV-rate vocabulary coverage, Zipf rank-frequency
 * profile, integer Flesch readability, shared-prefix boilerplate clusters,
 * robust daily anomaly scores, session-shape histograms, and deterministic
 * A/B lift — hand replays plus the plan guards that back the scale claims
 * (bounded vocab collect, windows on profile tables not events, shared
 * user-key exchange for sessionization).
 */
class Wave7OpsSpec extends AnyFunSuite with SparkTestSession {

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 60000L)

  // ---------------------------------------------------------------- OOV

  test("oovRate counts tokens outside the corpus' own top-V vocabulary") {
    import spark.implicits._
    // corpus counts: the:4 cat:3 dog:2 zebra:1 -> top-2 vocab = {cat, the}
    // (count desc, token asc); src A tokens: the the cat cat dog -> 1 OOV;
    // src B: the the cat dog zebra -> 2 OOV
    val docs = Seq(
      ("A", "the the cat cat dog"),
      ("B", "the the cat dog zebra"))
      .toDF("source", "text")
    val out = CorpusStats.oovRate(docs, "source", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") == ((1L, 5L, 1L, 200L)))
    assert(out("B") == ((1L, 5L, 2L, 400L)))
  }

  test("oovRate vocab cut is deterministic under count ties (token asc)") {
    import spark.implicits._
    // all four tokens count 1: top-2 under (count desc, token asc) =
    // {apple, banana}; doc tokens cherry+date are the OOV half
    val docs = Seq(("S", "apple banana cherry date")).toDF("source", "text")
    val out = CorpusStats.oovRate(docs, "source", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(3), r.getLong(4))).head
    assert(out == ((2L, 500L)))
  }

  // ---------------------------------------------------------------- Zipf

  test("zipfProfile keeps power-of-two ranks with exact floor-log2 bits") {
    import spark.implicits._
    // frequencies: a:8 b:4 c:2 d:1 e:1 -> ranks 1..5 under (freq desc, tok
    // asc); keep ranks 1,2,4; freq_bits = floor(log2(freq))
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c " * 2 + "d e").trim))
      .toDF("doc_id", "text")
    val out = CorpusStats.zipfProfile(docs, "text", maxRank = 16)
      .collect().map(r =>
        r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      1L -> (("a", 8L, 3L)),
      2L -> (("b", 4L, 2L)),
      4L -> (("d", 1L, 0L))))
  }

  test("zipfProfile rank window runs on the bounded top-K table, not the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val p = CorpusStats.zipfProfile(docs, "text", maxRank = 4)
      .queryExecution.executedPlan.toString
    // the top-K cut must be a TakeOrderedAndProject (never a global Sort of
    // the full vocabulary feeding the window)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  // ---------------------------------------------------------- readability

  test("readability replays the integer Flesch formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello world."),       // W=2 S=1 Y=3 (e-o / o) -> 77905
      (2L, "a"),                  // W=1 S=0 (formula clamps to 1) Y=1
      (3L, "!!!"))                // W=0: dropped
      .toDF("doc_id", "text")
    val out = CorpusStats.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((2L, 1L, 3L,
      206835L - 1015L * 2 / 1 - 84600L * 3 / 2)))
    assert(out(2L) == ((1L, 0L, 1L, 206835L - 1015L - 84600L)))
    assert(!out.contains(3L))
  }

  test("readability is a pure projection: zero exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "Hello world.")).toDF("doc_id", "text")
    val p = CorpusStats.readability(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  // --------------------------------------------------------- prefix dedup

  test("prefixClusters groups docs sharing their first k tokens") {
    import spark.implicits._
    val docs = Seq(
      (10L, "terms of service apply to you"),
      (7L, "terms of service apply differently here"),
      (3L, "totally unique document body"),
      (5L, "short doc"),
      (6L, "short doc"))   // shorter than k: full-text cluster
      .toDF("doc_id", "text")
    val out = ExactDedup.prefixClusters(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // one cluster of the two 'terms of service apply' docs (canonical 7),
    // one of the two 'short doc' docs (canonical 5); the unique doc drops
    assert(out == Set((2L, 7L), (2L, 5L)))
  }

  test("prefixClusters hashes only the bounded prefix (one agg exchange)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = ExactDedup.prefixClusters(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    val aggExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(aggExchanges == 1, p.take(3000))
  }

  // ------------------------------------------------------- daily anomalies

  test("dailyAnomalies scores each day against exact lower median and MAD") {
    import spark.implicits._
    val day = (d: Int, n: Int) => (1 to n).map(_ =>
      ("click", Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00")))
    // daily counts: 10, 10, 10, 100 -> sorted (c, day): 10,10,10,100
    // n=4, lower median = row 2 -> 10; devs: 0,0,0,90 -> MAD row 2 -> 0
    // score for the spike day = 90*1000/max(0,1) = 90000
    val ev = (day(1, 10) ++ day(2, 10) ++ day(3, 10) ++ day(4, 100))
      .toDF("event_type", "ts")
    val out = EventAnalytics.dailyAnomalies(ev, "event_type", "ts", 0L)
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("2024-01-01") == ((10L, 10L, 0L, 0L)))
    assert(out("2024-01-04") == ((100L, 10L, 0L, 90000L)))
  }

  test("dailyAnomalies minScore filters and the windows run post-aggregation") {
    import spark.implicits._
    val ev = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("a", Timestamp.valueOf("2024-01-01 01:00:00")),
      ("a", Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("event_type", "ts")
    val df = EventAnalytics.dailyAnomalies(ev, "event_type", "ts", 1L)
    // counts 2,1: median 1 (lower), devs 1,0, MAD 0 -> scores 1000, 0;
    // only the 1000 row survives minScore=1
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(5) == 1000L)
    // plan: the HashAggregate collapses events BEFORE any Window
    val p = df.queryExecution.executedPlan.toString
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      "window must consume the aggregated daily table (plans print top-down): " + p.take(3000))
  }

  // -------------------------------------------------------- session stats

  test("sessionStats folds gap-sessions into log2 duration/length cells") {
    import spark.implicits._
    // user 1: events at 0m and 10m (one session: dur 600s, len 2), then at
    // 60m (gap 50m > 30m: new session, dur 0, len 1)
    // user 2: single event (dur 0, len 1)
    val ev = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(60)), (2L, ts(0)))
      .toDF("user_id", "ts")
    val out = EventAnalytics.sessionStats(ev, "user_id", "ts", gapSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // dur 600 -> len(bin(601))=10; len 2 -> len(bin(2))=2
    assert(out((10L, 2L)) == ((1L, 2L, 600L)))
    // dur 0 -> len(bin(1))=1; len 1 -> 1; two such sessions
    assert(out((1L, 1L)) == ((2L, 2L, 0L)))
  }

  test("sessionStats window and session agg share the user-key exchange") {
    import spark.implicits._
    val ev = Seq((1L, ts(0)), (1L, ts(1))).toDF("user_id", "ts")
    val p = EventAnalytics.sessionStats(ev, "user_id", "ts", 1800L)
      .queryExecution.executedPlan.toString
    val userExchanges =
      "Exchange hashpartitioning\\(user_id".r.findAllIn(p).toList
    assert(userExchanges.size == 1,
      s"expected one user_id exchange, got ${userExchanges.size}:\n${p.take(3000)}")
  }

  // ------------------------------------------------------------- A/B lift

  test("abLift reproduces the md5 bucket assignment and exact lift") {
    import spark.implicits._
    val users = (1L to 200L)
    // conversion rule: users divisible by 4 purchased
    val ev = users.flatMap { u =>
      Seq((u, "view")) ++ (if (u % 4 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val out = EventAnalytics.abLift(ev, "user_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // replay the arm assignment with the same public bucket function
    val arms = spark.createDataFrame(users.map(Tuple1(_)).toDF("user_id").rdd,
      users.map(Tuple1(_)).toDF("user_id").schema)
      .withColumn("variant",
        when(DatasetSplit.bucket(col("user_id")) < 50, "A").otherwise("B"))
      .withColumn("converted", when(col("user_id") % 4 === 0, 1L).otherwise(0L))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (v <- Seq("A", "B")) {
      val (n, c) = arms(v)
      assert(out(v)._1 == n && out(v)._2 == c, s"arm $v mismatch")
      assert(out(v)._3 == c * 1000000L / n)
    }
    assert(out("A")._4 == 0L, "arm A lift vs itself must be zero")
    assert(out("B")._4 == out("B")._3 - out("A")._3)
  }

  test("abLift arm split is deterministic across invocations") {
    import spark.implicits._
    val ev = (1L to 50L).map(u => (u, "view")).toDF("user_id", "event_type")
    val a = EventAnalytics.abLift(ev, "user_id", "event_type", "purchase")
      .collect().map(_.toSeq).toSeq
    val b = EventAnalytics.abLift(ev, "user_id", "event_type", "purchase")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
