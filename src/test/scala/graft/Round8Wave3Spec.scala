package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics}
import graft.text.Blocklist

/**
 * Round-8 wave 3: Aho–Corasick blocklist matching, Markov event
 * transitions, top-k user journeys, and the single-pass moments profile.
 * Hand-computed expectations on small data plus the borderless-pattern
 * contract the q_blocklist oracle depends on.
 */
class Round8Wave3Spec extends AnyFunSuite with SparkTestSession {

  // ------------------------------------------------------------- blocklist

  test("blocklist kernel counts every occurrence of every pattern in one walk") {
    val k = Blocklist.kernel(Seq("ab", "bc", "abc", "zz"))
    def counts(s: String): Seq[Long] = {
      val a = k.counts(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until a.numElements()).map(a.getLong)
    }
    // "xabcabz": ab at 1 and 4, bc at 2, abc at 1, no zz
    assert(counts("xabcabz") == Seq(2L, 1L, 1L, 0L))
    assert(counts("") == Seq(0L, 0L, 0L, 0L))
    // suffix patterns emitted through failure links: "abc" ends "ab"+"bc"+"abc"
    assert(counts("abc") == Seq(1L, 1L, 1L, 0L))
    // overlapping occurrences all counted
    assert(counts("zzz") == Seq(0L, 0L, 0L, 2L))
  }

  test("blocklist kernel matches bytes, so multi-byte text cannot false-positive") {
    val k = Blocklist.kernel(Seq("table"))
    val a = k.counts(org.apache.spark.unsafe.types.UTF8String.fromString("数据table表格"))
    assert(a.getLong(0) == 1L)
  }

  test("q_blocklist patterns are borderless (oracle replayability contract)") {
    // no proper prefix that is also a suffix ⟹ occurrences cannot
    // self-overlap ⟹ replace-based non-overlapping counting (the DuckDB
    // oracle) equals the kernel's all-occurrence counting
    for (p <- CurationQueries.blocklistPatterns; l <- 1 until p.length)
      assert(p.take(l) != p.takeRight(l), s"pattern '$p' has border length $l")
  }

  test("blocklist column expression agrees with per-pattern contains counting") {
    import spark.implicits._
    val pats = Seq("on", "ion", "xx")
    val docs = Seq("onion station", "no hits here", "onon").toDF("text")
    val k = Blocklist.kernel(pats)
    val got = docs.select(Blocklist.counts(col("text"), k).as("c"))
      .as[Seq[Long]].collect().toSeq
    // "onion station": on@0? "on"ion → on at 0, 3 ("onion" = on,i,on) and
    // "station" has on at 10... count manually: o-n at 0, at 3, "stati-on"
    // at 12 ⇒ 3; ion at 2 and 10 ⇒ 2
    assert(got(0) == Seq(3L, 2L, 0L))
    assert(got(1) == Seq(0L, 0L, 0L))
    assert(got(2) == Seq(2L, 0L, 0L))
  }

  // ----------------------------------------------------------- transitions

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  test("transitions counts adjacent pairs per user under (ts, id) order") {
    import spark.implicits._
    val ev = Seq(
      // u1: a -> b -> a ; u2: b -> b ; u3 single event (no pair)
      ("u1", 1L, ts(0), "a"), ("u1", 2L, ts(10), "b"), ("u1", 3L, ts(20), "a"),
      ("u2", 4L, ts(5), "b"), ("u2", 5L, ts(6), "b"),
      ("u3", 6L, ts(7), "a"),
      // tie on ts broken by id: id 7 before id 8 ⇒ c -> a
      ("u4", 7L, ts(9), "c"), ("u4", 8L, ts(9), "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 1L, 1000000L),   // from a: 1 of 1
      ("b", "a", 1L, 500000L),    // from b: 1 of 2
      ("b", "b", 1L, 500000L),
      ("c", "a", 1L, 1000000L)))
  }

  test("topPaths ranks deterministic first-k journeys with path tiebreak") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, ts(0), "a"), ("u1", 2L, ts(1), "b"), ("u1", 3L, ts(2), "c"),
      ("u2", 4L, ts(0), "a"), ("u2", 5L, ts(1), "b"),
      ("u3", 6L, ts(0), "z")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.topPaths(ev, "user_id", "event_type", "ts",
        "event_id", pathLen = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    // u1 and u2 both start a>b (pathLen truncates u1); ties break path-asc
    assert(got == Seq(("a>b", 2L), ("z", 1L)))
  }

  // -------------------------------------------------------------- pagerank

  test("pageRankTop matches a sequential integer power-iteration replay") {
    import spark.implicits._
    // 1 -> 2, 2 -> 1, 3 -> 1, 3 -> 2, 4 isolated (never a src; rank floor)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)).toDF("s", "d")
    val got = graft.sim.GraphRank
      .pageRankTop(nodes, edges, "id", "s", "d", iters = 3, k = 4)
      .as[(Long, Long)].collect().toSeq

    // sequential replay of the exact integer recurrence
    val out = Map(1L -> 1, 2L -> 1, 3L -> 2)
    val adj = Seq(1L -> 2L, 2L -> 1L, 3L -> 1L, 3L -> 2L)
    var r = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L)
    for (_ <- 1 to 3) {
      val s = adj.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / out(u) }.sum
      }
      r = r.keys.map(v => v -> (150000L + 850000L * s.getOrElse(v, 0L) / 1000000L)).toMap
    }
    val want = r.toSeq.sortBy { case (v, rk) => (-rk, v) }
    assert(got == want, s"got $got want $want")
    // node 4 (no in-edges) sits at the teleport floor
    assert(r(4L) == 150000L)
  }

  test("pageRankTop releases every cache it creates") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    graft.sim.GraphRank.pageRankTop(nodes, edges, "id", "s", "d", 2, 2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  // -------------------------------------------------------------- k-center

  test("farthestFirst walks the exact greedy trajectory with id tiebreaks") {
    import spark.implicits._
    // four unit-ish vectors: 1 and 2 nearly parallel, 3 orthogonal to both,
    // 4 diagonal. Seed = id 1; farthest from 1 is 3 (sim 0); then 4 (its
    // max-sim to {1,3} below 2's near-1 sim to 1); then 2.
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.999, 0.0447)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.6, 0.8))
    ).toDF("id", "v")
    val got = graft.sim.KCenter.farthestFirst(vecs, "id", "v", k = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 4L, 2L), got)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // selection scores: 3's max-sim to {1} is 0; 4's to {1,3} is max(.6,.8)
    assert(got(1)._3 == 0.0 && got(2)._3 == 0.8, got)
    // seed reports 1.0
    assert(got(0)._3 == 1.0)
  }

  test("farthestFirst stops early when k exceeds the corpus and frees caches") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val got = graft.sim.KCenter.farthestFirst(vecs, "id", "v", k = 10).count()
    assert(got == 2L)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("farthestFirst refuses the exact path past the MaxExactK cost cliff") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1.0, 0.0))).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.sim.KCenter.farthestFirst(vecs, "id", "v",
        k = graft.sim.KCenter.MaxExactK + 1)
    }
    assert(ex.getMessage.contains("farthestFirstSampled"))
  }

  test("farthestFirstSampled selects within the deterministic hash-sample") {
    import spark.implicits._
    // two far-apart modes, 200 vectors each: a sample of 64 must still
    // cover both, so the 2-center pick lands one center per mode
    val vecs = (0 until 200).map(i => (i.toLong, Seq(1.0, 0.001 * i))) ++
      (0 until 200).map(i => (1000L + i, Seq(-1.0, 0.001 * i)))
    val df = vecs.toDF("id", "v")
    val got = graft.sim.KCenter
      .farthestFirstSampled(df, "id", "v", k = 2, sampleSize = 64)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 2)
    val modes = got.map(_._2 / 1000L).toSet
    assert(modes == Set(0L, 1L), s"both modes must be covered: $got")
    // deterministic: a second run walks the identical trajectory
    val again = graft.sim.KCenter
      .farthestFirstSampled(df, "id", "v", k = 2, sampleSize = 64)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == again)
  }

  // --------------------------------------------------------------- moments

  test("moments emits exact power sums and quantized mean/variance") {
    import spark.implicits._
    val df = Seq(("s", 2L), ("s", 4L), ("s", 6L), ("t", 5L)).toDF("src", "len")
    val got = CorpusStats.moments(df, "src", "len")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // s: n=3 s1=12 s2=56 s3=288 s4=1568 → s4_q6 = 0; mean=4e6;
    // var = (3*56-144)/9 = 24/9 → 2666666 micro (truncated)
    assert(got == Seq(
      ("s", 3L, 12L, 56L, 288L, 0L, 4000000L, 2666666L),
      ("t", 1L, 5L, 25L, 125L, 0L, 5000000L, 0L)))
  }
}
