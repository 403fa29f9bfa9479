package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics, Retrieval}

/**
 * Round-10 wave-B fixtures: BM25 milli-unit scoring, reciprocal-rank
 * fusion, marginal novelty, pairwise KS drift, and the hour-of-week
 * seasonality profile — every expectation hand-computed from the documented
 * integer formulas.
 */
class RetrievalSpec extends AnyFunSuite with SparkTestSession {

  test("bm25: hand-computed milli scores, ranking, and tie order") {
    import spark.implicits._
    // corpus: n_docs=4, total_tokens=12, avgdl=3
    val docs = Seq(
      (1L, "apple banana apple"),         // dl=3
      (2L, "apple cherry"),               // dl=2
      (3L, "durian durian durian durian"),// dl=4
      (4L, "banana cherry durian")        // dl=3
    ).toDF("doc_id", "text")
    val qt = Seq("apple", "durian").toDF("term")
    // idf_bits(apple)=idf_bits(durian)=floor(log2(4 div 2))=1
    // d1 apple tf=2: ratio=(3*1000*4)div12=1000, inner=1000, den=3200,
    //   satur=4400000 div 3200=1375
    // d2 apple tf=1: ratio=666, inner=749, den=1898, satur=2200000div1898=1159
    // d3 durian tf=4: ratio=1333, inner=1249, den=5498, satur=8800000div5498=1600
    // d4 durian tf=1: ratio=1000, inner=1000, den=2200, satur=1000
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 4L, 1600L),
      (2L, 1L, 1L, 3L, 1375L),
      (3L, 2L, 1L, 2L, 1159L)), s"got ${out.mkString(";")}")
  }

  test("bm25: terms past the idf cliff (df > n_docs/2) contribute zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "stop stop rare"), (2L, "stop"), (3L, "stop x")).toDF("doc_id", "text")
    // df(stop)=3 of 3 docs -> n_docs div dfc = 1 -> idf_bits 0
    val qt = Seq("stop", "rare").toDF("term")
    val scores = Retrieval.bm25(docs, "doc_id", "text", qt)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scores(2L) == 0L && scores(3L) == 0L, s"stop-only docs must score 0: $scores")
    assert(scores(1L) > 0L, "the rare term must carry doc 1")
  }

  test("topDfTerms: df cap drops near-universal terms, ties break by term asc") {
    import spark.implicits._
    val docs = (0 until 10).map { i =>
      val extra = if (i < 3) " zebra" else if (i < 6) " yak" else ""
      (i.toLong, s"common filler$extra")
    }.toDF("doc_id", "text")
    // df: common=10 (10*10>10 excluded), filler=10 (excluded),
    //     zebra=3 (3*10>10 excluded at maxDfDiv=10) -> use maxDfDiv=3:
    //     zebra 3*3<=10 in, yak 3*3<=10 in; order df desc then term asc
    val terms = Retrieval.topDfTerms(docs, "text", n = 3, minLen = 3, maxDfDiv = 3L)
      .collect().map(_.getString(0)).toSeq
    assert(terms == Seq("yak", "zebra"), s"got $terms")
  }

  test("rrfFuse: hand-computed fusion with one-sided survivors") {
    import spark.implicits._
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    // 1000000 div (60+r): r1=16393, r2=16129, r3=15873
    // id2 = 16129+16393 = 32522; id1 = 16393; id4 = 16129; id3 = 15873
    val out = Retrieval.rrfFuse(a, b, "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L, 32522L),
      (2L, 1L, 1L, 0L, 16393L),
      (3L, 4L, 0L, 2L, 16129L),
      (4L, 3L, 3L, 0L, 15873L)), s"got ${out.mkString(";")}")
  }

  test("noveltyProfile: duplicates score 0, originals 1000, short docs 0-gram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),  // grams "a b c d e","b c d e f" — first holder
      (2L, "a b c d e f"),  // byte-identical later doc: novelty 0
      (3L, "tiny text")     // < 5 tokens: n_grams 0
    ).toDF("doc_id", "text")
    val out = CorpusStats.noveltyProfile(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 2L, 1000L)), s"d1=${out(1L)}")
    assert(out(2L) == ((2L, 0L, 0L)), s"d2=${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L)), s"d3=${out(3L)}")
  }

  test("ksDrift: hand-computed KS, identical distributions are 0") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++ Seq(3L, 4L, 5L, 6L).map(("b", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("c", _))).toDF("src", "v")
    val out = CorpusStats.ksDrift(df, "src", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a vs b: max gap at v in {2,3,4}: |cumA*4 - cumB*4| = 8 -> 8*1000 div 16 = 500
    assert(out(("a", "b")) == ((4L, 4L, 500L)), s"ab=${out(("a", "b"))}")
    assert(out(("a", "c"))._3 == 0L, "identical distributions must be KS 0")
    assert(out(("b", "c")) == ((4L, 4L, 500L)), s"bc=${out(("b", "c"))}")
  }

  test("ksDrift: disjoint supports hit the full 1000") {
    import spark.implicits._
    val df = (Seq(1L, 2L).map(("lo", _)) ++ Seq(9L, 10L).map(("hi", _))).toDF("src", "v")
    val r = CorpusStats.ksDrift(df, "src", "v").collect().head
    assert(r.getLong(4) == 1000L, s"got ${r.mkString(",")}")
  }

  test("seasonality: peak hour, tie to smallest hour, weekly share") {
    import spark.implicits._
    import java.sql.Timestamp
    // 2023-11-14T22:13:20 UTC is a Tuesday -> Spark dayofweek=3 -> dow=2
    val base = 1700000000000L
    def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)
    val click = Seq(0L, 60L, 120L).map(s => ("click", ts(s))) :+ // hour 22 x3
      (("click", ts(3000L)))                                     // hour 23 x1
    val view = Seq(("view", ts(0L)), ("view", ts(3000L)))        // 22 & 23, tie
    val out = EventAnalytics.seasonality((click ++ view).toDF("event_type", "ts"),
        "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("click", 2L, 4L, 22L, 3L, 1000L),
      ("view", 2L, 2L, 22L, 1L, 1000L)), s"got ${out.mkString(";")}")
  }
}
