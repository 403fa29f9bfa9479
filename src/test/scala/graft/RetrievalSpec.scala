package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics, FuzzyJoin, Retrieval}

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

  test("noveltyAgainst: history grams suppress novelty; unseen docs score 1000") {
    import spark.implicits._
    val history = CorpusStats.gramTable(
      Seq((0L, "a b c d e f")).toDF("doc_id", "text"), "text", n = 5)
    val batch = Seq(
      (10L, "a b c d e f"),       // both grams in history -> 0
      (11L, "p q r s t u"),       // nothing in history -> 1000
      (12L, "a b c d e zz"),      // "a b c d e" seen, "b c d e zz" new -> 500
      (13L, "too short")          // no grams
    ).toDF("doc_id", "text")
    val out = CorpusStats.noveltyAgainst(batch, history, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((2L, 0L, 0L)), s"d10=${out(10L)}")
    assert(out(11L) == ((2L, 2L, 1000L)), s"d11=${out(11L)}")
    assert(out(12L) == ((2L, 1L, 500L)), s"d12=${out(12L)}")
    assert(out(13L) == ((0L, 0L, 0L)), s"d13=${out(13L)}")
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

  test("degenerate inputs: empty query set, one-group KS, one-week churn, tiny fuzzy docs") {
    import spark.implicits._
    // zero query terms -> zero hits is the honest retrieval semantics (the
    // q_bm25 fixture guards against this with the df cap + bigram terms)
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    assert(Retrieval.bm25(docs, "doc_id", "text", Seq.empty[String].toDF("term")).count() == 0L)
    // a single group has no pairs to drift against
    assert(CorpusStats.ksDrift(Seq(("only", 1L), ("only", 2L)).toDF("src", "v"),
      "src", "v").count() == 0L)
    // a single week has no successor: churn is undefined, not 100%
    val oneWeek = Seq(("u1", new java.sql.Timestamp(1700000000000L))).toDF("user_id", "ts")
    assert(EventAnalytics.weeklyChurn(oneWeek, "user_id", "ts").count() == 0L)
    // docs shorter than one block piece anchor nothing -> no candidates
    assert(FuzzyJoin.editDistancePairs(
      Seq((1L, "tiny"), (2L, "txny")).toDF("doc_id", "text"),
      "doc_id", "text", prefixLen = 32, maxDist = 3, maxBlock = 64).count() == 0L)
    // one user: the whole population is decile 0 with the full share
    val one = EventAnalytics.userConcentration(Seq("u", "u").toDF("user_id"), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(one.toSeq == Seq((0L, 1L, 2L, 1000L, 1000L)), s"got ${one.mkString(";")}")
  }

  test("rankAgreement: hand-computed overlap, MRR, and Kendall tau") {
    import spark.implicits._
    // a: ids 1..4 ranked 1..4; b: ids 3,1,5,2 ranked 1..4 (common: 1,2,3)
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (1L, 2L), (5L, 3L), (2L, 4L)).toDF("id", "rank")
    // common pairs (ra, rb): id1=(1,2) id2=(2,4) id3=(3,1)
    // (1,2)vs(2,4) conc; (1,2)vs(3,1) disc; (2,4)vs(3,1) disc -> C=1 D=2
    // tau = -((|1-2|*1000) div 3) = -333
    // first hit: all common ra<=10 -> min rb = 1 -> mrr 1000000
    val r = Retrieval.rankAgreement(a, b, "id", k = 4, headK = 10).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((3L, 750L, 1L, 1000000L, 1L, 2L, -333L)), s"got ${r.mkString(",")}")
  }

  test("rankAgreement: disjoint lists are all zeros") {
    import spark.implicits._
    val a = Seq((1L, 1L)).toDF("id", "rank")
    val b = Seq((2L, 1L)).toDF("id", "rank")
    val r = Retrieval.rankAgreement(a, b, "id", k = 1).collect().head
    assert((0 until 7).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L),
      s"got ${r.mkString(",")}")
  }

  test("percentilesHist ≡ percentilesDisc on a quantized domain with ties") {
    import spark.implicits._
    val df = (Seq.fill(3)(10L) ++ Seq.fill(5)(20L) ++ Seq(30L, 40L)).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "id")
    val qs = Seq(0, 10, 25, 50, 75, 90, 100)
    val hist = CorpusStats.percentilesHist(df, "grp", "v", qs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    val exact = CorpusStats.percentilesDisc(df, "grp", "v", "id", qs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(hist == exact, s"hist=$hist exact=$exact")
    // n=10: rank r=(9*q) div 100 -> q50 rank 4 -> value 20; q100 rank 9 -> 40
    assert(hist.toMap.apply(50L) == 20L && hist.toMap.apply(100L) == 40L)
  }

  test("fuzzy join: substitution pigeonhole catches, cliques collapse, cap drops hot blocks") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta"  // canon prefix = first 32 chars
    val docs = Seq(
      (1L, base), (2L, base),                       // exact dupes -> one rep, n=2
      (3L, "alphX beta gamma delta epsilon zeta"),  // 1 substitution inside piece 0
      (4L, "completely different text body here")
    ).toDF("doc_id", "text")
    val out = FuzzyJoin.editDistancePairs(docs, "doc_id", "text",
        prefixLen = 32, maxDist = 3, maxBlock = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // reps: prefix(base)->rep 1 (n=2); doc3 rep 3 (n=1); doc4 rep 4 (n=1)
    // doc1 vs doc3: substitution at char 5 -> pieces 1..3 identical -> candidate,
    // lev("alpha be...","alphx be...") = 1
    assert(out.toSeq == Seq((1L, 3L, 2L, 1L, 1L)), s"got ${out.mkString(";")}")
  }

  test("fuzzy join: block cap suppresses a boilerplate clique of distinct prefixes") {
    import spark.implicits._
    // 5 docs with DISTINCT prefixes (digit inside piece 2) whose shared
    // pieces 0/1/3 all hold 5 reps > maxBlock=4 -> every anchoring block is
    // dropped and no candidates survive, even though each pair is lev 1
    val docs = (0 until 5).map(i => (i.toLong, s"shared head text fork$i tail words"))
      .toDF("doc_id", "text")
    val out = FuzzyJoin.editDistancePairs(docs, "doc_id", "text",
      prefixLen = 32, maxDist = 3, maxBlock = 4)
    assert(out.count() == 0L)
  }

  test("calibrationBins: equal-frequency bins, deterministic tie split, rates") {
    import spark.implicits._
    import graft.text.TextClassifiers
    // scores 40,30,20,20 with labels 1,1,1,0; bins=2 -> bin0 = ranks 1-2
    // (ids 1,2), bin1 = ranks 3-4 where the 20-tie splits by id asc (3 then 4)
    val scored = Seq((1L, 1L, 40L), (2L, 1L, 30L), (3L, 1L, 20L), (4L, 0L, 20L))
      .toDF("doc_id", "y", "score")
    val out = TextClassifiers.calibrationBins(scored, "doc_id", "y", "score", bins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 1000L, 70L),
      (1L, 2L, 1L, 500L, 40L)), s"got ${out.mkString(";")}")
  }

  test("skipgramLift: windowed pairs canonicalize and score the staged lift") {
    import spark.implicits._
    // "a b c" at window 2 -> pairs ab, ac, bc; "c a" -> canonical "a c"
    val docs = Seq((1L, "a b c"), (2L, "c a")).toDF("doc_id", "text")
    val out = CorpusStats.skipgramLift(docs, "doc_id", "text",
        window = 2, minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // uni: a=2 b=1 c=2, tu=5; pairs: "a b"=1 "a c"=2 "b c"=1, tp=4
    // lift("a b") = ((1*5 div 2)*5 div 1)*1e6 div 4 = (2*5)*1e6 div 4 = 2500000
    // lift("a c") = ((2*5 div 2)*5 div 2)*1e6 div 4 = (5*5 div 2)=12 *1e6 div 4 = 3000000
    // lift("b c") = ((1*5 div 1)*5 div 2)*1e6 div 4 = 12*1e6 div 4 = 3000000
    assert(out == Seq(("a c", 2L, 3000000L), ("b c", 1L, 3000000L), ("a b", 1L, 2500000L)),
      s"got ${out.mkString(";")}")
  }

  test("userConcentration: hand-computed Lorenz deciles") {
    import spark.implicits._
    // u1:10 u2:5 u3:3 u4:1 u5:1 -> n_users=5 total=20; deciles 0,2,4,6,8
    val rows = Seq.fill(10)("u1") ++ Seq.fill(5)("u2") ++ Seq.fill(3)("u3") ++
      Seq("u4", "u5")
    val out = EventAnalytics.userConcentration(rows.toDF("user_id"), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 10L, 500L, 500L), (2L, 1L, 5L, 250L, 750L),
      (4L, 1L, 3L, 150L, 900L), (6L, 1L, 1L, 50L, 950L),
      (8L, 1L, 1L, 50L, 1000L)), s"got ${out.mkString(";")}")
  }

  test("concentrationProfile: Lorenz profile off the count histogram, tied levels fold") {
    import spark.implicits._
    // u1:10, u2:5, u3:5, u4:1 -> levels 10(x1), 5(x2), 1(x1); 4 users, 21 events
    val rows = Seq.fill(10)("u1") ++ Seq.fill(5)("u2") ++ Seq.fill(5)("u3") ++ Seq("u4")
    val out = EventAnalytics.concentrationProfile(rows.toDF("user_id"), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (10L, 1L, 1L, 250L, 476L),   // top user: 25% of users, 10/21 of events
      (5L, 2L, 3L, 750L, 952L),    // the tied level folds into one row
      (1L, 1L, 4L, 1000L, 1000L)), s"got ${out.mkString(";")}")
  }

  test("weeklyChurn: retained next week, trailing week dropped") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L // Tue 2023-11-14; week-truncs to Mon 2023-11-13
    def ts(day: Long): Timestamp = new Timestamp(base + day * 86400000L)
    val rows = Seq(("a", 0L), ("b", 0L), ("c", 0L),         // week 0: {a,b,c}
      ("a", 7L), ("c", 7L), ("d", 7L),                      // week 1: {a,c,d}
      ("d", 14L))                                           // week 2: {d} (trailing)
      .map { case (u, d) => (u, ts(d)) }
    val out = EventAnalytics.weeklyChurn(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2023-11-13", 3L, 2L, 333L),   // a,c retained -> churn 1/3
      ("2023-11-20", 3L, 1L, 666L)),  // only d retained -> churn 2/3
      s"got ${out.mkString(";")}")
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

  test("two bm25 invocations over different corpora keep BOTH tf caches live (de-aliased swap slots)") {
    import spark.implicits._
    val corpusA = Seq((1L, "apple banana apple"), (2L, "apple cherry")).toDF("doc_id", "text")
    val corpusB = Seq((1L, "durian fig durian"), (2L, "fig grape")).toDF("doc_id", "text")
    val qa = Seq("apple").toDF("term")
    val qb = Seq("durian").toDF("term")
    // build A first, then B: with the old single slot per (tag, thread),
    // B's swap("bm25_tf", ...) unpersisted A's tf table at BUILD time and
    // A executed with no cache at all (round-13 advice)
    val a = Retrieval.bm25(corpusA, "doc_id", "text", qa)
    val b = Retrieval.bm25(corpusB, "doc_id", "text", qb)
    val planA = a.queryExecution.executedPlan.toString
    val planB = b.queryExecution.executedPlan.toString
    assert(planA.contains("InMemoryTableScan") || planA.contains("Scan In-memory"),
      "corpus A's tf cache was evicted by corpus B's swap:\n" + planA.take(2000))
    assert(planB.contains("InMemoryTableScan") || planB.contains("Scan In-memory"),
      planB.take(2000))
    // and both still compute correct results side by side
    val resA = a.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val resB = b.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(resA.keySet == Set(1L, 2L) && resB.keySet == Set(1L))
  }
}
