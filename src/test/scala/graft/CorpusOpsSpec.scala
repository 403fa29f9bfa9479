package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, DatasetSplit, Sketches}
import graft.sim.Similarity

/** Round-5 corpus-curation operators: heavy hitters, stratified sampling,
  * count-min sketch, quantized surprisal, SemDeDup. */
class CorpusOpsSpec extends AnyFunSuite with SparkTestSession {

  test("topNGrams counts occurrences and document frequency with a total order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the cat"),
      (2L, "the cat sat"),
      (3L, "a dog")).toDF("doc_id", "text")
    val top = CorpusStats.topNGrams(docs, "doc_id", "text", 2, 3)
      .as[(String, Long, Long)].collect()
    // "the cat" occurs 3x (docs 1, 1, 2); "cat sat" 2x; ties break gram-asc
    assert(top(0) == (("the cat", 3L, 2L)), top.toSeq)
    assert(top(1) == (("cat sat", 2L, 2L)), top.toSeq)
    assert(top(2)._2 == 1L)
  }

  test("stratifiedSample is deterministic, growth-stable, and passes small strata whole") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, if (i <= 360) "big" else "small")).toDF("id", "grp")
    val kept = DatasetSplit.stratifiedSample(docs, "id", "grp", 90L)
      .as[(String, Long)].collect()
    val byStr = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // small stratum (40 < 90) passes through whole
    assert(byStr("small").size == 40)
    // big stratum lands near the 25% rate, never exact-random
    assert(byStr("big").size > 60 && byStr("big").size < 120, byStr("big").size)
    // growth-stability: doubling the OTHER stratum never flips big's members
    val grown = docs.unionAll((1000L to 1039L).map(i => (i, "small2")).toDF("id", "grp"))
    val kept2 = DatasetSplit.stratifiedSample(grown, "id", "grp", 90L)
      .where($"grp" === "big").as[(String, Long)].collect().map(_._2).toSet
    assert(kept2 == byStr("big"))
  }

  test("count-min estimates are exact overestimates; wide sketch is exact") {
    import spark.implicits._
    val items = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 200).map(i => s"noise$i")).toDF("tok")
    val probes = Seq("alpha", "beta", "absent").toDF("tok")
    def run(w: Int) = Sketches.cmsEstimate(
        Sketches.countMin(items, "tok", 4, w), probes, "tok", 4, w)
      .as[(String, Long)].collect().toMap
    val narrow = run(16)
    assert(narrow("alpha") >= 50L && narrow("beta") >= 20L) // never undercounts
    val wide = run(1 << 16)
    assert(wide == Map("alpha" -> 50L, "beta" -> 20L, "absent" -> 0L), wide)
  }

  test("surprisal: rare tokens carry more bits than stopwords") {
    import spark.implicits._
    // 8 tokens total: "the" x6 (0 bits each: 8 div 6 = 1), "qux" 1x (3 bits:
    // 8 div 1 = 8), "zap" 1x (3 bits)
    val docs = Seq((1L, "the the the qux"), (2L, "the the the zap")).toDF("doc_id", "text")
    val out = CorpusStats.surprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 3L, 0.75)), out(1L))
    assert(out(2L) == ((2L, 4L, 3L, 0.75)), out(2L))
  }

  test("semDedup keeps the lower-centroid-similarity member of a near-dup pair") {
    import spark.implicits._
    // two tight clusters far apart; ids 1/2 nearly identical, 3 distinct
    def v(x: Double, y: Double) = Array.fill(4)(0.0).updated(0, x).updated(1, y)
    val emb = Seq(
      (1L, v(1.0, 0.0)), (2L, v(1.0, 0.02)), (3L, v(0.2, 0.9)),
      (10L, v(-1.0, 0.0)), (11L, v(-1.0, -0.05))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding", k = 2, iters = 2, threshold = 0.98)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // 1 and 2 are dups: exactly one of them is removed, 3 survives
    assert(out(1L)._4 ^ out(2L)._4, out)
    assert(!out(3L)._4)
    // 10 and 11 are dups in the other cluster: exactly one removed
    assert(out(10L)._4 ^ out(11L)._4, out)
    // the REMOVED one has centroid_sim >= the kept one (paper's rule)
    for ((a, b) <- Seq((1L, 2L), (10L, 11L))) {
      val (rm, kp) = if (out(a)._4) (out(a), out(b)) else (out(b), out(a))
      assert(rm._3 >= kp._3, (rm, kp))
    }
    // every vector appears exactly once
    assert(out.size == 5)
  }
}
