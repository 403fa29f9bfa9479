package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.DatasetSplit
import graft.sim.{Pca, Similarity}
import graft.text.BpeTrainer

/**
 * Round-8 wave-9 specs: tokenizer fertility, the simplified-silhouette
 * cluster gate, and the top-principal-component (all-but-the-top)
 * diagnostic — hand replays of the integer ladders plus a known-geometry
 * eigenvector recovery.
 */
class Wave9OpsSpec extends AnyFunSuite with SparkTestSession {

  // ----------------------------------------------------------- fertility

  test("fertility replays the milli-quantized integer ratios per group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb", "en", "s1"),
      (2L, "aa", "de", "s1")).toDF("doc_id", "text", "lang", "source")
    // hand word table: 'aa' stays whole (1 token), 'bb' splits into 2 chars
    val words = Seq(
      ("aa", 2L, Seq("aa")),
      ("bb", 1L, Seq("b", "b"))).toDF("w", "cnt", "toks")
    val out = BpeTrainer.fertility(docs, Seq("lang", "source"), "text", words)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // en/s1: 2 words, 4 chars, 3 bpe tokens -> 3000 div 2, 4000 div 3
    assert(out(("en", "s1")) == ((2L, 4L, 3L, 1500L, 1333L)))
    // de/s1: 1 word, 2 chars, 1 token
    assert(out(("de", "s1")) == ((1L, 2L, 1L, 1000L, 2000L)))
  }

  // ---------------------------------------------------------- silhouette

  test("silhouette separates two orthogonal clusters (high s, exact counts)") {
    import spark.implicits._
    // LCG sampling at k=2 picks ids 1 and 3 (smallest lcg ranks), one per
    // cluster by construction, so Lloyd starts with a centroid in each.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.05f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.05f, 0.95f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.silhouette(emb, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out.values.map(_._1).sum == 4L)
    // both clusters tight and mutually near-orthogonal: every vector's
    // simplified silhouette is close to the 1e6 ceiling
    assert(out.values.forall(_._2 > 900000L), out.toString)
  }

  test("silhouette s_micro stays in [0, 1e6] and aggregates one shuffle") {
    import spark.implicits._
    val emb = (0L until 32L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 7).toFloat / 7f + 0.1f)))
      .toDF("vec_id", "embedding")
    val df = Similarity.silhouette(emb, "vec_id", "embedding", k = 4, iters = 1)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum == 32L)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) <= 1000000L, r.toString)
    }
    // the silhouette DataFrame itself: scan -> kernel project -> one agg
    // exchange (the kernel rides map-side; no join, no second shuffle).
    // AQE prints the initial plan after the final one — count only the final.
    val planStr = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nExchanges <= 1, planStr.take(2000))
  }

  // ----------------------------------------------------------------- pca

  test("pca topComponent recovers a known dominant direction exactly") {
    import spark.implicits._
    // rank-1 data along u = (0.6, 0.8, 0, 0), zero mean: the top component
    // is u up to max-abs fixed-point scale -> (750000, 1000000, 0, 0)
    val emb = Seq(-2.0f, -1.0f, 1.0f, 2.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq(0.6f * t, 0.8f * t, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Pca.topComponent(emb, "embedding", dim = 4, iters = 8)
      .orderBy("dim_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(750000L, 1000000L, 0L, 0L))
    // trace = lambda for rank-1 data (all variance in one direction)
    assert(out.head.getLong(2) > 0L)
    assert(out.head.getLong(3) == out.head.getLong(2) ||
      (out.head.getLong(3) - out.head.getLong(2)).abs <= 1L)
  }

  // ----------------------------------------------------------------- auc

  test("aucByGroup replays Mann–Whitney with tie-averaged ranks") {
    import spark.implicits._
    // group g: scores 1(neg), 2(pos), 2(neg), 3(pos) ->
    // pairwise: 3 wins + 1 tie of 4 pairs = 0.875
    val df = Seq(
      ("g", 0L, 1L), ("g", 1L, 2L), ("g", 0L, 2L), ("g", 1L, 3L),
      ("h", 1L, 5L), ("h", 1L, 6L),        // single-class: dropped
      ("p", 0L, 1L), ("p", 0L, 2L), ("p", 1L, 3L), ("p", 1L, 4L))
      .toDF("source", "y", "score")
    val out = graft.text.TextClassifiers.aucByGroup(df, "source", "y", "score")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out == Map("g" -> 875000L, "p" -> 1000000L), out.toString)
  }

  // -------------------------------------------------------------- neyman

  test("neymanAllocation: quotas track N·S and sum exactly to the budget") {
    import spark.implicits._
    // stratum A: constant metric (S=0); B: high spread; C: mild spread.
    // Neyman gives A nothing beyond remainders, B the most.
    val docs = Seq(
      ("A", 100L), ("A", 100L), ("A", 100L),
      ("B", 0L), ("B", 1000L), ("B", 0L), ("B", 1000L),
      ("C", 90L), ("C", 110L)).toDF("source", "n_chars")
    val out = DatasetSplit.neymanAllocation(docs, "source", "n_chars", 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(5))).toMap
    assert(out.values.map(_._2).sum == 100L)
    // weights: A -> 0; B -> floor(sqrt(4*2e6 - 2000^2)) = 2000; C -> 20
    assert(out("A")._1 == 0L)
    assert(out("B")._1 == 2000L)
    assert(out("C")._1 == 20L)
    assert(out("B")._2 > out("C")._2 && out("C")._2 > out("A")._2, out.toString)
  }

  test("neymanAllocation falls back to proportional when all strata are constant") {
    import spark.implicits._
    val docs = Seq(("A", 5L), ("A", 5L), ("A", 5L), ("B", 7L))
      .toDF("source", "n_chars")
    val out = DatasetSplit.neymanAllocation(docs, "source", "n_chars", 8L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    // proportional: A 3/4 of 8 = 6, B 2
    assert(out == Map("A" -> 6L, "B" -> 2L), out.toString)
  }

  test("sampleToQuotas draws exactly the quota per stratum, deterministically") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (if (i <= 30) "A" else "B", i, i * 10))
      .toDF("source", "doc_id", "n_chars")
    val quotas = Seq(("A", 3L), ("B", 20L)).toDF("source", "alloc")
    val out = DatasetSplit.sampleToQuotas(docs, "source", "doc_id", quotas)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // A capped at its quota; B (quota > population) passes through whole
    assert(bySrc == Map("A" -> 3L, "B" -> 10L), bySrc.toString)
    // deterministic: the same draw twice is row-identical
    val again = DatasetSplit.sampleToQuotas(docs, "source", "doc_id", quotas)
    assert(out.collect().toSet == again.collect().toSet)
    // and equals bottomKSample at the same k for the capped stratum
    val bk = DatasetSplit.bottomKSample(
      docs.where(col("source") === "A"), "source", "doc_id", 3)
    assert(out.where(col("source") === "A").select("doc_id").collect().toSet ==
      bk.select("doc_id").collect().toSet)
  }

  test("pca topComponent degenerates to zeros on a constant corpus") {
    import spark.implicits._
    // a single repeated vector: covariance is identically zero, the
    // iteration hits the mx=0 branch and reports a zero component
    val emb = Seq((0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Pca.topComponent(emb, "embedding", dim = 2, iters = 8)
      .orderBy("dim_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 0L))
    assert(out.head.getLong(2) == 0L && out.head.getLong(3) == 0L)
  }

  test("silhouette handles k larger than the corpus") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    // k=8 > N=3: the sampler returns all 3 vectors as centroids; the
    // kernel still scores every row and counts stay exact
    val rows = Similarity.silhouette(emb, "vec_id", "embedding", k = 8, iters = 1)
      .collect()
    assert(rows.map(_.getLong(1)).sum == 3L)
  }

  test("pca topComponent sign-canonicalizes at the largest coordinate") {
    import spark.implicits._
    // dominant direction (-0.8, 0.6): the largest-|v| coordinate (index 0)
    // must come out positive, flipping the whole vector
    val emb = Seq(-2.0f, -1.0f, 1.0f, 2.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq(-0.8f * t, 0.6f * t, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val v = Pca.topComponent(emb, "embedding", dim = 4, iters = 8)
      .orderBy("dim_idx").collect().map(_.getLong(1)).toSeq
    assert(v == Seq(1000000L, -750000L, 0L, 0L))
  }
}
