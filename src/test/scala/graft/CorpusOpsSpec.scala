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

  test("shard packing: non-final shards stay within one doc weight of capacity") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, "g", 70L)).toDF("id", "grp", "w")
    val sh = graft.operators.ShardPacking.withShard(docs, "id", "w", Seq("grp"), 200L)
      .groupBy($"shard").agg(sum($"w").as("tot"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // offsets 0,70,140 land in shard 0 (the 140-doc straddles into bucket 1)
    assert(sh.head == ((0L, 210L, 3L)), sh.toSeq)
    // non-final shards: capacity - maxw < weight < capacity + maxw
    sh.dropRight(1).foreach { case (_, tot, _) =>
      assert(tot > 130L && tot < 270L, sh.toSeq)
    }
    // total conserved — every doc lands in exactly one shard
    assert(sh.map(_._2).sum == 7000L)
  }

  test("shard packing is independent across groups and rejects global packing") {
    import spark.implicits._
    val docs = Seq((1L, "a", 50L), (2L, "b", 50L), (3L, "a", 50L)).toDF("id", "grp", "w")
    val out = graft.operators.ShardPacking.withShard(docs, "id", "w", Seq("grp"), 40L)
      .select($"id", $"shard").as[(Long, Long)].collect().toMap
    // each group starts its own shard 0; b's single doc can't see a's offsets
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L), out)
    intercept[IllegalArgumentException] {
      graft.operators.ShardPacking.withShard(docs, "id", "w", Seq(), 40L)
    }
  }

  test("curation funnel stages are cumulative and monotonically decreasing") {
    import spark.implicits._
    // all-unique tokens: zero duplicate 2-grams, > 45 tokens, > 200 chars
    val good = (1 to 60).map(i => f"alpha$i%03d").mkString(" ")
    val evalDoc = (1 to 60).map(i => f"omega$i%03d").mkString(" ")
    val docs = Seq(
      (1L, good),                                     // survives everything
      (2L, "short"),                                  // fails length
      (3L, (1 to 30).map(i => f"verylong$i%04d").mkString(" ")), // < 45 toks
      (4L, "spam ham " * 60),                         // dup 2-grams ~98%
      (50L, evalDoc)).toDF("doc_id", "text")          // eval member: contaminated
      .withColumn("n_chars", length($"text").cast("long"))
    val eval = docs.where($"doc_id" === 50L)
    val f = graft.operators.CurationFunnel
      .funnel(docs, eval, "doc_id", "text", "n_chars",
        minChars = 200L, minToks = 45L, maxToks = 10000L, maxDupPct = 6L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val n = f.map(_._2)
    assert(n.head == 5L)                               // stage 0 = input
    assert(n.zip(n.tail).forall { case (a, b) => b <= a }, f.toSeq)
    assert(n.last == 1L, f.toSeq)                      // only doc 1 survives
    // doc 2 dies at length, 3 at tokens, 4 at repetition, 50 at decontam
    assert(n.toSeq == Seq(5L, 4L, 3L, 2L, 1L), f.toSeq)
  }

  test("hierarchical cell assignment routes to the flat argmax for nearly all vectors") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfTrainKMeans(emb, "vec_id", "embedding", 32, iters = 2)
    val both = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("flat", Similarity.ivfCellExpr($"v", cents))
      .withColumn("hier", Similarity.ivfCellExprHier($"v", cents))
    val n = both.count()
    val agree = both.where($"flat" === $"hier").count()
    // two-level routing is approximate only near coarse boundaries
    assert(agree.toDouble / n >= 0.9, s"$agree / $n")
    // determinism: repartitioning never changes a single assignment
    val h1 = both.select($"vec_id", $"hier").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = both.repartition(13).select($"vec_id", $"hier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2)
  }

  test("proportional sampling keeps heavy rows surely and zero-weight rows never") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, if (i <= 100) 0L else if (i <= 200) 1000L else 250L))
      .toDF("id", "w")
    val kept = graft.operators.DatasetSplit.sampleProportional(docs, "id", "w", 1000L)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(kept.intersect((1L to 100L).toSet).isEmpty)      // weight 0: never
    assert((101L to 200L).forall(kept.contains))            // weight >= full: always
    val frac = kept.count(_ > 200L).toDouble / 800.0        // weight 1/4: ~25%
    assert(frac > 0.15 && frac < 0.35, frac)
    // deterministic: a second run keeps the identical set
    val again = graft.operators.DatasetSplit.sampleProportional(docs, "id", "w", 1000L)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(again == kept)
  }

  test("percentilesDisc selects exact order statistics per group") {
    import spark.implicits._
    // group g: values 10..19 (n=10): p0=10, p50 -> rank (9*50)/100=4 -> 14,
    // p100 -> rank 9 -> 19; singleton group: every q returns the value
    val df = ((0 until 10).map(i => ("g", 10L + i, i.toLong)) :+ (("s", 7L, 99L)))
      .toDF("grp", "v", "id")
    val out = graft.operators.CorpusStats.percentilesDisc(df, "grp", "v", "id", Seq(0, 50, 100))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("g", 0L, 10L), ("g", 50L, 14L), ("g", 100L, 19L),
      ("s", 0L, 7L), ("s", 50L, 7L), ("s", 100L, 7L)), out)
  }

  test("gopher rules flag exactly the injected defect per document") {
    import spark.implicits._
    val base = (1 to 60).map(i => f"gamma$i%03d").mkString(" ") + " the of and"
    val docs = Seq(
      (1L, base),                                    // passes everything
      (2L, "too short the of"),                      // r_words
      (3L, base + " " + "# " * 20),                  // r_symbols
      (4L, base + "\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\n- k\n- l"), // r_bullets
      (5L, base + "\nmore..." * 10),                 // r_ellipsis
      (6L, base + " " + "42 77 901 5 88 13 6 200 31 7 " * 5), // r_alpha
      (7L, (1 to 60).map(i => f"delta$i%03d").mkString(" "))) // r_stopwords
      .toDF("doc_id", "text")
    val f = graft.text.QualityRules.gopherFlags(docs, "doc_id", "text")
      .select($"doc_id", $"r_words", $"r_symbols", $"r_bullets", $"r_ellipsis",
        $"r_alpha", $"r_stopwords", $"pass_all")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(f(1L)._8, f(1L))
    assert(!f(2L)._2 && !f(2L)._8)
    assert(!f(3L)._3 && f(3L)._2)
    assert(!f(4L)._4 && f(4L)._3)
    assert(!f(5L)._5 && f(5L)._4)
    assert(!f(6L)._6 && f(6L)._5)
    assert(!f(7L)._7 && f(7L)._6)
  }

  test("range join matches a nested-loop reference and never plans one") {
    import spark.implicits._
    val pts = (0L until 200L).map(t => (t, s"p$t")).toDF("t", "p")
    // overlapping, boundary-touching, empty and point-sized intervals
    val ivs = Seq((1L, 10L, 20L), (2L, 15L, 40L), (3L, 20L, 20L),
      (4L, 500L, 600L), (5L, 0L, 6L)).toDF("iv", "s", "e")
    val out = graft.operators.RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", 8L)
    val got = out.select($"iv", $"t").as[(Long, Long)].collect().toSet
    val want = (for {
      (iv, s, e) <- Seq((1L, 10L, 20L), (2L, 15L, 40L), (3L, 20L, 20L), (4L, 500L, 600L), (5L, 0L, 6L))
      t <- 0L until 200L if t >= s && t <= e
    } yield (iv, t)).toSet
    assert(got == want)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan.take(3000))
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
