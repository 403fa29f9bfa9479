package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.filter.SparkTestSession
import graft.dedup.MinHashLSH

/**
 * Hot-key stress for the minhash dedup path: one document duplicated 10k
 * times puts 10k rows into the same bucket of every band. The pair join is
 * inherently quadratic there (~8 x 50M joined rows); the star path
 * (duplicateGroups) must stay linear and must not stall.
 */
class DedupSkewSpec extends AnyFunSuite with SparkTestSession {

  private val hotText =
    "the quick brown fox jumps over the lazy dog and then the dog chases the fox around the yard until both collapse"

  private def skewCorpus = {
    import spark.implicits._
    val hot = (0 until 10000).map(i => (i.toLong, hotText))
    val normal = (0 until 500).map { i =>
      (100000L + i, s"unique document number $i speaks about alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    }
    (hot ++ normal).toDF("doc_id", "text")
  }

  test("star candidate generation is linear in bucket size, not quadratic") {
    val lsh = new MinHashLSH(32, 8, 3)
    // replicate the star construction over the public banded() projection:
    // candidates = bucket members paired with the bucket min, distinct
    val b = lsh.banded(skewCorpus, "text").select(col("doc_id"), col("band"), col("bucket"))
    val bmin = b.groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("a"))
    val nCands = b.join(bmin, Seq("band", "bucket"))
      .where(col("a") < col("doc_id"))
      .select(col("a"), col("doc_id")).distinct()
      .count()
    // 10k-clique -> 9999 star candidates (plus any normal-doc collisions),
    // versus ~50M pairs for the clique under all-pairs candidates
    assert(nCands >= 9999L && nCands < 20000L, s"candidates=$nCands")
  }

  test("10k-fold duplicated document does not stall the group dedup (completes, exact canonicals)") {
    val lsh = new MinHashLSH(32, 8, 3)
    val t0 = System.nanoTime()
    val groups = lsh.duplicateGroups(skewCorpus, "doc_id", "text", 0.4).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(groups.length == 10500)
    // every copy of the hot doc canonicalizes to the clique minimum, id 0
    assert(groups.count(r => r.getLong(1) == 0L) == 10000, "hot clique not fully canonicalized")
    // the distinct docs stay their own canonical
    assert(groups.count(r => r.getLong(0) >= 100000L && r.getLong(1) == r.getLong(0)) == 500)
    // stall guard: the quadratic path takes minutes on this input; the star
    // path is seconds even on the 4-core test session. Wall-clock asserts
    // flake under host contention, so the timing check is opt-in (the
    // candidate-count test above is the structural linearity proof).
    if (sys.env.contains("SPARK_GRAFT_TIMING_ASSERTS"))
      assert(dt < 60.0, f"group dedup took ${dt}%.1fs — hot bucket went quadratic?")
    else info(f"group dedup wall time ${dt}%.1fs (timing assert gated behind SPARK_GRAFT_TIMING_ASSERTS)")
  }

  // ------------------------- full-CC components / near-dup-safe split

  test("nearDuplicateComponents keeps candidates linear under a 10k-copy clique") {
    val lsh = new MinHashLSH(32, 8, 3)
    // structural linearity proof, mirroring the star-candidate test:
    // replicate the round-10 exact-set collapse over the public signature
    // projection, then count all-pairs candidates over REPRESENTATIVES —
    // the clique contributes one row, so candidates stay ~linear (the
    // uncollapsed path emits ~8 x 50M joined rows here)
    import org.apache.spark.sql.expressions.Window
    val sigs = lsh.signatures(skewCorpus, "doc_id", "text")
    val reps = sigs
      .withColumn("_rep", min(col("doc_id")).over(Window.partitionBy(sort_array(col("sset")))))
      .where(col("doc_id") === col("_rep"))
    val b = lsh.bandedFromSigs(reps, "doc_id")
    val nCands = b.select(col("doc_id").as("a"), col("band"), col("bucket"))
      .join(b.select(col("doc_id").as("b"), col("band"), col("bucket")), Seq("band", "bucket"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct().count()
    assert(nCands < 20000L, s"candidates=$nCands — collapse did not defuse the clique")
  }

  test("10k-clique components: exact canonicals, near-dup partner joins the clique") {
    import spark.implicits._
    val lsh = new MinHashLSH(32, 8, 3)
    // plant ONE near-dup partner of the hot doc: the component must span
    // the whole clique AND the partner (connectivity through the rep)
    val partner = Seq((500000L, hotText.replace("collapse", "recover")))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val comp = lsh.nearDuplicateComponents(
      skewCorpus.unionAll(partner), "doc_id", "text", 0.4).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(comp.length == 10501)
    val byId = comp.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every clique copy AND the planted partner canonicalize to id 0
    assert((0 until 10000).forall(i => byId(i.toLong) == 0L), "clique not fully labeled")
    assert(byId(500000L) == 0L, "near-dup partner must join the clique component")
    // distinct docs stay their own canonical
    assert((0 until 500).forall(i => byId(100000L + i) == 100000L + i))
    if (sys.env.contains("SPARK_GRAFT_TIMING_ASSERTS"))
      assert(dt < 60.0, f"components took ${dt}%.1fs — hot clique went quadratic?")
    else info(f"components wall time ${dt}%.1fs (timing assert gated behind SPARK_GRAFT_TIMING_ASSERTS)")
  }

  test("nearDupSafeSplit on the cliqued corpus: one split per component, completes") {
    val split = graft.operators.DatasetSplit
      .nearDupSafeSplit(skewCorpus, "doc_id", "text", 0.4)
    val agg = split.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
    // the whole clique lands in ONE split bucket; no component straddles
    val bad = agg.where(col("k") > 1).count()
    assert(bad == 0L, s"$bad components straddle the split boundary")
    assert(agg.where(col("canonical_id") === 0L).select("n").head().getLong(0) == 10000L)
  }

  test("thresholdCurve reports the 10k clique's C(n,2) pairs from linear candidates") {
    val lsh = new MinHashLSH(32, 8, 3)
    val rows = lsh.thresholdCurve(skewCorpus, "doc_id", "text").collect()
    val byBucket = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10k byte-identical docs = 49,995,000 exact-duplicate pairs, COUNTED
    // by multiplicity arithmetic — never materialized as candidate rows
    assert(byBucket(1000L) == 49995000L, s"clique bucket wrong: $byBucket")
    // the reverse cumulative at the lowest bucket equals the total
    val total = rows.map(_.getLong(1)).sum
    assert(rows.minBy(_.getLong(0)).getLong(2) == total)
  }

  test("recallCurve: identical docs are always found; invariants hold") {
    import spark.implicits._
    val same = (0 until 30).map(i =>
      (i.toLong, "a stable paragraph of shared text repeated verbatim in every copy of this fixture"))
    val distinct = (0 until 20).map(i =>
      (1000L + i, s"totally unrelated$i content$i tokens$i here$i nothing$i shared$i at$i all$i"))
    val df = (same ++ distinct).toDF("doc_id", "text")
    val out = new MinHashLSH(32, 8, 3).recallCurve(df, "doc_id", "text", 100L).collect()
    val m = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // identical sets: C(30,2) truth pairs at bucket 1000, all banded
    // (identical signatures share every bucket) -> recall exactly 1000
    assert(m(1000L) == ((435L, 435L, 1000L)), s"got $m")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)), "found > true")
  }

  // ------------------------------------------- prefix-filter exact join

  test("collapsed jaccard join keeps candidates linear under a 10k-copy clique") {
    import graft.dedup.PrefixFilterJoin
    // the RAW exact join's output on a 10k clique is (10k choose 2) pairs —
    // quadratic in the ANSWER, not the algorithm — so the skew-safe path
    // collapses byte-identical element sets to one representative first:
    // candidates (and output) become linear in DISTINCT contents
    val out = PrefixFilterJoin.jaccardPairsCollapsed(
      skewCorpus, "doc_id", "text", tauMilli = 500, shingle = 3).collect()
    // the hot clique collapses to ONE representative: no within-clique
    // pairs; the 500 distinct docs share no trigram shingle at tau=0.5
    assert(out.isEmpty, s"expected no cross-content pairs, got ${out.length}")

    // the representative table carries the clique multiplicity — verify by
    // planting one near-dup partner of the hot doc (shares most trigrams)
    import spark.implicits._
    val partner = Seq((500000L,
      hotText.replace("collapse", "recover"))).toDF("doc_id", "text")
    val out2 = PrefixFilterJoin.jaccardPairsCollapsed(
      skewCorpus.unionAll(partner), "doc_id", "text",
      tauMilli = 500, shingle = 3).collect()
    assert(out2.length == 1, s"expected exactly the planted pair, got ${out2.length}")
    val r = out2.head
    assert(r.getAs[Long]("a") == 0L && r.getAs[Long]("b") == 500000L)
    // the hot side reports all 10k copies, the partner reports 1
    assert(r.getAs[Long]("n_a") == 10000L && r.getAs[Long]("n_b") == 1L)
  }

  test("collapsed and raw jaccard joins agree on a duplicate-free corpus") {
    import graft.dedup.PrefixFilterJoin
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val tail = if (i % 4 == 0) "alpha beta gamma delta epsilon zeta"
      else s"alpha beta gamma delta unique$i tail$i"
      (i.toLong, s"shared prefix words here $tail")
    }.toDF("doc_id", "text")
    val raw = PrefixFilterJoin.jaccardPairs(docs, "doc_id", "text", 500, 3)
      .select("a", "b", "jaccard_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val collapsed = PrefixFilterJoin.jaccardPairsCollapsed(docs, "doc_id", "text", 500, 3)
      .select("a", "b", "jaccard_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // i % 4 == 0 docs are byte-identical => they collapse to representative
    // id 0; normalize the raw pairs through that mapping (drop within-group
    // pairs, re-key members to the representative, dedupe) — the result
    // must equal the collapsed join exactly
    val identicalIds = (0 until 40).filter(_ % 4 == 0).map(_.toLong).toSet
    def rep(id: Long): Long = if (identicalIds.contains(id)) 0L else id
    val rawNormalized = raw
      .map { case (a, b, j) =>
        (math.min(rep(a), rep(b)), math.max(rep(a), rep(b)), j) }
      .filterNot { case (a, b, _) => a == b }
    assert(collapsed == rawNormalized,
      s"raw-normalized=${rawNormalized.size} collapsed=${collapsed.size}")
    assert(collapsed.nonEmpty, "fixture must produce cross-content pairs")
  }

  test("prefix+positional filtered join equals the brute-force tau-join (no false drops)") {
    // Round 14: the candidate join gained the PPJoin positional filter —
    // prove losslessness by comparing against the O(n²) cross join at
    // several thresholds over a corpus dense in borderline pairs.
    import graft.dedup.PrefixFilterJoin
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 18).map(i => s"w$i")
    val base = (0 until 90).map { i =>
      val n = 4 + rnd.nextInt(10)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
    // plant exact-set twins (J=1000) and drop-one-word near-twins
    // (J=(n-1)/n >= 857 for n >= 7 distinct words) so the tau=0.85 band is
    // populated too
    val twins = base.filter(_._1 % 5 == 0).map { case (id, t) => (id + 1000L, t) }
    val nearTwins = base.collect { case (id, t) if t.split(" ").distinct.length >= 8 =>
      (id + 2000L, t.split(" ").distinct.drop(1).mkString(" "))
    }
    val docs = (base ++ twins ++ nearTwins).toDF("doc_id", "text")
    for (tauMilli <- Seq(500L, 700L, 850L)) {
      val fast = PrefixFilterJoin.jaccardPairs(docs, "doc_id", "text", tauMilli, shingle = 1)
        .select("a", "b", "jaccard_milli").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sets = docs.select(col("doc_id").as("sid"),
        sort_array(array_distinct(split(col("text"), " "))).as("ts"))
      val brute = sets.as("x").join(sets.as("y"), col("x.sid") < col("y.sid"))
        .select(col("x.sid").as("a"), col("y.sid").as("b"),
          size(array_intersect(col("x.ts"), col("y.ts"))).cast("long").as("ni"),
          size(array_union(col("x.ts"), col("y.ts"))).cast("long").as("nu"))
        .withColumn("jm", expr("ni * 1000 div nu"))
        .where(col("jm") >= tauMilli)
        .select("a", "b", "jm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == brute,
        s"tau=$tauMilli: fast=${fast.size} brute=${brute.size} " +
          s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
      assert(brute.nonEmpty, s"tau=$tauMilli fixture must produce pairs")
    }
  }
}
