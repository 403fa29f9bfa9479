package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.PcaExpressions

/** Round-13 optimization kernel pins: each native codegen kernel that
  * replaced an interpreted HOF formulation must be bit-identical to it.
  * (The BPE kernels' pins live in BpeTrainerSpec.) */
class R13KernelPinSpec extends AnyFunSuite with SparkTestSession {

  test("PCA momentStats kernel == the nested-HOF flat stats vector") {
    import spark.implicits._
    val d = 5
    val vecs = Seq(
      Seq(1.0, -2.0, 0.5, 3.25, -0.125),
      Seq(0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(2.5, 2.5, -2.5, 1e3, -1e3)).map(Tuple1(_)).toDF("v")
    val q = transform(col("v").cast("array<double>"), x => round(x * 1000).cast("long"))
    val upper = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        get(col("q"), i) * get(col("q"), j))))
    val hof = vecs.select(q.as("q")).select(concat(col("q"), upper).as("s"))
      .collect().map(_.getSeq[Long](0))
    val kern = vecs.select(q.as("q")).select(PcaExpressions.momentStats(col("q")).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(kern.toSeq == hof.toSeq)
  }

  test("intersectCountSorted kernel == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // long arrays
    val longs = (0 until 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }.toDF("a", "b")
    val gotL = longs.select(
      graft.functions.SetExpressions.intersectCountSorted(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    assert(gotL.forall(r => r.getLong(0) == r.getLong(1)))
    // string arrays
    val strs = (0 until 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))("tok" + rnd.nextInt(40)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))("tok" + rnd.nextInt(40)).distinct.sorted
      (a, b)
    }.toDF("a", "b")
    val gotS = strs.select(
      graft.functions.SetExpressions.intersectCountSorted(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    assert(gotS.forall(r => r.getLong(0) == r.getLong(1)))
    // empties
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(graft.functions.SetExpressions.intersectCountSorted(col("a"), col("b"))).head()
    assert(e.getLong(0) == 0L)
  }

  test("SSJoin length filter never drops a true tau-pair (milli arithmetic)") {
    // The production predicate (Dedup.pairsFromSets) drops a candidate when
    // floor(1000*min div max) < tau. Prove the implication it rests on:
    // for EVERY achievable (I, U) of sets with sizes (la, lb) — I ranges
    // over 0..min, U = la + lb - I — a dropped pair can never verify, i.e.
    // floor(1000*I div U) < tau too (round-13 advice: the old test asserted
    // the filter expression against itself).
    for (la <- 1 to 40; lb <- 1 to 40; tau <- Seq(500L, 700L, 900L)) {
      val (mn, mx) = (math.min(la, lb).toLong, math.max(la, lb).toLong)
      if (mn * 1000 / mx < tau) {
        for (i <- 0L to mn) {
          val u = la + lb - i
          assert(i * 1000 / u < tau,
            s"filter dropped ($la,$lb) at tau=$tau but I=$i,U=$u verifies")
        }
      }
    }
  }

  test("PPJoin positional bound dominates the true overlap for every shared-token event") {
    // Brute-force lemma behind the round-14 positional filter: for random
    // sorted sets A, B and every shared token t at ranks (ra, rb),
    //   |A ∩ B| <= min(ra, rb) + min(|A| - ra, |B| - rb)
    // (min(ra-1, rb-1) common before t, 1 for t, min suffix lengths after).
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 2000) {
      val a = Seq.fill(3 + rnd.nextInt(20))(rnd.nextInt(40)).distinct.sorted
      val b = Seq.fill(3 + rnd.nextInt(20))(rnd.nextInt(40)).distinct.sorted
      val inter = a.toSet.intersect(b.toSet)
      for (t <- inter) {
        val ra = a.indexOf(t) + 1
        val rb = b.indexOf(t) + 1
        val bound = math.min(ra, rb) + math.min(a.size - ra, b.size - rb)
        assert(inter.size <= bound,
          s"a=$a b=$b t=$t I=${inter.size} bound=$bound")
      }
    }
  }

  test("PCA dotWith kernel == zip_with + aggregate integer dot") {
    import spark.implicits._
    val comp = Array(3L, -7L, 1000000L, 0L)
    val vecs = Seq(Seq(1.0, 2.0, -3.0, 4.0), Seq(0.001, -0.001, 0.0005, 9.0))
      .map(Tuple1(_)).toDF("v")
    val q = transform(col("v").cast("array<double>"), x => round(x * 1000).cast("long"))
    val hof = vecs.select(aggregate(
        zip_with(q, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("p"))
      .collect().map(_.getLong(0))
    val kern = vecs.select(PcaExpressions.dotWith(q, comp).as("p"))
      .collect().map(_.getLong(0))
    assert(kern.toSeq == hof.toSeq)
  }
}
