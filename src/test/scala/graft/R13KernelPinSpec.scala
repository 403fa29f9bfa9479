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
