package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.VectorExpressions

/** Native vector similarity must be bit-identical to the declarative
  * zip_with/aggregate formulation (left-fold FP order) on real embeddings. */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestSession {

  private def pairs = {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    emb.as("a").crossJoin(emb.limit(20).as("b"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
  }

  private def fsum(arr: org.apache.spark.sql.Column) =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  test("dot, norm, cosine match the HOF left-folds bit-exactly") {
    val hofDot = fsum(zip_with(col("x"), col("y"), (a, b) => a * b))
    val hofNorm = sqrt(fsum(transform(col("x"), v => v * v)))
    val hofNormY = sqrt(fsum(transform(col("y"), v => v * v)))
    val hofCos = when(hofNorm > 0.0 && hofNormY > 0.0, hofDot / (hofNorm * hofNormY)).otherwise(lit(0.0))
    val diff = pairs.select(
        hofDot.as("hd"), VectorExpressions.dotProduct(col("x"), col("y")).as("nd"),
        hofNorm.as("hn"), VectorExpressions.vectorNorm(col("x")).as("nn"),
        hofCos.as("hc"), VectorExpressions.cosineSim(col("x"), col("y")).as("nc"))
      .where(not(col("hd") <=> col("nd")) or not(col("hn") <=> col("nn")) or not(col("hc") <=> col("nc")))
    assert(diff.count() == 0)
  }

  test("nearestCentroid replays the array_max(struct(sim, -cid)) tie order") {
    val cents = Array(
      (5L, Array(1.0, 0.0)),
      (2L, Array(1.0, 0.0)), // duplicate centroid: tie must pick cid 2
      (7L, Array(0.0, 1.0)),
      (9L, Array(0.0, 0.0))) // zero centroid: sim defined as 0
    import spark.implicits._
    val df = Seq(
      (1L, Seq(2.0, 0.1)),
      (2L, Seq(0.1, 3.0)),
      (3L, Seq(0.0, 0.0)) // zero vector: all sims 0 -> smallest cid overall
    ).toDF("id", "v")
      .select(col("id"), VectorExpressions.nearestCentroid(col("v").cast("array<double>"), cents).as("cell"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 2L) // tie between 5 and 2 -> smaller cid
    assert(m(2L) == 7L)
    assert(m(3L) == 2L) // every sim 0 -> smallest cid
  }

  test("similarity expressions stay inside whole-stage codegen") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorExpressions.cosineSim(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("c"))
      .queryExecution.executedPlan
    assert(plan.toString.startsWith("*("), plan.toString)
  }
}
