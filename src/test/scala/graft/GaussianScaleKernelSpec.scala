package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.GaussianExpressions

/**
 * Cross-checks the native GaussianScale kernel against an INDEPENDENT
 * textbook Cholesky + matvec written in this spec (not graft.linalg.Dense)
 * on random SPD matrices, row by row through the real codegen'd Column
 * path. The q_rand_gaussian moment oracle cannot see a moment-preserving
 * transform bug (e.g. a sign flip that keeps covariance); this can.
 */
class GaussianScaleKernelSpec extends AnyFunSuite with SparkTestSession {

  /** Reference lower Cholesky, classic jik order — deliberately a different
    * code path from Dense.cholesky. Returns null when not PD. */
  private def refChol(a: Array[Double], n: Int): Array[Double] = {
    val l = new Array[Double](n * n)
    for (j <- 0 until n) {
      var d = a(j * n + j)
      for (k <- 0 until j) d -= l(j * n + k) * l(j * n + k)
      if (d <= 0) return null
      l(j * n + j) = math.sqrt(d)
      for (i <- j + 1 until n) {
        var s = a(i * n + j)
        for (k <- 0 until j) s -= l(i * n + k) * l(j * n + k)
        l(i * n + j) = s / l(j * n + j)
      }
    }
    l
  }

  test("GaussianScale equals independent cholesky+matvec on random SPD matrices") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812)
    val n = 4
    val rows = (0 until 50).map { i =>
      // SPD by construction: M Mt + 0.5 I
      val m = Array.fill(n * n)(rng.nextGaussian())
      val a = new Array[Double](n * n)
      for (r <- 0 until n; c <- 0 until n) {
        var s = if (r == c) 0.5 else 0.0
        for (k <- 0 until n) s += m(r * n + k) * m(c * n + k)
        a(r * n + c) = s
      }
      (i.toLong, Array.fill(n)(rng.nextGaussian()), a, Array.fill(n)(rng.nextGaussian()))
    }
    val out = rows.toDF("id", "mean", "cov", "z")
      .select(col("id"), GaussianExpressions.gaussianScale(col("mean"), col("cov"), col("z")).as("v"))
      .as[(Long, Array[Double])].collect().toMap

    for ((id, mean, cov, z) <- rows) {
      val l = refChol(cov, n)
      assert(l != null, s"row $id: reference says SPD, test setup broken")
      val expect = mean.clone()
      for (i <- 0 until n; j <- 0 to i) expect(i) += l(i * n + j) * z(j)
      val got = out(id)
      for (i <- 0 until n) {
        val tol = 1e-11 * math.max(1.0, math.abs(expect(i)))
        assert(math.abs(got(i) - expect(i)) <= tol,
          s"row $id coord $i: kernel ${got(i)} vs reference ${expect(i)}")
      }
    }
  }

  test("GaussianScale yields null for a non-PD covariance") {
    import spark.implicits._
    // rank-deficient: ones matrix
    val rows = Seq((1L, Array(0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0), Array(1.0, 1.0)))
    val got = rows.toDF("id", "mean", "cov", "z")
      .select(GaussianExpressions.gaussianScale(col("mean"), col("cov"), col("z")).as("v"))
      .collect()
    assert(got.head.isNullAt(0), "non-PD covariance must produce null, not garbage")
  }
}
