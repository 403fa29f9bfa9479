package graft.stats

import graft.linalg.Dense

/**
 * Pure-function probability kernels used by filters and mixtures.
 * Capability parity with the reference's stats package
 * (/root/reference/src/main/scala/com/github/ozancicek/artan/ml/stats/Distribution.scala:1).
 */
object Distributions {

  private val Log2Pi = math.log(2.0 * math.Pi)

  /** Multivariate normal logpdf via Cholesky of the covariance. */
  def mvnLogpdf(x: Array[Double], mean: Array[Double], cov: Array[Double]): Double = {
    val n = x.length
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = x(i) - mean(i); i += 1 }
    val l = Dense.cholesky(cov, n)
    if (l == null) {
      // fall back: regularize diagonal minimally until PD
      val c = cov.clone()
      var jit = 1e-12
      var lf = Dense.cholesky(c, n)
      while (lf == null && jit < 1e-3) {
        var k = 0
        while (k < n) { c(k * n + k) += jit; k += 1 }
        lf = Dense.cholesky(c, n)
        jit *= 10
      }
      require(lf != null, "covariance not positive definite")
      return logpdfFromChol(d, lf, n)
    }
    logpdfFromChol(d, l, n)
  }

  private def logpdfFromChol(d: Array[Double], l: Array[Double], n: Int): Double = {
    val z = Dense.forwardSolve(l, d, n)
    val maha2 = Dense.dot(z, z)
    -0.5 * (n * Log2Pi + Dense.logDetFromChol(l, n) + maha2)
  }

  /** Mahalanobis distance sqrt((x-m)^T C^-1 (x-m)). */
  def mahalanobis(x: Array[Double], mean: Array[Double], cov: Array[Double]): Double = {
    val n = x.length
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = x(i) - mean(i); i += 1 }
    val l = Dense.cholesky(cov, n)
    require(l != null, "covariance not positive definite")
    val z = Dense.forwardSolve(l, d, n)
    math.sqrt(Dense.dot(z, z))
  }

  /** Poisson log pmf. The rate is clamped away from zero: a mixture M-step
    * can drive a component's rate to exactly 0 (all responsibility-weighted
    * samples zero), and k*log(0) would NaN/-Inf-poison subsequent E-steps. */
  def poissonLogpmf(k: Long, rate: Double): Double = {
    val r = math.max(rate, 1e-12)
    k * math.log(r) - r - logGamma(k + 1.0)
  }

  /** Bernoulli log pmf. log(1-p) instead of log1p(-p): mixture probabilities
    * stay bounded away from 0/1 by the EM blend, where the two are equal to
    * within an ulp, and log(1-p) replays portably in engines without log1p. */
  def bernoulliLogpmf(x: Boolean, p: Double): Double =
    if (x) math.log(p) else math.log(1.0 - p)

  /** Lanczos log-gamma. */
  def logGamma(xIn: Double): Double = {
    var x = xIn
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      x -= 1.0
      val g = 7.0
      val c = Array(
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
      var a = c(0)
      val t = x + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }
}
