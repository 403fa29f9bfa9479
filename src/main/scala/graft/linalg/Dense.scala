package graft.linalg

/**
 * Minimal dense linear algebra on raw Array[Double], row-major.
 *
 * Purpose-built for the small per-key state dimensions of online filters
 * (state sizes are typically 1-10), where allocation-light flat-array
 * arithmetic inside `mapPartitions` beats any generic library dispatch.
 * Semantics cover what the reference engine needs (see
 * /root/reference/src/main/scala/com/github/ozancicek/artan/ml/linalg/LinalgUtils.scala:1
 * for the reference's equivalent surface): multiply, transpose-products,
 * SPD inverse via Cholesky, log-determinant, and a pivoted Gauss-Jordan
 * fallback for near-singular matrices.
 */
object Dense {

  /** C = A(m x k) * B(k x n), row-major. */
  def matmul(a: Array[Double], b: Array[Double], m: Int, k: Int, n: Int): Array[Double] = {
    val c = new Array[Double](m * n)
    var i = 0
    while (i < m) {
      var p = 0
      while (p < k) {
        val aip = a(i * k + p)
        if (aip != 0.0) {
          var j = 0
          while (j < n) {
            c(i * n + j) += aip * b(p * n + j)
            j += 1
          }
        }
        p += 1
      }
      i += 1
    }
    c
  }

  /** y = A(m x n) * x(n). */
  def matvec(a: Array[Double], x: Array[Double], m: Int, n: Int): Array[Double] = {
    val y = new Array[Double](m)
    var i = 0
    while (i < m) {
      var s = 0.0
      var j = 0
      while (j < n) { s += a(i * n + j) * x(j); j += 1 }
      y(i) = s
      i += 1
    }
    y
  }

  /** A(m x n) transposed -> (n x m). */
  def transpose(a: Array[Double], m: Int, n: Int): Array[Double] = {
    val t = new Array[Double](n * m)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { t(j * m + i) = a(i * n + j); j += 1 }
      i += 1
    }
    t
  }

  /** C = A * B^T where A is (m x k), B is (n x k). */
  def matmulNT(a: Array[Double], b: Array[Double], m: Int, k: Int, n: Int): Array[Double] = {
    val c = new Array[Double](m * n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        var s = 0.0
        var p = 0
        while (p < k) { s += a(i * k + p) * b(j * k + p); p += 1 }
        c(i * n + j) = s
        j += 1
      }
      i += 1
    }
    c
  }

  /** C = A^T * B where A is (k x m), B is (k x n). */
  def matmulTN(a: Array[Double], b: Array[Double], k: Int, m: Int, n: Int): Array[Double] = {
    val c = new Array[Double](m * n)
    var p = 0
    while (p < k) {
      var i = 0
      while (i < m) {
        val api = a(p * m + i)
        if (api != 0.0) {
          var j = 0
          while (j < n) { c(i * n + j) += api * b(p * n + j); j += 1 }
        }
        i += 1
      }
      p += 1
    }
    c
  }

  /** B = alpha * A + B, in place on b. */
  def axpy(alpha: Double, a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { b(i) += alpha * a(i); i += 1 }
    b
  }

  def scale(alpha: Double, a: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = alpha * a(i); i += 1 }
    r
  }

  def add(a: Array[Double], b: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) + b(i); i += 1 }
    r
  }

  def sub(a: Array[Double], b: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) - b(i); i += 1 }
    r
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** alpha * x yT, (m x n) outer product. */
  def outer(alpha: Double, x: Array[Double], y: Array[Double]): Array[Double] = {
    val m = x.length; val n = y.length
    val c = new Array[Double](m * n)
    var i = 0
    while (i < m) {
      val ax = alpha * x(i)
      var j = 0
      while (j < n) { c(i * n + j) = ax * y(j); j += 1 }
      i += 1
    }
    c
  }

  def eye(n: Int): Array[Double] = {
    val a = new Array[Double](n * n)
    var i = 0
    while (i < n) { a(i * n + i) = 1.0; i += 1 }
    a
  }

  /**
   * Lower-triangular Cholesky factor of SPD A (n x n). Returns null when the
   * matrix is not positive definite (caller falls back to pivoted inverse).
   */
  def cholesky(a: Array[Double], n: Int): Array[Double] = {
    val l = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = a(i * n + j)
        var p = 0
        while (p < j) { s -= l(i * n + p) * l(j * n + p); p += 1 }
        if (i == j) {
          if (s <= 0.0) return null
          l(i * n + i) = math.sqrt(s)
        } else {
          l(i * n + j) = s / l(j * n + j)
        }
        j += 1
      }
      i += 1
    }
    l
  }

  /** Solve L z = b (forward) for lower-triangular L. */
  def forwardSolve(l: Array[Double], b: Array[Double], n: Int): Array[Double] = {
    val z = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var j = 0
      while (j < i) { s -= l(i * n + j) * z(j); j += 1 }
      z(i) = s / l(i * n + i)
      i += 1
    }
    z
  }

  /** Inverse of SPD A via Cholesky; null if not SPD. */
  def cholInverse(a: Array[Double], n: Int): Array[Double] = {
    val l = cholesky(a, n)
    if (l == null) return null
    // invert L in place into linv (forward substitution per unit column)
    val linv = new Array[Double](n * n)
    var c = 0
    while (c < n) {
      var i = c
      while (i < n) {
        var s = if (i == c) 1.0 else 0.0
        var j = c
        while (j < i) { s -= l(i * n + j) * linv(j * n + c); j += 1 }
        linv(i * n + c) = s / l(i * n + i)
        i += 1
      }
      c += 1
    }
    // A^-1 = Linv^T * Linv
    matmulTN(linv, linv, n, n, n)
  }

  /** log(det(A)) for SPD A given its Cholesky factor. */
  def logDetFromChol(l: Array[Double], n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += math.log(l(i * n + i)); i += 1 }
    2.0 * s
  }

  /** General inverse by Gauss-Jordan with partial pivoting; null if singular. */
  def gjInverse(aIn: Array[Double], n: Int): Array[Double] = {
    val a = aIn.clone()
    val inv = eye(n)
    var col = 0
    while (col < n) {
      var piv = col
      var best = math.abs(a(col * n + col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r * n + col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best < 1e-13) return null
      if (piv != col) {
        var j = 0
        while (j < n) {
          val t1 = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t1
          val t2 = inv(col * n + j); inv(col * n + j) = inv(piv * n + j); inv(piv * n + j) = t2
          j += 1
        }
      }
      val d = a(col * n + col)
      var j = 0
      while (j < n) { a(col * n + j) /= d; inv(col * n + j) /= d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r * n + col)
          if (f != 0.0) {
            var j2 = 0
            while (j2 < n) {
              a(r * n + j2) -= f * a(col * n + j2)
              inv(r * n + j2) -= f * inv(col * n + j2)
              j2 += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    inv
  }

  /** SPD-first inverse with pivoted fallback (mirrors reference pinv intent). */
  def inverse(a: Array[Double], n: Int): Array[Double] = {
    if (n == 1) {
      require(a(0) != 0.0, "singular 1x1 matrix in filter update")
      return Array(1.0 / a(0))
    }
    val c = cholInverse(a, n)
    if (c != null) c
    else {
      val g = gjInverse(a, n)
      require(g != null, s"singular ${n}x$n matrix in filter update")
      g
    }
  }

  /** Symmetrize in place: A = (A + A^T)/2, guards covariance drift. */
  def symmetrize(a: Array[Double], n: Int): Array[Double] = {
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = 0.5 * (a(i * n + j) + a(j * n + i))
        a(i * n + j) = v
        a(j * n + i) = v
        j += 1
      }
      i += 1
    }
    a
  }
}
