package graft.linalg

/**
 * Row-major dense matrix carried through DataFrames as a plain struct
 * (numRows, numCols, values) — Product-encoded, columnar-friendly, no UDT.
 */
case class DMat(numRows: Int, numCols: Int, values: Array[Double]) {
  require(values == null || values.length == numRows * numCols,
    s"DMat($numRows x $numCols) needs ${numRows * numCols} values, got ${values.length}")

  def apply(i: Int, j: Int): Double = values(i * numCols + j)

  def multiply(b: DMat): DMat =
    DMat(numRows, b.numCols, Dense.matmul(values, b.values, numRows, numCols, b.numCols))

  def multiply(x: Array[Double]): Array[Double] = Dense.matvec(values, x, numRows, numCols)

  def transpose: DMat = DMat(numCols, numRows, Dense.transpose(values, numRows, numCols))

  override def toString: String =
    (0 until numRows).map(i => (0 until numCols).map(j => apply(i, j)).mkString("[", ", ", "]"))
      .mkString(s"DMat($numRows x $numCols,\n ", "\n ", ")")
}

object DMat {
  def eye(n: Int): DMat = DMat(n, n, Dense.eye(n))

  def zeros(m: Int, n: Int): DMat = DMat(m, n, new Array[Double](m * n))

  def diag(d: Array[Double]): DMat = {
    val n = d.length
    val a = new Array[Double](n * n)
    var i = 0
    while (i < n) { a(i * n + i) = d(i); i += 1 }
    DMat(n, n, a)
  }

  /** Build from row-major values. */
  def of(numRows: Int, numCols: Int, rowMajor: Double*): DMat =
    DMat(numRows, numCols, rowMajor.toArray)
}
