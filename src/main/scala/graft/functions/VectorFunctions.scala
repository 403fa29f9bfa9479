package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * SQL-level vector/matrix helpers — capability parity with the reference's
 * SparkFunctions (/root/reference/src/main/scala/com/github/ozancicek/artan/ml/SparkFunctions.scala:32),
 * but expressed over plain `array<double>` + (numRows,numCols,values) structs
 * with `org.apache.spark.sql.functions` higher-order functions. Everything
 * stays inside whole-stage codegen (the reference uses row-at-a-time UDFs),
 * which is the difference between scanning 100 TB at memory bandwidth vs
 * serializing every row through a Scala closure.
 */
object VectorFunctions {

  /** vector of zeros. */
  def zerosVector(size: Int): Column = array_repeat(lit(0.0), size)

  /** vector of ones. */
  def onesVector(size: Int): Column = array_repeat(lit(1.0), size)

  /** dot product. */
  def dotVector(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  /** alpha * x. */
  def scalVector(alpha: Column, x: Column): Column = transform(x, v => alpha * v)

  /** alpha * x + y. */
  def axpyVector(alpha: Column, x: Column, y: Column): Column =
    zip_with(x, y, (a, b) => alpha * a + b)

  /** L2 norm. */
  def normVector(x: Column): Column = sqrt(dotVector(x, x))

  /** identity matrix as (numRows,numCols,values) struct. */
  def eyeMatrix(n: Int): Column = matrixStruct(n, n,
    flatten(transform(sequence(lit(0), lit(n - 1)),
      i => transform(sequence(lit(0), lit(n - 1)), j => when(i === j, 1.0).otherwise(0.0)))))

  /** zero matrix struct. */
  def zerosMatrix(rows: Int, cols: Int): Column =
    matrixStruct(rows, cols, array_repeat(lit(0.0), rows * cols))

  /** diagonal matrix struct from a vector column. */
  def diagMatrix(diag: Column): Column = {
    val n = size(diag)
    struct(n.as("numRows"), n.as("numCols"),
      flatten(transform(sequence(lit(0), n - 1),
        i => transform(sequence(lit(0), n - 1),
          j => when(i === j, element_at(diag, i + 1)).otherwise(lit(0.0))))).as("values"))
  }

  /** (numRows, numCols, row-major values) struct from parts. */
  def matrixStruct(rows: Int, cols: Int, values: Column): Column =
    struct(lit(rows).as("numRows"), lit(cols).as("numCols"), values.as("values"))

  /** array<double> <-> matrix struct round trips. */
  def arrayToMatrix(rows: Int, cols: Int, values: Column): Column = matrixStruct(rows, cols, values)
  def matrixToArray(m: Column): Column = m.getField("values")

  /** matrix-vector multiply (row-major struct x array). */
  def multiplyMatrixVector(m: Column, x: Column): Column = {
    val rows = m.getField("numRows")
    val cols = m.getField("numCols")
    val v = m.getField("values")
    transform(sequence(lit(0), rows - 1), i =>
      aggregate(
        zip_with(slice(v, i * cols + 1, cols), x, (a, b) => a * b),
        lit(0.0), (acc, p) => acc + p))
  }

  /** matrix-matrix multiply on row-major structs. */
  def multiplyMatrix(a: Column, b: Column): Column = {
    val m = a.getField("numRows")
    val k = a.getField("numCols")
    val n = b.getField("numCols")
    val av = a.getField("values")
    val bv = b.getField("values")
    struct(m.as("numRows"), n.as("numCols"),
      flatten(transform(sequence(lit(0), m - 1), i =>
        transform(sequence(lit(0), n - 1), j =>
          aggregate(sequence(lit(0), k - 1), lit(0.0),
            (acc, p) => acc + element_at(av, i * k + p + 1) * element_at(bv, p * n + j + 1))))).as("values"))
  }

  /** outer product alpha * x y^T as matrix struct. */
  def outerProduct(alpha: Column, x: Column, y: Column): Column =
    struct(size(x).as("numRows"), size(y).as("numCols"),
      flatten(transform(x, a => transform(y, b => alpha * a * b))).as("values"))

  /** projection A B A^T for row-major structs (via two multiplies). */
  def projectMatrix(mat: Column, projection: Column): Column =
    multiplyMatrix(multiplyMatrix(projection, mat), transposeMatrix(projection))

  /** transpose of a row-major matrix struct. */
  def transposeMatrix(m: Column): Column = {
    val rows = m.getField("numRows")
    val cols = m.getField("numCols")
    val v = m.getField("values")
    struct(cols.as("numRows"), rows.as("numCols"),
      flatten(transform(sequence(lit(0), cols - 1), j =>
        transform(sequence(lit(0), rows - 1), i => element_at(v, i * cols + j + 1)))).as("values"))
  }

  // ------------------------------------------------------------- sampling
  // Parity with the reference's randMultiGaussian / randMultiGaussianWithCol
  // (/root/reference/src/main/scala/com/github/ozancicek/artan/ml/SparkFunctions.scala:242,256).
  // `randn` is NONDETERMINISTIC: placing it inside a higher-order-function
  // lambda would re-draw per array element, so the draws here are either
  // unrolled into a single flat projection (literal params — stays in
  // whole-stage codegen) or pre-evaluated as UDF arguments (column params).

  /** Vector of independent standard-normal draws; seeds i-th entry with seed+i. */
  def randnVector(n: Int, seed: Long): Column =
    array((0 until n).map(i => randn(seed + i)): _*)

  /**
   * mean + covRoot * normal. Pure expressions; `normal` MUST be a materialized
   * column (e.g. `.withColumn("z", randnVector(...))` first) — a raw randn
   * expression would be re-drawn for every output coordinate.
   */
  def scaleToMultiGaussian(mean: Column, covRoot: Column, normal: Column): Column =
    zip_with(mean, multiplyMatrixVector(covRoot, normal), (a, b) => a + b)

  /**
   * Sample from N(mean, cov) with literal parameters. Cholesky runs once on
   * the driver; the per-row work unrolls to `mean_i + sum_j L_ij * randn(seed+j)`
   * — every randn(seed+j) instance shares the seed and is evaluated exactly
   * once per row in the same projection, so the draws agree across coordinates
   * and the whole sampler stays inside whole-stage codegen (no UDF).
   * (The reference's literal variant forgets to use its Cholesky root —
   * SparkFunctions.scala:243-244 — we scale by L, which is what gives the
   * sample covariance L L^T = cov.)
   */
  def randMultiGaussian(mean: Array[Double], cov: Array[Double], seed: Long = 0): Column = {
    val n = mean.length
    require(cov.length == n * n, s"covariance must be ${n}x$n row-major")
    val l = graft.linalg.Dense.cholesky(cov, n)
    require(l != null, "covariance is not positive definite")
    array((0 until n).map { i =>
      (0 to i).foldLeft(lit(mean(i))) { (acc, j) =>
        if (l(i * n + j) == 0.0) acc else acc + lit(l(i * n + j)) * randn(seed + j)
      }
    }: _*)
  }

  /** Per-row lower-triangular Cholesky factor of an SPD matrix struct
    * (native codegen'd kernel; null values when not PD). */
  def cholMatrix(m: Column): Column =
    struct(m.getField("numRows").as("numRows"), m.getField("numCols").as("numCols"),
      GaussianExpressions.choleskyValues(m.getField("values")).as("values"))

  /**
   * Sample from N(meanCol, covCol) with per-row distribution parameters —
   * a single native kernel call per row (cholesky + triangular scale), no
   * UDF. The normal draws are a materialized child expression (ONE array
   * per row), so every output coordinate sees the same draw vector.
   */
  def randMultiGaussianWithCol(meanCol: Column, covCol: Column, size: Int, seed: Long = 0): Column =
    GaussianExpressions.gaussianScale(
      meanCol.cast("array<double>"), covCol.getField("values").cast("array<double>"),
      randnVector(size, seed))

  // -------------------------------------------------- MLlib UDT interop
  // Users migrating pipelines built on org.apache.spark.ml.linalg types
  // (the reference's column currency) convert at the boundary; graft's own
  // operators stay on array<double> / matrix structs, which codegen.

  private val vectorToArrayUdf = udf { v: org.apache.spark.ml.linalg.Vector =>
    Option(v).map(_.toArray).orNull
  }
  private val arrayToVectorUdf = udf { a: Seq[Double] =>
    Option(a).map(x => org.apache.spark.ml.linalg.Vectors.dense(x.toArray)).orNull
  }
  private val matrixToStructUdf = udf { m: org.apache.spark.ml.linalg.Matrix =>
    // row-major values to match graft's (numRows, numCols, values) structs
    Option(m).map(x => (x.numRows, x.numCols, x.toDense.rowIter.flatMap(_.toArray).toSeq)).orNull
  }

  /** MLlib Vector column -> array<double>. */
  def vectorToArray(v: Column): Column = vectorToArrayUdf(v)

  /** array<double> column -> MLlib dense Vector. */
  def arrayToVector(a: Column): Column = arrayToVectorUdf(a)

  /** MLlib Matrix column -> graft (numRows, numCols, row-major values) struct. */
  def matrixToStruct(m: Column): Column = {
    val t = matrixToStructUdf(m)
    struct(t.getField("_1").as("numRows"), t.getField("_2").as("numCols"),
      t.getField("_3").as("values"))
  }
}
