package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.VectorFunctions._

/**
 * Seeded-determinism + moment checks for the multivariate gaussian samplers
 * (reference parity: SparkFunctions.randMultiGaussian / WithCol,
 * /root/reference/src/main/scala/com/github/ozancicek/artan/ml/SparkFunctions.scala:242,256).
 */
class RandomFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private val N = 40000
  private val mean = Array(1.0, -2.0)
  // cov = [[4, 1.2], [1.2, 1.0]]
  private val cov = Array(4.0, 1.2, 1.2, 1.0)

  private def base = spark.range(N).repartition(8)

  test("randMultiGaussian: same seed is bit-identical, different seed is not") {
    val a = base.select(randMultiGaussian(mean, cov, seed = 7).as("x")).collect().map(_.getSeq[Double](0))
    val b = base.select(randMultiGaussian(mean, cov, seed = 7).as("x")).collect().map(_.getSeq[Double](0))
    val c = base.select(randMultiGaussian(mean, cov, seed = 8).as("x")).collect().map(_.getSeq[Double](0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("randMultiGaussian: sample moments match the literal distribution") {
    val rows = base.select(randMultiGaussian(mean, cov, seed = 42).as("x"))
      .select(element_at(col("x"), 1).as("x0"), element_at(col("x"), 2).as("x1"))
      .agg(avg("x0"), avg("x1"), var_samp("x0"), var_samp("x1"), covar_samp("x0", "x1"))
      .head()
    val (m0, m1, v0, v1, c01) =
      (rows.getDouble(0), rows.getDouble(1), rows.getDouble(2), rows.getDouble(3), rows.getDouble(4))
    assert(math.abs(m0 - 1.0) < 0.05, s"mean0=$m0")
    assert(math.abs(m1 + 2.0) < 0.05, s"mean1=$m1")
    assert(math.abs(v0 - 4.0) < 0.15, s"var0=$v0")
    assert(math.abs(v1 - 1.0) < 0.05, s"var1=$v1")
    assert(math.abs(c01 - 1.2) < 0.1, s"cov01=$c01")
  }

  test("randMultiGaussianWithCol: per-row params, draws consistent across coordinates") {
    // Two distinct per-row distributions; check each group's moments.
    val df = spark.range(N).repartition(8)
      .withColumn("grp", (col("id") % 2).cast("int"))
      .withColumn("mu", when(col("grp") === 0, array(lit(0.0), lit(0.0)))
        .otherwise(array(lit(5.0), lit(5.0))))
      .withColumn("sigma", when(col("grp") === 0,
        matrixStruct(2, 2, array(lit(1.0), lit(0.0), lit(0.0), lit(1.0))))
        .otherwise(matrixStruct(2, 2, array(lit(2.0), lit(0.5), lit(0.5), lit(1.0)))))
      .withColumn("x", randMultiGaussianWithCol(col("mu"), col("sigma"), 2, seed = 11))
      .select(col("grp"), element_at(col("x"), 1).as("x0"), element_at(col("x"), 2).as("x1"))
    val stats = df.groupBy("grp")
      .agg(avg("x0").as("m0"), avg("x1").as("m1"), var_samp("x0").as("v0"), covar_samp("x0", "x1").as("c01"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (m0a, m1a, v0a, c01a) = stats(0)
    assert(math.abs(m0a) < 0.05 && math.abs(m1a) < 0.05, s"grp0 means ($m0a,$m1a)")
    assert(math.abs(v0a - 1.0) < 0.1, s"grp0 var0=$v0a")
    assert(math.abs(c01a) < 0.05, s"grp0 cov=$c01a")
    val (m0b, m1b, v0b, c01b) = stats(1)
    assert(math.abs(m0b - 5.0) < 0.05 && math.abs(m1b - 5.0) < 0.05, s"grp1 means ($m0b,$m1b)")
    assert(math.abs(v0b - 2.0) < 0.15, s"grp1 var0=$v0b")
    assert(math.abs(c01b - 0.5) < 0.1, s"grp1 cov=$c01b")
  }

  test("cholMatrix factors SPD and returns null values for non-PD") {
    val df = spark.range(1)
      .withColumn("pd", matrixStruct(2, 2, array(lit(4.0), lit(1.2), lit(1.2), lit(1.0))))
      .withColumn("npd", matrixStruct(2, 2, array(lit(1.0), lit(2.0), lit(2.0), lit(1.0))))
      .select(cholMatrix(col("pd")).getField("values").as("l"),
        cholMatrix(col("npd")).getField("values").as("bad"))
    val row = df.head()
    val l = row.getSeq[Double](0)
    assert(math.abs(l(0) - 2.0) < 1e-12)
    assert(math.abs(l(2) - 0.6) < 1e-12)
    assert(row.isNullAt(1))
  }

  test("MLlib UDT interop round-trips vectors and converts matrices row-major") {
    import org.apache.spark.ml.linalg.{Matrices, Vectors}
    import spark.implicits._
    val df = Seq((Vectors.dense(1.0, 2.0, 3.0), Matrices.dense(2, 2, Array(1.0, 3.0, 2.0, 4.0))))
      .toDF("v", "m")
    val row = df.select(
      vectorToArray(col("v")).as("a"),
      vectorToArray(arrayToVector(vectorToArray(col("v")))).as("rt"),
      matrixToStruct(col("m")).as("ms")).head()
    assert(row.getSeq[Double](0) == Seq(1.0, 2.0, 3.0))
    assert(row.getSeq[Double](1) == Seq(1.0, 2.0, 3.0))
    val ms = row.getStruct(2)
    assert(ms.getInt(0) == 2 && ms.getInt(1) == 2)
    assert(ms.getSeq[Double](2) == Seq(1.0, 2.0, 3.0, 4.0)) // column-major input -> row-major values
  }

  test("scaleToMultiGaussian shifts a materialized draw by mean + L z") {
    val df = spark.range(1)
      .withColumn("z", array(lit(1.0), lit(-1.0)))
      .withColumn("l", matrixStruct(2, 2, array(lit(2.0), lit(0.0), lit(0.6), lit(0.8))))
      .select(scaleToMultiGaussian(array(lit(10.0), lit(20.0)), col("l"), col("z")).as("x"))
    val x = df.head().getSeq[Double](0)
    assert(math.abs(x(0) - 12.0) < 1e-12)   // 10 + 2*1
    assert(math.abs(x(1) - 19.8) < 1e-12)   // 20 + 0.6*1 - 0.8*1
  }
}
