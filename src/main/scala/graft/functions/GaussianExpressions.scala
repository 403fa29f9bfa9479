package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native kernels for per-row-parameter gaussian sampling. These replace the
 * round-2 cholValuesUdf/scaleGaussianUdf (VectorFunctions) — the last UDFs in
 * a graft hot path: q_rand_gaussian runs the scale step on EVERY event row,
 * and a Scala UDF there forces deserialization out of Tungsten rows plus a
 * boxed Seq[Double] round trip per row. The kernel call stays inside
 * whole-stage codegen like the vector/centroid kernels.
 *
 * FP semantics are identical to the UDFs they replace (same
 * graft.linalg.Dense.cholesky, same accumulation order), so
 * RandomFunctionsSpec's seeded-determinism and moment assertions hold
 * unchanged.
 */
object GaussKernel {

  /** mean + L * z with L = cholesky(cov); null when cov is not PD
    * (mirrors the UDF's null contract). */
  def scale(mean: ArrayData, cov: ArrayData, z: ArrayData): ArrayData = {
    val n = mean.numElements()
    val l = graft.linalg.Dense.cholesky(cov.toDoubleArray(), n)
    if (l == null) null
    else {
      val out = mean.toDoubleArray()
      var i = 0
      while (i < n) {
        var j = 0
        while (j <= i) { out(i) += l(i * n + j) * z.getDouble(j); j += 1 }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Lower-triangular Cholesky factor values of a square row-major matrix
    * (n derived from the value count); null when not PD. */
  def chol(values: ArrayData): ArrayData = {
    val n = math.round(math.sqrt(values.numElements().toDouble)).toInt
    val l = graft.linalg.Dense.cholesky(values.toDoubleArray(), n)
    if (l == null) null else new GenericArrayData(l)
  }
}

/** out = mean + cholesky(cov) * z, one kernel call per row in codegen. */
case class GaussianScale(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gaussian_scale"

  override def nullSafeEval(mean: Any, cov: Any, z: Any): Any =
    GaussKernel.scale(mean.asInstanceOf[ArrayData], cov.asInstanceOf[ArrayData],
      z.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, c, z) =>
      s"""
         |${ev.value} = graft.functions.GaussKernel.scale($m, $c, $z);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GaussianScale =
    copy(first = f, second = s, third = t)
}

/** Per-row Cholesky factor of a square row-major SPD matrix values array. */
case class CholeskyValues(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cholesky_values"

  override def nullSafeEval(values: Any): Any =
    GaussKernel.chol(values.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.GaussKernel.chol($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CholeskyValues =
    copy(child = newChild)
}

object GaussianExpressions {
  /** mean + cholesky(cov) * normal — per-row distribution parameters. */
  def gaussianScale(mean: Column, covValues: Column, normal: Column): Column =
    Bridge.column(GaussianScale(
      Bridge.expression(mean), Bridge.expression(covValues), Bridge.expression(normal)))

  def choleskyValues(values: Column): Column =
    Bridge.column(CholeskyValues(Bridge.expression(values)))
}
