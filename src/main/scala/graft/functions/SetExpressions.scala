package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Count-only set intersection over SORTED, DEDUPLICATED arrays — the dedup
 * verify kernel (optimization round 13). Every exact-Jaccard verify in the
 * engine computed `size(array_intersect(a, b))`: array_intersect builds a
 * hash set AND materializes the intersection array per candidate pair, only
 * for `size` to throw it away — at 260k candidate pairs per sf0.1 τ-join
 * that allocation was the single hottest code path in the book. This kernel
 * is the classic two-pointer merge count: zero allocation, O(|a| + |b|),
 * inside whole-stage codegen.
 *
 * CONTRACT: both inputs sorted ascending (sort_array order) with distinct
 * elements and no nulls — exactly what the verify projections feed after
 * their sort_array(array_distinct(...)) / sort_array(sset) canonicalization.
 * On such inputs the count is bit-identical to size(array_intersect(a, b));
 * R13KernelPinSpec pins it.
 */
object SetKernels extends Serializable {

  def intersectCountLong(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def intersectCountString(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** |a ∩ b| of two sorted deduplicated arrays (array<long> or array<string>). */
case class IntersectCountSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"

  /** Reject unsupported element types at ANALYSIS time (round-13 advice:
    * the lazy-val check surfaced mid-job as IllegalArgumentException). The
    * sorted+deduplicated input contract stays at the call sites, which
    * canonicalize with sort_array(array_distinct(...)). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) |
           (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<long> or two array<string> arguments, " +
            s"got ${l.simpleString(100)} and ${r.simpleString(100)}")
    }

  private lazy val isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case ArrayType(StringType, _) => false
    case t => throw new IllegalArgumentException(
      s"intersect_count_sorted supports array<long>/array<string>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) SetKernels.intersectCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else SetKernels.intersectCountString(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "intersectCountLong" else "intersectCountString"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetKernels.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountSortedExpr =
    copy(left = l, right = r)
}

object SetExpressions {
  /** Count of common elements; both columns must be sorted + deduplicated. */
  def intersectCountSorted(a: Column, b: Column): Column =
    Bridge.column(IntersectCountSortedExpr(Bridge.expression(a), Bridge.expression(b)))
}
