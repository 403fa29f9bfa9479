package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen kernels for the BPE trainer hot path (optimization round
 * 13, guide §1.2 step 2 / §4.1). The trainer's original formulations were
 * Catalyst higher-order functions — CodegenFallback, interpreted lambda per
 * element — and the merge apply was a fold whose accumulator `concat` copies
 * the prefix array per token (O(len²) per word per merge). These kernels are
 * one primitive pass each and stay inside whole-stage codegen.
 *
 * Semantics are bit-identical to the HOF formulations they replace:
 * BpeTrainerSpec pins kernel ≡ fold on adversarial token arrays, and the
 * unchanged DuckDB oracles (q_bpe_train / q_bpe_train_batched /
 * q_bpe_segment / q_fertility) prove it end-to-end.
 */
object BpeKernels extends Serializable {

  /** Greedy left-to-right non-overlapping application of ONE merge
    * (left, right) → merged over a token array: exactly the left fold
    * "merge current token into the accumulator's last when last == left and
    * current == right" (a freshly merged token can never re-match `left`
    * because merged = left||right with right nonempty). */
  def applyMerge(arr: ArrayData, left: UTF8String, right: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (m > 0 && right.equals(t) && left.equals(out(m - 1))) {
        out(m - 1) = merged
      } else {
        out(m) = t
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** Adjacent (left, right) token pairs of an array in order — the pair-
    * count generator input: [(t0,t1), (t1,t2), ...]; empty for len < 2. */
  def adjacentPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val t = arr.getUTF8String(i)
      out(i - 1) = InternalRow(prev, t)
      prev = t
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Every character window of length 2..maxLen of a word, length-major
    * (all 2-grams, then all 3-grams, ...) — the subword-vocab candidate
    * generator. Character indexing matches SQL substring (code points). */
  def charGrams(w: UTF8String, maxLen: Int): ArrayData = {
    val len = w.numChars()
    var total = 0
    var l = 2
    while (l <= maxLen) { if (len >= l) total += len - l + 1; l += 1 }
    if (total == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](total)
    var k = 0
    l = 2
    while (l <= maxLen) {
      if (len >= l) {
        var i = 0
        val last = len - l
        while (i <= last) {
          out(k) = w.substring(i, i + l)
          k += 1
          i += 1
        }
      }
      l += 1
    }
    new GenericArrayData(out)
  }
}

/** One BPE merge applied to an array<string> token column, as a native
  * kernel call inside whole-stage codegen. */
case class ApplyMergeExpr(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply_merge"

  @transient private lazy val l8 = UTF8String.fromString(left)
  @transient private lazy val r8 = UTF8String.fromString(right)
  @transient private lazy val m8 = UTF8String.fromString(left + right)

  override def nullSafeEval(input: Any): Any =
    BpeKernels.applyMerge(input.asInstanceOf[ArrayData], l8, r8, m8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", l8, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeRight", r8, "org.apache.spark.unsafe.types.UTF8String")
    val mRef = ctx.addReferenceObj("bpeMerged", m8, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.applyMerge($c, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyMergeExpr =
    copy(child = newChild)
}

/** Adjacent token pairs array<struct<l,r>> of an array<string> column. */
case class AdjacentPairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("l", StringType), StructField("r", StringType))),
    containsNull = false)
  override def prettyName: String = "adjacent_pairs"

  override def nullSafeEval(input: Any): Any =
    BpeKernels.adjacentPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.adjacentPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairsExpr =
    copy(child = newChild)
}

/** All 2..maxLen character windows of a string column (length-major). */
case class CharGramsExpr(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen >= 2, s"maxLen must be >= 2, got $maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "char_grams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[AnyRef])
    else BpeKernels.charGrams(v.asInstanceOf[UTF8String], maxLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = ${childGen.isNull}
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0])
          : graft.functions.BpeKernels.charGrams(${childGen.value}, $maxLen);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
}

object BpeExpressions {
  def applyMerge(toks: Column, left: String, right: String): Column =
    Bridge.column(ApplyMergeExpr(Bridge.expression(toks), left, right))

  def adjacentPairs(toks: Column): Column =
    Bridge.column(AdjacentPairsExpr(Bridge.expression(toks)))

  def charGrams(w: Column, maxLen: Int): Column =
    Bridge.column(CharGramsExpr(Bridge.expression(w), maxLen))
}
