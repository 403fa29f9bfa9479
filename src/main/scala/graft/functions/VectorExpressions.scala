package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * Native codegen'd vector similarity for embedding columns. The zip_with/
 * aggregate formulations these replace are CodegenFallback (interpreted
 * lambdas, boxed accumulators) — at corpus scale the cosine IS the workload
 * of every ANN/near-dup query, so it must be a tight primitive loop.
 *
 * FP semantics are replayed exactly: each accumulator folds left-to-right in
 * element order, matching `aggregate(zip_with(...))` — oracle results are
 * bit-identical (VectorExpressionsSpec + the exact ANN oracles prove it).
 */

/** Left-fold dot product of two equal-dim array<double> columns. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** L2 norm of an array<double> column (sqrt of left-fold sum of squares). */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, i, acc, v) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"), ctx.freshName("v"))
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $n = $c.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $c.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Cosine similarity with the zero-norm guard, one pass over both arrays:
  * dot, |a|² and |b|² fold in the same element order as the separate
  * dot/norm/norm expressions, so results are bit-identical. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val (sa, sb) = (math.sqrt(na), math.sqrt(nb))
    if (sa > 0.0 && sb > 0.0) d / (sa * sb) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, i, d, na, nb, xv, yv, sa, sb) = (ctx.freshName("n"), ctx.freshName("i"),
      ctx.freshName("d"), ctx.freshName("na"), ctx.freshName("nb"),
      ctx.freshName("xv"), ctx.freshName("yv"), ctx.freshName("sa"), ctx.freshName("sb"))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $sa = java.lang.Math.sqrt($na);
         |double $sb = java.lang.Math.sqrt($nb);
         |${ev.value} = ($sa > 0.0 && $sb > 0.0) ? $d / ($sa * $sb) : 0.0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Broadcastable centroid table for nearest-centroid assignment. Norms are
  * precomputed with the same left-fold the per-centroid expression used. */
class CentroidKernel(val cids: Array[Long], val flat: Array[Double], val dim: Int)
    extends Serializable {
  val norms: Array[Double] = Array.tabulate(cids.length) { c =>
    var acc = 0.0
    var j = 0
    while (j < dim) { val v = flat(c * dim + j); acc += v * v; j += 1 }
    math.sqrt(acc)
  }

  /** argmax_c cosine(vec, centroid_c); ties -> smallest centroid id
    * (replaying `array_max(struct(sim, -cid))`). */
  def nearest(vec: ArrayData): Long = {
    val n = vec.numElements()
    var nv2 = 0.0
    var i = 0
    while (i < n) { val v = vec.getDouble(i); nv2 += v * v; i += 1 }
    val nv = math.sqrt(nv2)
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < cids.length) {
      var d = 0.0
      var j = 0
      val m = math.min(dim, n)
      while (j < m) { d += vec.getDouble(j) * flat(c * dim + j); j += 1 }
      val sim = if (norms(c) > 0.0 && nv > 0.0) d / (nv * norms(c)) else 0.0
      if (sim > bestSim || (sim == bestSim && cids(c) < bestCid)) {
        bestSim = sim; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** Simplified (centroid-based) silhouette of a vector, micro-quantized:
    * a = cosine distance to the nearest centroid, b = distance to the
    * second-nearest (with multiplicity — two centroids tying at the top
    * give s = 0, the boundary case), s = (b - a) / b since a <= b always.
    * Mirrors `row_number() OVER (ORDER BY sim DESC)` at rk 1 and 2, so the
    * SQL replay is exact. O(k·dim) map-side per row, like `nearest`. */
  def silhouetteMicro(vec: ArrayData): Long = {
    if (cids.length < 2) return 0L
    val n = vec.numElements()
    var nv2 = 0.0
    var i = 0
    while (i < n) { val v = vec.getDouble(i); nv2 += v * v; i += 1 }
    val nv = math.sqrt(nv2)
    var best = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    var c = 0
    while (c < cids.length) {
      var d = 0.0
      var j = 0
      val m = math.min(dim, n)
      while (j < m) { d += vec.getDouble(j) * flat(c * dim + j); j += 1 }
      val sim = if (norms(c) > 0.0 && nv > 0.0) d / (nv * norms(c)) else 0.0
      if (sim > best) { second = best; best = sim }
      else if (sim > second) { second = sim }
      c += 1
    }
    val a = 1.0 - best
    val b = 1.0 - second
    // clamp at the 1e6 ceiling: IEEE rounding can push a cosine marginally
    // above 1.0, making a negative and s > 1 (the oracle replays the same
    // least())
    if (b > 0.0) math.min(1000000L, math.floor((b - a) / b * 1000000.0 + 0.5).toLong)
    else 0L
  }

  /** Assignment AND silhouette in ONE k·dim sweep — `nearest` and
    * `silhouetteMicro` fused (identical math for each half), halving the
    * map-side flops of the cluster-quality scan. Returns (cell, s_micro). */
  def assignAndSilhouette(vec: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var nv2 = 0.0
    var i = 0
    while (i < n) { val v = vec.getDouble(i); nv2 += v * v; i += 1 }
    val nv = math.sqrt(nv2)
    var best = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < cids.length) {
      var d = 0.0
      var j = 0
      val m = math.min(dim, n)
      while (j < m) { d += vec.getDouble(j) * flat(c * dim + j); j += 1 }
      val sim = if (norms(c) > 0.0 && nv > 0.0) d / (nv * norms(c)) else 0.0
      if (sim > best) { second = best; best = sim; bestCid = cids(c) }
      else {
        if (sim == best && cids(c) < bestCid) bestCid = cids(c)
        if (sim > second) second = sim
      }
      c += 1
    }
    val s =
      if (cids.length < 2) 0L
      else {
        val a = 1.0 - best
        val b = 1.0 - second
        if (b > 0.0) math.min(1000000L, math.floor((b - a) / b * 1000000.0 + 0.5).toLong)
        else 0L
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, s))
  }
}

/**
 * Two-level nearest-centroid assignment: argmax cosine over `kc` coarse
 * cells, then exact argmax over only the fine centroids routed to that
 * coarse cell — O(kc + k/kc) dot products per row instead of O(k). This is
 * the FAISS-style trick that lets a quantizer's cluster count track the
 * corpus (k ∝ N, SemDeDup's constant-occupancy regime) without the flat
 * scan's quadratic N·k assignment term. Approximate near coarse-cell
 * boundaries; a pure per-row function, so deterministic under any
 * partitioning.
 */
class HierCentroidKernel(
    val coarseFlat: Array[Double], val kc: Int, val dim: Int,
    val fineCids: Array[Long], val fineFlat: Array[Double],
    val segStart: Array[Int], val segIdx: Array[Int],
    val probes: Int = 4) extends Serializable {

  private val coarseNorms: Array[Double] = Array.tabulate(kc) { c =>
    var acc = 0.0; var j = 0
    while (j < dim) { val v = coarseFlat(c * dim + j); acc += v * v; j += 1 }
    math.sqrt(acc)
  }
  private val fineNorms: Array[Double] = Array.tabulate(fineCids.length) { c =>
    var acc = 0.0; var j = 0
    while (j < dim) { val v = fineFlat(c * dim + j); acc += v * v; j += 1 }
    math.sqrt(acc)
  }

  def nearest(vec: ArrayData): Long = {
    val n = vec.numElements()
    val m = math.min(dim, n)
    var nv2 = 0.0
    var i = 0
    while (i < n) { val v = vec.getDouble(i); nv2 += v * v; i += 1 }
    val nv = math.sqrt(nv2)
    // level 1: multi-probe coarse routing — keep the top `probes` cells
    // (ties -> smaller coarse index), misses only when the true cell's
    // centroid ranks below all probed ones for this vector
    val p = math.min(probes, kc)
    val topIdx = new Array[Int](p)
    val topSim = Array.fill(p)(Double.NegativeInfinity)
    var c = 0
    while (c < kc) {
      var d = 0.0; var j = 0
      while (j < m) { d += vec.getDouble(j) * coarseFlat(c * dim + j); j += 1 }
      val sim = if (coarseNorms(c) > 0.0 && nv > 0.0) d / (nv * coarseNorms(c)) else 0.0
      // insertion into the tiny top-p list
      var slot = -1
      var t = p - 1
      while (t >= 0 && sim > topSim(t)) { slot = t; t -= 1 }
      if (slot >= 0) {
        var u = p - 1
        while (u > slot) { topSim(u) = topSim(u - 1); topIdx(u) = topIdx(u - 1); u -= 1 }
        topSim(slot) = sim; topIdx(slot) = c
      }
      c += 1
    }
    // level 2: exact argmax within the probed segments (ties -> smallest cid)
    var bestFine = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var pi = 0
    while (pi < p) {
      if (topSim(pi) > Double.NegativeInfinity) {
        var s = segStart(topIdx(pi))
        val e = segStart(topIdx(pi) + 1)
        while (s < e) {
          val f = segIdx(s)
          var d = 0.0; var j = 0
          while (j < m) { d += vec.getDouble(j) * fineFlat(f * dim + j); j += 1 }
          val sim = if (fineNorms(f) > 0.0 && nv > 0.0) d / (nv * fineNorms(f)) else 0.0
          if (sim > bestFine || (sim == bestFine && fineCids(f) < bestCid)) {
            bestFine = sim; bestCid = fineCids(f)
          }
          s += 1
        }
      }
      pi += 1
    }
    bestCid
  }
}

case class NearestCentroidHierExpr(child: Expression, kernel: HierCentroidKernel)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_hier"

  override def nullSafeEval(input: Any): Any =
    kernel.nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hierCentroidKernel", kernel, "graft.functions.HierCentroidKernel")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidHierExpr =
    copy(child = newChild)
}

/** Nearest-centroid cell id of a vector column against a fixed centroid set
  * (IVF coarse quantizer assignment). One kernel call per row inside
  * whole-stage codegen; the centroid matrix rides along as a codegen
  * reference object, NOT as 40x64 literal sub-expressions. */
case class NearestCentroidExpr(child: Expression, kernel: CentroidKernel) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    kernel.nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel, "graft.functions.CentroidKernel")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** Fused assignment + silhouette of a vector column against a fixed
  * centroid set: ONE k·dim sweep returning struct(cell, s_micro) — the
  * cluster-quality scan's per-row kernel (half the flops of running
  * NearestCentroidExpr and CentroidSilhouetteExpr separately). */
case class CentroidAssignSilhouetteExpr(child: Expression, kernel: CentroidKernel)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("s_micro", LongType, nullable = false)))
  override def prettyName: String = "centroid_assign_silhouette"

  override def nullSafeEval(input: Any): Any =
    kernel.assignAndSilhouette(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel, "graft.functions.CentroidKernel")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.assignAndSilhouette($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssignSilhouetteExpr =
    copy(child = newChild)
}

/** Micro-quantized simplified silhouette of a vector column against a fixed
  * centroid set — the cluster-quality gate's per-row kernel. Same reference-
  * object pattern as NearestCentroidExpr: one tight k·dim loop per row. */
case class CentroidSilhouetteExpr(child: Expression, kernel: CentroidKernel)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_silhouette"

  override def nullSafeEval(input: Any): Any =
    kernel.silhouetteMicro(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel, "graft.functions.CentroidKernel")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.silhouetteMicro($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSilhouetteExpr =
    copy(child = newChild)
}

/** Broadcastable hyperplane table for sign-bucket LSH. */
class PlaneKernel(val flat: Array[Double], val planes: Int, val dim: Int) extends Serializable {
  /** Sign-bit bucket: bit j set when dot(vec, plane_j) >= 0 (left-fold). */
  def bucket(vec: ArrayData): Long = {
    val m = math.min(dim, vec.numElements())
    var b = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var d = 0
      while (d < m) { acc += vec.getDouble(d) * flat(j * dim + d); d += 1 }
      if (acc >= 0.0) b |= (1L << j)
      j += 1
    }
    b
  }
}

/** Random-hyperplane LSH bucket of a vector column: all `planes` sign bits
  * in one kernel call per row (the per-plane HOF dots this replaces were
  * interpreted and generated code linear in planes x dim). */
case class HyperplaneBucketExpr(child: Expression, kernel: PlaneKernel) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    kernel.bucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeKernel", kernel, "graft.functions.PlaneKernel")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucket($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def vectorNorm(a: Column): Column =
    Bridge.column(VectorNorm(Bridge.expression(a)))

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def nearestCentroid(vec: Column, cents: Array[(Long, Array[Double])]): Column = {
    require(cents.nonEmpty, "empty centroid set")
    val dim = cents.head._2.length
    val kernel = new CentroidKernel(cents.map(_._1), cents.flatMap(_._2), dim)
    Bridge.column(NearestCentroidExpr(Bridge.expression(vec), kernel))
  }

  /** Micro-quantized simplified silhouette against a fixed centroid set. */
  def centroidSilhouette(vec: Column, cents: Array[(Long, Array[Double])]): Column = {
    require(cents.nonEmpty, "empty centroid set")
    val dim = cents.head._2.length
    val kernel = new CentroidKernel(cents.map(_._1), cents.flatMap(_._2), dim)
    Bridge.column(CentroidSilhouetteExpr(Bridge.expression(vec), kernel))
  }

  /** Fused (cell, s_micro) struct — one sweep for the silhouette scan. */
  def centroidAssignSilhouette(vec: Column, cents: Array[(Long, Array[Double])]): Column = {
    require(cents.nonEmpty, "empty centroid set")
    val dim = cents.head._2.length
    val kernel = new CentroidKernel(cents.map(_._1), cents.flatMap(_._2), dim)
    Bridge.column(CentroidAssignSilhouetteExpr(Bridge.expression(vec), kernel))
  }

  /** Sign-bucket of `vec` against a plane matrix (row-major planes x dim). */
  def hyperplaneBucket(vec: Column, flat: Array[Double], planes: Int, dim: Int): Column =
    Bridge.column(HyperplaneBucketExpr(Bridge.expression(vec), new PlaneKernel(flat, planes, dim)))

  /** Two-level (coarse -> fine-segment) nearest-centroid assignment. */
  def nearestCentroidHier(vec: Column, kernel: HierCentroidKernel): Column =
    Bridge.column(NearestCentroidHierExpr(Bridge.expression(vec), kernel))
}
