package graft.smoother

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.filter.{KalmanDefaults, KalmanIn, LinearKalmanCompute}
import graft.linalg.{DMat, Dense}

/**
 * InternalRow-level RTS passes (same pattern as
 * [[graft.filter.KalmanRowKernel]]): the forward kernel replicates
 * ForwardSpec's op order over the canonical 11-column Kalman projection and
 * emits FiltRecord rows; the backward kernel replicates the smoothing
 * recursion of LinearKalmanSmoother.smooth's mapPartitions over
 * (stateKey asc, stateIndex desc)-sorted FiltRecord rows. Bit-exactness vs
 * the encoder path is pinned by KalmanKernelPinSpec.
 */
final class RtsForwardRowKernel(
    compute: LinearKalmanCompute,
    defaults: KalmanDefaults,
    hasMM: Boolean, hasMN: Boolean, hasPM: Boolean, hasPN: Boolean,
    hasCtl: Boolean, hasCtlFn: Boolean, hasIM: Boolean, hasIC: Boolean)
  extends Serializable {

  private val s = compute.stateSize
  private val defMM = Some(defaults.measurementModel)
  private val defMN = Some(defaults.measurementNoise)
  private val defPM = Some(defaults.processModel)
  private val defPN = Some(defaults.processNoise)

  private def readMat(row: InternalRow, i: Int): DMat = {
    val st = row.getStruct(i, 3)
    DMat(st.getInt(0), st.getInt(1), st.getArray(2).toDoubleArray)
  }

  def run(rows: Iterator[InternalRow]): Iterator[InternalRow] = new Iterator[InternalRow] {
    private var haveKey = false
    private var curKey: UTF8String = null
    private var stateIndex = 0L
    private var mean: Array[Double] = null
    private var cov: Array[Double] = null

    def hasNext: Boolean = rows.hasNext

    def next(): InternalRow = {
      val row = rows.next()
      val keyView = if (row.isNullAt(0)) null else row.getUTF8String(0)
      val sameKey = haveKey &&
        (if (curKey == null) keyView == null else keyView != null && curKey.equals(keyView))
      if (!sameKey) {
        curKey = if (keyView == null) null else keyView.copy()
        haveKey = true
        stateIndex = 0L
        mean = if (hasIM && !row.isNullAt(9)) row.getArray(9).toDoubleArray
               else defaults.initialMean
        cov = if (hasIC && !row.isNullAt(10)) readMat(row, 10).values
              else defaults.initialCovariance.values
      }
      val measNull = row.isNullAt(2)
      val measOpt: Option[Array[Double]] =
        if (measNull) None else Some(row.getArray(2).toDoubleArray)
      val mmOpt = if (hasMM && !row.isNullAt(3)) Some(readMat(row, 3)) else defMM
      val mnOpt = if (hasMN && !row.isNullAt(4)) Some(readMat(row, 4)) else defMN
      val pmOpt = if (hasPM && !row.isNullAt(5)) Some(readMat(row, 5)) else defPM
      val pnOpt = if (hasPN && !row.isNullAt(6)) Some(readMat(row, 6)) else defPN
      val ctlOpt: Option[Array[Double]] =
        if (hasCtl && !row.isNullAt(7)) Some(row.getArray(7).toDoubleArray) else None
      val ctlFnOpt = if (hasCtlFn && !row.isNullAt(8)) Some(readMat(row, 8)) else None
      val in = KalmanIn(null, None, measOpt, mmOpt, mnOpt, pmOpt, pnOpt,
        ctlOpt, ctlFnOpt, None, None)
      // ---- ForwardSpec.update, verbatim op order ----
      val (pm0, pc0) = compute.predict(mean, cov, in)
      var em = pm0
      var ec = pc0
      if (!measNull) {
        val (a, b, _, _) = compute.estimate(pm0, pc0, in)
        em = a; ec = b
      }
      stateIndex += 1
      mean = em; cov = ec
      val pmMat = pmOpt.get
      new GenericInternalRow(Array[Any](
        curKey, stateIndex,
        if (row.isNullAt(1)) null else Long.box(row.getLong(1)),
        UnsafeArrayData.fromPrimitiveArray(em),
        UnsafeArrayData.fromPrimitiveArray(ec),
        UnsafeArrayData.fromPrimitiveArray(pm0),
        UnsafeArrayData.fromPrimitiveArray(pc0),
        new GenericInternalRow(Array[Any](pmMat.numRows, pmMat.numCols,
          UnsafeArrayData.fromPrimitiveArray(pmMat.values)))))
    }
  }
}

object RtsForwardRowKernel {
  val outputSchema: StructType = Encoders.product[FiltRecord].schema
}

/** Backward recursion over FiltRecord rows sorted (stateKey, stateIndex desc)
  * within the forward pass's partitions (no second exchange). */
final class RtsBackwardRowKernel(s: Int) extends Serializable {

  def run(rows: Iterator[InternalRow]): Iterator[InternalRow] = new Iterator[InternalRow] {
    private var haveKey = false
    private var curKey: UTF8String = null
    private var sm: Array[Double] = null      // smoothed mean of k+1
    private var sc: Array[Double] = null      // smoothed cov of k+1
    private var nextPredMean: Array[Double] = null
    private var nextPredCov: Array[Double] = null
    private var nextPMvals: Array[Double] = null

    def hasNext: Boolean = rows.hasNext

    def next(): InternalRow = {
      val row = rows.next()
      val keyView = if (row.isNullAt(0)) null else row.getUTF8String(0)
      val sameKey = haveKey &&
        (if (curKey == null) keyView == null else keyView != null && curKey.equals(keyView))
      val filtMean = row.getArray(3).toDoubleArray
      val filtCov = row.getArray(4).toDoubleArray
      if (!sameKey) {
        curKey = if (keyView == null) null else keyView.copy()
        haveKey = true
        sm = filtMean; sc = filtCov
      } else {
        // ---- smooth()'s backward step, verbatim op order ----
        val ft = Dense.matmulNT(filtCov, nextPMvals, s, s, s)
        val pInv = Dense.inverse(nextPredCov.clone(), s)
        val g = Dense.matmul(ft, pInv, s, s, s)
        val dm = Dense.sub(sm, nextPredMean)
        val m2 = filtMean.clone()
        Dense.axpy(1.0, Dense.matvec(g, dm, s, s), m2)
        val dc = Dense.sub(sc, nextPredCov)
        val gdc = Dense.matmul(g, dc, s, s, s)
        val gdcgt = Dense.matmulNT(gdc, g, s, s, s)
        val c = Dense.add(filtCov, gdcgt)
        sm = m2; sc = Dense.symmetrize(c, s)
      }
      nextPredMean = row.getArray(5).toDoubleArray
      nextPredCov = row.getArray(6).toDoubleArray
      nextPMvals = row.getStruct(7, 3).getArray(2).toDoubleArray
      new GenericInternalRow(Array[Any](
        curKey, row.getLong(1),
        if (row.isNullAt(2)) null else Long.box(row.getLong(2)),
        UnsafeArrayData.fromPrimitiveArray(sm),
        new GenericInternalRow(Array[Any](s, s, UnsafeArrayData.fromPrimitiveArray(sc)))))
    }
  }
}

object RtsBackwardRowKernel {
  val outputSchema: StructType = Encoders.product[SmoothedOut].schema
}
