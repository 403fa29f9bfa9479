package graft.smoother

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.filter.{KalmanIn, LinearKalmanCompute, LinearKalmanFilter}
import graft.linalg.{DMat, Dense}
import graft.state.{KeyedIn, StateSpec, StatefulStage}

/** Forward-pass record: filtered + predicted moments and the process model,
  * everything the RTS backward recursion needs. */
case class FiltRecord(
    stateKey: String,
    stateIndex: Long,
    eventTime: Option[Timestamp],
    filtMean: Array[Double],
    filtCov: Array[Double],
    predMean: Array[Double],
    predCov: Array[Double],
    processModel: DMat) extends KeyedIn

case class SmoothedOut(
    stateKey: String,
    stateIndex: Long,
    eventTime: Option[Timestamp],
    stateMean: Array[Double],
    stateCovariance: DMat)

/** Fixed-lag output: one row per (measurement, window position). */
case class RtsLagOut(
    stateKey: String,
    stateIndex: Long,
    stepIndex: Long,
    eventTime: Option[Timestamp],
    stateMean: Array[Double],
    stateCovariance: DMat)

/**
 * Fixed-lag RTS: keeps the last `lag` forward-pass records per key and
 * replays the backward recursion over the window on every step (streaming-
 * friendly: state is bounded at lag x stateSize², mirroring the reference's
 * design, /root/reference/src/main/scala/com/github/ozancicek/artan/ml/smoother/LinearKalmanSmoother.scala:96).
 * Emits `lag` smoothed estimates per measurement once the window fills.
 */
private[smoother] class FixedLagSpec(lag: Int, s: Int)
  extends StateSpec[FiltRecord, List[FiltRecord], RtsLagOut] {

  def update(key: String, row: FiltRecord, state: Option[List[FiltRecord]]): Option[List[FiltRecord]] = {
    val cur = state.getOrElse(Nil)
    Some((row :: cur).take(lag)) // newest first
  }

  def output(key: String, row: FiltRecord, state: List[FiltRecord]): List[RtsLagOut] = {
    if (state.size < lag) Nil
    else {
      // newest first: smoothed(newest) = filtered; then fold backwards
      val newest = state.head
      var sm = newest.filtMean
      var sc = newest.filtCov
      var newer = newest
      var outs = List(RtsLagOut(key, newest.stateIndex, (lag - 1).toLong, newest.eventTime,
        sm, DMat(s, s, sc)))
      var rest = state.tail
      var step = lag - 2
      while (rest.nonEmpty) {
        val r = rest.head
        val ft = Dense.matmulNT(r.filtCov, newer.processModel.values, s, s, s)
        val pInv = Dense.inverse(newer.predCov.clone(), s)
        val g = Dense.matmul(ft, pInv, s, s, s)
        val dm = Dense.sub(sm, newer.predMean)
        val m = r.filtMean.clone()
        Dense.axpy(1.0, Dense.matvec(g, dm, s, s), m)
        val dc = Dense.sub(sc, newer.predCov)
        val gdc = Dense.matmul(g, dc, s, s, s)
        val gdcgt = Dense.matmulNT(gdc, g, s, s, s)
        val c = Dense.symmetrize(Dense.add(r.filtCov, gdcgt), s)
        outs = RtsLagOut(key, r.stateIndex, step.toLong, r.eventTime, m, DMat(s, s, c)) :: outs
        sm = m; sc = c; newer = r
        rest = rest.tail
        step -= 1
      }
      outs
    }
  }
}

private[smoother] case class FwdState(
    stateIndex: Long, mean: Array[Double], cov: Array[Double]) extends Serializable

/** LKF forward pass that keeps the predicted moments alongside the filtered
  * ones (the plain filter discards them). */
private[smoother] class ForwardSpec(compute: LinearKalmanCompute, defaults: graft.filter.KalmanDefaults)
  extends StateSpec[KalmanIn, (FwdState, FiltRecord), FiltRecord] {

  private def resolve(r: KalmanIn): KalmanIn = r.copy(
    measurementModel = if (r.measurementModel.isDefined) r.measurementModel else Some(defaults.measurementModel),
    measurementNoise = if (r.measurementNoise.isDefined) r.measurementNoise else Some(defaults.measurementNoise),
    processModel = if (r.processModel.isDefined) r.processModel else Some(defaults.processModel),
    processNoise = if (r.processNoise.isDefined) r.processNoise else Some(defaults.processNoise))

  def update(key: String, rawRow: KalmanIn, state: Option[(FwdState, FiltRecord)]): Option[(FwdState, FiltRecord)] = {
    val row = resolve(rawRow)
    val cur = state.map(_._1).getOrElse(FwdState(0L,
      rawRow.initialMean.getOrElse(defaults.initialMean),
      rawRow.initialCovariance.map(_.values).getOrElse(defaults.initialCovariance.values)))
    val (pm, pc) = compute.predict(cur.mean, cur.cov, row)
    val (em, ec) = row.measurement match {
      case Some(_) =>
        val (a, b, _, _) = compute.estimate(pm, pc, row)
        (a, b)
      case None => (pm, pc)
    }
    val rec = FiltRecord(key, cur.stateIndex + 1, row.eventTime, em, ec, pm, pc, row.processModel.get)
    Some((FwdState(cur.stateIndex + 1, em, ec), rec))
  }

  def output(key: String, row: KalmanIn, s: (FwdState, FiltRecord)): List[FiltRecord] = List(s._2)
}

/**
 * Rauch-Tung-Striebel smoother over a linear Kalman forward pass:
 *
 *   G_k   = P_k^f F_{k+1}^T (P_{k+1}^pred)^-1
 *   m_k^s = m_k^f + G_k (m_{k+1}^s - m_{k+1}^pred)
 *   P_k^s = P_k^f + G_k (P_{k+1}^s - P_{k+1}^pred) G_k^T
 *
 * Physical plan: forward pass = one shuffle on stateKey + in-order scan;
 * backward pass = second sort of the SAME partitioning in descending
 * stateIndex + linear scan. No per-key materialization of history beyond
 * Spark's external sort, so billion-row keys smooth without OOM.
 *
 * Capability parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/smoother/LinearKalmanSmoother.scala:1.
 */
class LinearKalmanSmoother(stateSize: Int, measurementSize: Int)
    extends LinearKalmanFilter(stateSize, measurementSize) {

  private var fixedLag: Option[Int] = None

  /** Switch to fixed-lag smoothing (bounded state; streaming-capable). */
  def setFixedLag(v: Int): this.type = { require(v > 1); fixedLag = Some(v); this }

  /** Fixed-lag smoothing: forward filter chained into a bounded-window
    * backward replay; both stages run on the shared stateful engine, so the
    * same code serves batch and streaming. */
  def smoothFixedLag(df: DataFrame, lag: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fwdSpec = new ForwardSpec(new LinearKalmanCompute(stateSize, measurementSize, 1.0), defaults)
    val fwd: Dataset[FiltRecord] =
      graft.state.StatefulStage.run(toKalmanInput(df), fwdSpec)
    val lagged = graft.state.StatefulStage.run(fwd, new FixedLagSpec(lag, stateSize))
    var out = lagged.toDF()
    stateKeyCol.foreach(c => out = out.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => out = out.withColumnRenamed("eventTime", c)
      case None => out = out.drop("eventTime")
    }
    out
  }

  /** Full-pass RTS at InternalRow level: forward kernel (one exchange on
    * stateKey + sort), then the backward kernel over a LOCAL re-sort of the
    * same partitions — the forward output is already key-partitioned
    * physically, so the second exchange of the encoder path is gone
    * (2 Exchange → 1). Bit-exact vs [[smoothEncoderBatch]]
    * (KalmanKernelPinSpec). */
  def smooth(df: DataFrame): DataFrame = {
    val compute = new LinearKalmanCompute(stateSize, measurementSize, 1.0)
    val fwdKernel = new RtsForwardRowKernel(compute, defaults,
      hasMM = measurementModelCol.isDefined,
      hasMN = measurementNoiseCol.isDefined,
      hasPM = processModelCol.isDefined,
      hasPN = processNoiseCol.isDefined,
      hasCtl = controlCol.isDefined,
      hasCtlFn = controlFunctionCol.isDefined,
      hasIM = initialStateDistributionCol.isDefined || initialStateMeanCol.isDefined,
      hasIC = initialStateDistributionCol.isDefined || initialStateCovarianceCol.isDefined)
    val fwdDF = StatefulStage.batchRows(kalmanProjection(df),
      RtsForwardRowKernel.outputSchema, assumeUnique = assumeUniqueEventTimes)(fwdKernel.run)
    val bwdKernel = new RtsBackwardRowKernel(stateSize)
    val smoothed = StatefulStage.mapSortedPartitions(fwdDF,
      Seq(col("stateKey"), col("stateIndex").desc),
      RtsBackwardRowKernel.outputSchema)(bwdKernel.run)
    var out = smoothed
    stateKeyCol.foreach(c => out = out.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => out = out.withColumnRenamed("eventTime", c)
      case None => out = out.drop("eventTime")
    }
    out
  }

  /** Encoder-path RTS kept as the pin-spec reference (pre-kernel plan:
    * two exchanges, Dataset-encoder boundary on both passes). */
  private[graft] def smoothEncoderBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fwdSpec = new ForwardSpec(new LinearKalmanCompute(stateSize, measurementSize, 1.0), defaults)
    val fwd: Dataset[FiltRecord] = StatefulStage.batch(toKalmanInput(df), fwdSpec)
    val s = stateSize

    val smoothed = fwd
      .repartition(col("stateKey"))
      .sortWithinPartitions(col("stateKey"), col("stateIndex").desc)
      .mapPartitions { rows =>
        var curKey: String = null
        var nextSm: Array[Double] = null // smoothed mean of k+1
        var nextSmCov: Array[Double] = null
        var nextRec: FiltRecord = null // record of k+1 (pred moments + F)
        rows.map { r =>
          val (sm, sc) =
            if (r.stateKey != curKey || nextRec == null) (r.filtMean, r.filtCov)
            else {
              // G = P_f F^T inv(P_pred_next)
              val ft = Dense.matmulNT(r.filtCov, nextRec.processModel.values, s, s, s)
              val pInv = Dense.inverse(nextRec.predCov.clone(), s)
              val g = Dense.matmul(ft, pInv, s, s, s)
              val dm = Dense.sub(nextSm, nextRec.predMean)
              val m = r.filtMean.clone()
              Dense.axpy(1.0, Dense.matvec(g, dm, s, s), m)
              val dc = Dense.sub(nextSmCov, nextRec.predCov)
              val gdc = Dense.matmul(g, dc, s, s, s)
              val gdcgt = Dense.matmulNT(gdc, g, s, s, s)
              val c = Dense.add(r.filtCov, gdcgt)
              (m, Dense.symmetrize(c, s))
            }
          curKey = r.stateKey
          nextSm = sm; nextSmCov = sc; nextRec = r
          SmoothedOut(r.stateKey, r.stateIndex, r.eventTime, sm, DMat(s, s, sc))
        }
      }

    var out = smoothed.toDF()
    stateKeyCol.foreach(c => out = out.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => out = out.withColumnRenamed("eventTime", c)
      case None => out = out.drop("eventTime")
    }
    out
  }

  /** Smoothing replaces filtering as this transformer's output: full-pass
    * RTS by default (batch), fixed-lag when setFixedLag was called. */
  override def transform(df: DataFrame): DataFrame = fixedLag match {
    case Some(lag) => smoothFixedLag(df, lag)
    case None => smooth(df)
  }
}
