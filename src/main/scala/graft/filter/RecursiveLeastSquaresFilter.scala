package graft.filter

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.linalg.{DMat, Dense}
import graft.state.{KeyedIn, StateSpec, StatefulStage, StageConf, TimeoutMode, NoTimeout, ProcessTimeout, EventTimeout}

case class RlsIn(
    stateKey: String,
    eventTime: Option[Timestamp],
    label: Double,
    features: Array[Double],
    initialMean: Array[Double],
    initialCovariance: DMat) extends KeyedIn

case class RlsState(stateIndex: Long, mean: Array[Double], cov: Array[Double]) extends Serializable

case class RlsOut(
    stateKey: String,
    stateIndex: Long,
    eventTime: Option[Timestamp],
    stateMean: Array[Double],
    stateCovariance: DMat)

/**
 * Recursive Least Squares: online regularized least-squares regression per
 * key. With forgettingFactor λ and regularization P0, the recursion is the
 * exact sequential solution of
 *   argmin_θ Σ λ^(n-i) (y_i - x_iᵀθ)² + λ^n θᵀP0⁻¹θ
 * so with λ=1 the final state equals the closed-form regularized LS posterior
 * — which is how the DuckDB oracle verifies the whole sequential path.
 *
 * Capability parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/RecursiveLeastSquaresFilter.scala:211.
 */
class RecursiveLeastSquaresFilter(val featuresSize: Int) {

  private var stateKeyCol: Option[String] = None
  private var eventTimeCol: Option[String] = None
  private var labelCol: String = "label"
  private var featuresCol: String = "features"
  private var forgettingFactor: Double = 1.0
  private var initialEstimate: Array[Double] = new Array[Double](featuresSize)
  private var initialEstimateCol: Option[String] = None
  private var regularizationMatrix: DMat = DMat(featuresSize, featuresSize,
    Dense.scale(1e5, Dense.eye(featuresSize)))
  private var regularizationMatrixCol: Option[String] = None
  private var initialStateDistributionCol: Option[String] = None
  private var watermarkDuration: Option[String] = None
  private var timeoutMode: TimeoutMode = NoTimeout
  private var timeoutDuration: Option[String] = None

  def setStateKeyCol(v: String): this.type = { stateKeyCol = Some(v); this }
  /** Single struct column `(mean: array<double>, covariance: matrix struct)`
    * carrying the per-key prior — e.g. a previously filtered posterior
    * (stream-batch init; reference RLS initialStateDistributionCol).
    * Overrides initialEstimateCol / regularizationMatrixCol when set. */
  def setInitialStateDistributionCol(v: String): this.type = {
    initialStateDistributionCol = Some(v); this
  }
  def setEventTimeCol(v: String): this.type = { eventTimeCol = Some(v); this }
  def setLabelCol(v: String): this.type = { labelCol = v; this }
  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  def setForgettingFactor(v: Double): this.type = { forgettingFactor = v; this }
  def setInitialEstimate(v: Array[Double]): this.type = { initialEstimate = v; this }
  def setInitialEstimateCol(v: String): this.type = { initialEstimateCol = Some(v); this }
  def setRegularizationMatrix(v: DMat): this.type = { regularizationMatrix = v; this }
  def setRegularizationMatrixFactor(v: Double): this.type = {
    regularizationMatrix = DMat(featuresSize, featuresSize, Dense.scale(v, Dense.eye(featuresSize))); this
  }
  def setRegularizationMatrixCol(v: String): this.type = { regularizationMatrixCol = Some(v); this }
  def setWatermarkDuration(v: String): this.type = { watermarkDuration = Some(v); this }
  def setStateTimeoutMode(v: String): this.type = {
    timeoutMode = v match {
      case "none" => NoTimeout
      case "process" => ProcessTimeout
      case "event" => EventTimeout
      case other => throw new IllegalArgumentException(s"unsupported timeout mode $other")
    }
    this
  }
  def setStateTimeoutDuration(v: String): this.type = { timeoutDuration = Some(v); this }
  /** Caller-declared invariant: (stateKey, eventTime) unique in the input —
    * the batch path then skips its tiebreak-hash sort column (see
    * StageConf.assumeUniqueKeyTime). */
  def setAssumeUniqueEventTimes(): this.type = { assumeUniqueEventTimes = true; this }
  private var assumeUniqueEventTimes: Boolean = false

  private val matStructType = "struct<numRows:int,numCols:int,values:array<double>>"

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr = stateKeyCol.map(c => col(c).cast("string")).getOrElse(lit("rls.default"))
    val timeExpr = eventTimeCol.map(c => col(c).cast("timestamp")).getOrElse(lit(null).cast("timestamp"))
    val out = if (df.isStreaming) {
      val in = df.select(
        keyExpr.as("stateKey"),
        timeExpr.as("eventTime"),
        col(labelCol).cast("double").as("label"),
        col(featuresCol).cast("array<double>").as("features"),
        initialStateDistributionCol.map(c => col(c).getField("mean").cast("array<double>"))
          .orElse(initialEstimateCol.map(c => col(c).cast("array<double>")))
          .getOrElse(typedLit(initialEstimate)).as("initialMean"),
        initialStateDistributionCol.map(c => col(c).getField("covariance"))
          .orElse(regularizationMatrixCol.map(col))
          .getOrElse(typedLit(regularizationMatrix)).as("initialCovariance")
      ).as[RlsIn]
      StatefulStage.run(in, new RlsSpec(forgettingFactor, featuresSize),
        StageConf(timeoutMode, timeoutDuration, watermarkDuration)).toDF()
    } else {
      // InternalRow kernel: constant init/regularization live in the kernel
      // closure, NOT as typedLit columns shuffled with every row (the
      // encoder path ships ~(n + n²) doubles of constants per row).
      val imExpr = initialStateDistributionCol.map(c => col(c).getField("mean").cast("array<double>"))
        .orElse(initialEstimateCol.map(c => col(c).cast("array<double>")))
      val icExpr = initialStateDistributionCol.map(c => col(c).getField("covariance").cast(matStructType))
        .orElse(regularizationMatrixCol.map(c => col(c).cast(matStructType)))
      val cols = scala.collection.mutable.ArrayBuffer(
        keyExpr.as("stateKey"),
        timeExpr.as("eventTime"),
        col(labelCol).cast("double").as("label"),
        col(featuresCol).cast("array<double>").as("features"))
      if (imExpr.isDefined || icExpr.isDefined)
        cols += imExpr.getOrElse(lit(null).cast("array<double>")).as("initialMean")
      icExpr.foreach(e => cols += e.as("initialCovariance"))
      val kernel = new RlsRowKernel(forgettingFactor, featuresSize,
        initialEstimate, regularizationMatrix,
        hasIM = imExpr.isDefined, hasIC = icExpr.isDefined)
      StatefulStage.batchRows(df.select(cols.toSeq: _*), RlsRowKernel.outputSchema,
        assumeUnique = assumeUniqueEventTimes)(kernel.run)
    }
    var res = out
    stateKeyCol.foreach(c => res = res.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => res = res.withColumnRenamed("eventTime", c)
      case None => res = res.drop("eventTime")
    }
    res
  }

  /** Encoder-path batch execution kept as the pin-spec reference. */
  private[graft] def transformEncoderBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr = stateKeyCol.map(c => col(c).cast("string")).getOrElse(lit("rls.default"))
    val timeExpr = eventTimeCol.map(c => col(c).cast("timestamp")).getOrElse(lit(null).cast("timestamp"))
    val in = df.select(
      keyExpr.as("stateKey"),
      timeExpr.as("eventTime"),
      col(labelCol).cast("double").as("label"),
      col(featuresCol).cast("array<double>").as("features"),
      initialStateDistributionCol.map(c => col(c).getField("mean").cast("array<double>"))
        .orElse(initialEstimateCol.map(c => col(c).cast("array<double>")))
        .getOrElse(typedLit(initialEstimate)).as("initialMean"),
      initialStateDistributionCol.map(c => col(c).getField("covariance"))
        .orElse(regularizationMatrixCol.map(col))
        .getOrElse(typedLit(regularizationMatrix)).as("initialCovariance")
    ).as[RlsIn]
    var res = StatefulStage.batch(in, new RlsSpec(forgettingFactor, featuresSize),
      StageConf(timeoutMode, timeoutDuration, watermarkDuration)).toDF()
    stateKeyCol.foreach(c => res = res.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => res = res.withColumnRenamed("eventTime", c)
      case None => res = res.drop("eventTime")
    }
    res
  }
}

private[filter] class RlsSpec(lambda: Double, n: Int) extends StateSpec[RlsIn, RlsState, RlsOut] {
    def update(key: String, row: RlsIn, state: Option[RlsState]): Option[RlsState] = {
      val cur = state.getOrElse(RlsState(0L, row.initialMean, row.initialCovariance.values))
      val x = row.features
      // k = P x / (λ + xᵀ P x)
      val px = Dense.matvec(cur.cov, x, n, n)
      val denom = lambda + Dense.dot(x, px)
      val k = Dense.scale(1.0 / denom, px)
      // θ += k (y - xᵀθ)
      val resid = row.label - Dense.dot(x, cur.mean)
      val mean = cur.mean.clone()
      Dense.axpy(resid, k, mean)
      // P = (P - k xᵀ P) / λ
      val xtP = Dense.matvec(Dense.transpose(cur.cov, n, n), x, n, n)
      val cov = cur.cov.clone()
      Dense.axpy(-1.0, Dense.outer(1.0, k, xtP), cov)
      val covScaled = Dense.scale(1.0 / lambda, cov)
      // keep P bitwise-symmetric (mirror upper triangle): P' is symmetric in
      // exact arithmetic; mirroring keeps the recursion identical to the
      // symmetric-state oracle replay
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { covScaled(j * n + i) = covScaled(i * n + j); j += 1 }
        i += 1
      }
      Some(RlsState(cur.stateIndex + 1, mean, covScaled))
    }

    def output(key: String, row: RlsIn, s: RlsState): List[RlsOut] =
      List(RlsOut(key, s.stateIndex, row.eventTime, s.mean, DMat(n, n, s.cov)))
}

case class LmsIn(
    stateKey: String,
    eventTime: Option[Timestamp],
    label: Double,
    features: Array[Double],
    initialMean: Array[Double]) extends KeyedIn

case class LmsState(stateIndex: Long, mean: Array[Double]) extends Serializable

case class LmsOut(
    stateKey: String,
    stateIndex: Long,
    eventTime: Option[Timestamp],
    stateMean: Array[Double])

/**
 * Normalized Least Mean Squares filter:
 *   w_k = w_{k-1} + μ x (y - xᵀw_{k-1}) / (ε + xᵀx)
 *
 * Capability parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/LeastMeanSquaresFilter.scala:156.
 */
class LeastMeanSquaresFilter(val featuresSize: Int) {

  private var stateKeyCol: Option[String] = None
  private var eventTimeCol: Option[String] = None
  private var labelCol: String = "label"
  private var featuresCol: String = "features"
  private var learningRate: Double = 1.0
  private var regularization: Double = 1.0
  private var initialEstimate: Array[Double] = new Array[Double](featuresSize)
  private var initialEstimateCol: Option[String] = None
  private var watermarkDuration: Option[String] = None
  private var timeoutMode: TimeoutMode = NoTimeout
  private var timeoutDuration: Option[String] = None

  def setStateKeyCol(v: String): this.type = { stateKeyCol = Some(v); this }
  def setEventTimeCol(v: String): this.type = { eventTimeCol = Some(v); this }
  def setLabelCol(v: String): this.type = { labelCol = v; this }
  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  def setLearningRate(v: Double): this.type = { learningRate = v; this }
  def setRegularization(v: Double): this.type = { regularization = v; this }
  def setInitialEstimate(v: Array[Double]): this.type = { initialEstimate = v; this }
  def setInitialEstimateCol(v: String): this.type = { initialEstimateCol = Some(v); this }
  def setWatermarkDuration(v: String): this.type = { watermarkDuration = Some(v); this }
  def setStateTimeoutMode(v: String): this.type = {
    timeoutMode = v match {
      case "none" => NoTimeout
      case "process" => ProcessTimeout
      case "event" => EventTimeout
      case other => throw new IllegalArgumentException(s"unsupported timeout mode $other")
    }
    this
  }
  def setStateTimeoutDuration(v: String): this.type = { timeoutDuration = Some(v); this }
  /** See RecursiveLeastSquaresFilter.setAssumeUniqueEventTimes. */
  def setAssumeUniqueEventTimes(): this.type = { assumeUniqueEventTimes = true; this }
  private var assumeUniqueEventTimes: Boolean = false

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr = stateKeyCol.map(c => col(c).cast("string")).getOrElse(lit("lms.default"))
    val timeExpr = eventTimeCol.map(c => col(c).cast("timestamp")).getOrElse(lit(null).cast("timestamp"))
    val out = if (df.isStreaming) {
      val in = df.select(
        keyExpr.as("stateKey"),
        timeExpr.as("eventTime"),
        col(labelCol).cast("double").as("label"),
        col(featuresCol).cast("array<double>").as("features"),
        initialEstimateCol.map(c => col(c).cast("array<double>")).getOrElse(typedLit(initialEstimate)).as("initialMean")
      ).as[LmsIn]
      StatefulStage.run(in, new LmsSpec(learningRate, regularization),
        StageConf(timeoutMode, timeoutDuration, watermarkDuration)).toDF()
    } else {
      val cols = scala.collection.mutable.ArrayBuffer(
        keyExpr.as("stateKey"),
        timeExpr.as("eventTime"),
        col(labelCol).cast("double").as("label"),
        col(featuresCol).cast("array<double>").as("features"))
      initialEstimateCol.foreach(c => cols += col(c).cast("array<double>").as("initialMean"))
      val kernel = new LmsRowKernel(learningRate, regularization,
        initialEstimate, hasIM = initialEstimateCol.isDefined)
      StatefulStage.batchRows(df.select(cols.toSeq: _*), LmsRowKernel.outputSchema,
        assumeUnique = assumeUniqueEventTimes)(kernel.run)
    }
    var res = out
    stateKeyCol.foreach(c => res = res.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => res = res.withColumnRenamed("eventTime", c)
      case None => res = res.drop("eventTime")
    }
    res
  }

  /** Encoder-path batch execution kept as the pin-spec reference. */
  private[graft] def transformEncoderBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr = stateKeyCol.map(c => col(c).cast("string")).getOrElse(lit("lms.default"))
    val timeExpr = eventTimeCol.map(c => col(c).cast("timestamp")).getOrElse(lit(null).cast("timestamp"))
    val in = df.select(
      keyExpr.as("stateKey"),
      timeExpr.as("eventTime"),
      col(labelCol).cast("double").as("label"),
      col(featuresCol).cast("array<double>").as("features"),
      initialEstimateCol.map(c => col(c).cast("array<double>")).getOrElse(typedLit(initialEstimate)).as("initialMean")
    ).as[LmsIn]
    var res = StatefulStage.batch(in, new LmsSpec(learningRate, regularization),
      StageConf(timeoutMode, timeoutDuration, watermarkDuration)).toDF()
    stateKeyCol.foreach(c => res = res.withColumnRenamed("stateKey", c))
    eventTimeCol match {
      case Some(c) => res = res.withColumnRenamed("eventTime", c)
      case None => res = res.drop("eventTime")
    }
    res
  }
}

private[filter] class LmsSpec(mu: Double, eps: Double) extends StateSpec[LmsIn, LmsState, LmsOut] {
  def update(key: String, row: LmsIn, state: Option[LmsState]): Option[LmsState] = {
    val cur = state.getOrElse(LmsState(0L, row.initialMean))
    val x = row.features
    val gain = mu / (eps + Dense.dot(x, x))
    val resid = row.label - Dense.dot(x, cur.mean)
    val mean = cur.mean.clone()
    Dense.axpy(gain * resid, x, mean)
    Some(LmsState(cur.stateIndex + 1, mean))
  }
  def output(key: String, row: LmsIn, s: LmsState): List[LmsOut] =
    List(LmsOut(key, s.stateIndex, row.eventTime, s.mean))
}
