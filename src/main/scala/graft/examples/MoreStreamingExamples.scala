package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.{ExtendedKalmanFilter, LinearKalmanFilter, UnscentedKalmanFilter}
import graft.linalg.DMat
import graft.mixture.MultivariateGaussianMixture

/**
 * Remaining runnable streaming demos for capability parity with the
 * reference's examples/streaming set (EKFRateSourceGLMLog, UKFRateSourceGLMLog,
 * GMMRateSource, MMAERateSourceOLS, LKFStreamBatchInit —
 * /root/reference/examples/src/main/scala/com/github/ozancicek/artan/examples/streaming/).
 * All are bounded by `--seconds` (first arg, default 15) so they terminate in CI.
 */
private[examples] object ExampleSession {
  def build(name: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName(name).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def run(df: DataFrame, seconds: Int): Unit = {
    val q = df.writeStream.format("console").outputMode("append")
      .option("truncate", "false").option("numRows", "8")
      .start()
    q.awaitTermination(seconds * 1000L)
    q.stop()
  }
}

/**
 * EKF estimating a GLM with log link online: y = exp(a*x + b) + N(0, 1),
 * recovering (a, b) per model. The regressor rides in through the per-row
 * measurement model matrix [x, 1].
 */
object EKFRateSourceGLMLog {
  val (a, b) = (0.2, 0.7)

  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("EKFRateSourceGLMLog")

    val measurements = spark.readStream.format("rate").option("rowsPerSecond", "20").load()
      .withColumn("modelID", pmod(col("value"), lit(2)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("x", (col("value") / 2).cast("long").cast("double") % 10)
      .withColumn("meas", array(exp(col("x") * a + b) + randn(11)))
      .withColumn("hmat", struct(lit(1).as("numRows"), lit(2).as("numCols"),
        array(col("x"), lit(1.0)).as("values")))

    val ekf = new ExtendedKalmanFilter(2, 1)
      .setStateKeyCol("modelID")
      .setEventTimeCol("t")
      .setMeasurementCol("meas")
      .setMeasurementModelCol("hmat")
      .setMeasurementFunction((st, h) => Array(math.exp(h.values(0) * st(0) + h.values(1) * st(1))))
      .setMeasurementStateJacobian((st, h) => {
        val e = math.exp(h.values(0) * st(0) + h.values(1) * st(1))
        DMat(1, 2, Array(h.values(0) * e, e))
      })
      .setInitialStateMean(Array(0.0, 0.0))
      .setInitialStateCovariance(DMat.of(2, 2, 10.0, 0.0, 0.0, 10.0))
      .setProcessNoise(DMat.zeros(2, 2))
      .setMeasurementNoise(DMat.of(1, 1, 10.0))

    ExampleSession.run(
      ekf.transform(measurements).select(col("modelID"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("a_hat"),
        round(col("stateMean")(1), 3).as("b_hat")),
      seconds)
    spark.stop()
  }
}

/** Same GLM-log model as [[EKFRateSourceGLMLog]], estimated with sigma points. */
object UKFRateSourceGLMLog {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("UKFRateSourceGLMLog")
    val (a, b) = (0.2, 0.7)

    val measurements = spark.readStream.format("rate").option("rowsPerSecond", "20").load()
      .withColumn("modelID", pmod(col("value"), lit(2)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("x", (col("value") / 2).cast("long").cast("double") % 10)
      .withColumn("meas", array(exp(col("x") * a + b) + randn(12)))
      .withColumn("hmat", struct(lit(1).as("numRows"), lit(2).as("numCols"),
        array(col("x"), lit(1.0)).as("values")))

    val ukf = new UnscentedKalmanFilter(2, 1)
      .setStateKeyCol("modelID")
      .setEventTimeCol("t")
      .setMeasurementCol("meas")
      .setMeasurementModelCol("hmat")
      .setSigmaPoints("merwe")
      .setMerweAlpha(0.8).setMerweBeta(2.0).setMerweKappa(1.0)
      .setMeasurementFunction((st, h) => Array(math.exp(h.values(0) * st(0) + h.values(1) * st(1))))
      .setInitialStateMean(Array(0.0, 0.0))
      .setInitialStateCovariance(DMat.of(2, 2, 10.0, 0.0, 0.0, 10.0))
      .setProcessNoise(DMat.zeros(2, 2))
      .setMeasurementNoise(DMat.of(1, 1, 10.0))

    ExampleSession.run(
      ukf.transform(measurements).select(col("modelID"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("a_hat"),
        round(col("stateMean")(1), 3).as("b_hat")),
      seconds)
    spark.stop()
  }
}

/**
 * Online gaussian mixture: the rate source emits draws from 3 components
 * (means -5, 0, 5); the stochastic-EM mixture recovers them per key.
 */
object GMMRateSource {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("GMMRateSource")

    val samples = spark.readStream.format("rate").option("rowsPerSecond", "60").load()
      .withColumn("key", pmod(col("value"), lit(2)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("comp", pmod(col("value") / 2, lit(3)))
      .withColumn("sample", array(col("comp").cast("double") * 5.0 - 5.0 + randn(21)))

    val gmm = new MultivariateGaussianMixture(3, 1)
      .setStateKeyCol("key")
      .setEventTimeCol("t")
      .setSampleCol("sample")
      .setStepSize(0.1)
      .setMinibatchSize(8)
      .setInitialMeans(Array(Array(-2.0), Array(0.0), Array(2.0)))
      .setInitialCovariances(Array(Array(4.0), Array(4.0), Array(4.0)))

    ExampleSession.run(
      gmm.transform(samples).select(col("key"), col("stateIndex"),
        round(col("weights")(0), 2).as("w0"),
        round(col("params")(0)(0), 2).as("mu0"),
        round(col("params")(1)(0), 2).as("mu1"),
        round(col("params")(2)(0), 2).as("mu2")),
      seconds)
    spark.stop()
  }
}

/**
 * MMAE over a bank of 3 local-level filters with measurement noises 1/5/9;
 * the sliding-likelihood weights concentrate on the best-matched filter and
 * the output is the weighted state.
 */
object MMAERateSourceOLS {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("MMAERateSourceOLS")

    val base = spark.readStream.format("rate").option("rowsPerSecond", "20").load()
      .withColumn("t", col("timestamp"))
      .withColumn("meas", array(col("value").cast("double") / 20.0 + randn(31) * 2.0))
    val bank = base.crossJoin(
      spark.range(3).select(col("id").as("fid"),
        expr("struct(1 as numRows, 1 as numCols, array(double(1 + id*4)) as values)").as("rmat")))
      .withColumn("bankKey", concat(lit("m_"), col("fid")))

    val lkf = new LinearKalmanFilter(1, 1)
      .setStateKeyCol("bankKey")
      .setEventTimeCol("t")
      .setMeasurementCol("meas")
      .setMeasurementNoiseCol("rmat")
      .setInitialStateCovariance(DMat.of(1, 1, 10.0))
      .setProcessNoise(DMat.of(1, 1, 1.0))
      .setSlidingLikelihoodWindow(5)
      .setEnableMultipleModelAdaptiveEstimation()
      .setWatermarkDuration("5 seconds")
      .setMultipleModelMeasurementWindowDuration("5 seconds")

    ExampleSession.run(
      lkf.transform(bank).select(col("eventWindow"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("mmae_level")),
      seconds)
    spark.stop()
  }
}

/** LKF as streaming OLS: state (intercept, slope) with H = [1, x] per row —
  * the Kalman route to the same model RLSRateSourceOLS estimates. */
object LKFRateSourceOLS {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("LKFRateSourceOLS")

    val data = spark.readStream.format("rate").option("rowsPerSecond", "20").load()
      .withColumn("key", pmod(col("value"), lit(2)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("x", (col("value") % 100).cast("double"))
      .withColumn("meas", array(lit(3.0) + col("x") * 2.0 + randn(5)))
      .withColumn("hmat", struct(lit(1).as("numRows"), lit(2).as("numCols"),
        array(lit(1.0), col("x")).as("values")))

    val lkf = new LinearKalmanFilter(2, 1)
      .setStateKeyCol("key")
      .setEventTimeCol("t")
      .setMeasurementCol("meas")
      .setMeasurementModelCol("hmat")
      .setProcessNoise(DMat.zeros(2, 2))
      .setMeasurementNoise(DMat.of(1, 1, 1.0))
      .setInitialStateMean(Array(0.0, 0.0))
      .setInitialStateCovariance(DMat.of(2, 2, 10.0, 0.0, 0.0, 10.0))

    ExampleSession.run(
      lkf.transform(data).select(col("key"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("intercept"),
        round(col("stateMean")(1), 3).as("slope")),
      seconds)
    spark.stop()
  }
}

/**
 * Batch-train an LKF on historical data, then continue filtering a stream
 * from the batch posterior: the final (mean, covariance) per key becomes the
 * streaming filter's prior via setInitialStateDistributionCol — the
 * reference's LKFStreamBatchInit pattern. Parity of this mechanism is
 * spec-checked in MLPipelineSpec ("warm start equals the uninterrupted run").
 */
object LKFStreamBatchInit {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = ExampleSession.build("LKFStreamBatchInit")
    val numKeys = 2
    val batchRows = 100

    def withMeasurement(df: DataFrame): DataFrame = df
      .withColumn("stateKey", pmod(col("value"), lit(numKeys)).cast("string"))
      .withColumn("meas", array((col("value") / numKeys).cast("double") + randn(41)))

    val lkf = new LinearKalmanFilter(2, 1)
      .setStateKeyCol("stateKey")
      .setMeasurementCol("meas")
      .setProcessModel(DMat.of(2, 2, 1.0, 1.0, 0.0, 1.0))
      .setProcessNoise(DMat.of(2, 2, 1e-4, 0.0, 0.0, 1e-4))
      .setMeasurementModel(DMat.of(1, 2, 1.0, 0.0))
      .setMeasurementNoise(DMat.of(1, 1, 1.0))
      .setInitialStateMean(Array(0.0, 0.0))
      .setInitialStateCovariance(DMat.of(2, 2, 1000.0, 0.0, 0.0, 1000.0))

    // Batch phase: filter history, keep each key's posterior as one struct.
    val history = spark.range(numKeys * batchRows).toDF("value")
    val batchState = lkf.transform(withMeasurement(history))
      .groupBy("stateKey")
      .agg(max_by(struct(col("stateMean").as("mean"),
        col("stateCovariance").as("covariance")), col("stateIndex")).as("state"))
      .cache()
    batchState.show(numKeys, truncate = false)

    // Streaming phase: same filter, prior read from the joined batch posterior.
    val streamDF = withMeasurement(
      spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .withColumn("value", col("value") + numKeys * batchRows))
      .withColumn("t", col("timestamp"))
      .join(batchState, "stateKey")

    val streamFilter = lkf.setEventTimeCol("t").setInitialStateDistributionCol("state")
    ExampleSession.run(
      streamFilter.transform(streamDF).select(col("stateKey"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("level"),
        round(col("stateMean")(1), 3).as("slope")),
      seconds)
    spark.stop()
  }
}
