package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.filter.{LinearKalmanFilter, RecursiveLeastSquaresFilter}
import graft.linalg.DMat

/**
 * Runnable Structured Streaming demos (capability parity with the
 * reference's examples/src/main/scala streaming samples): a rate source
 * feeds synthetic measurements into filters running in streaming mode;
 * estimates print to the console. Bounded by `--seconds` (default 15).
 */
object LKFRateSourceLLT {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("LKFRateSourceLLT").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 10 parallel local-linear-trend series derived from the rate source
    val measurements = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .withColumn("key", pmod(col("value"), lit(10)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("meas", array(
        (col("value") / lit(10) + sin(col("value") / 7.0) * 5.0 + randn(42) * 2.0)))

    val lkf = new LinearKalmanFilter(2, 1)
      .setStateKeyCol("key")
      .setEventTimeCol("t")
      .setMeasurementCol("meas")
      // local linear trend: state = (level, slope)
      .setProcessModel(DMat.of(2, 2, 1.0, 1.0, 0.0, 1.0))
      .setProcessNoise(DMat.of(2, 2, 0.01, 0.0, 0.0, 0.01))
      .setMeasurementModel(DMat.of(1, 2, 1.0, 0.0))
      .setMeasurementNoise(DMat.of(1, 1, 4.0))
      .setInitialStateCovariance(DMat.of(2, 2, 100.0, 0.0, 0.0, 100.0))

    val q = lkf.transform(measurements)
      .select(col("key"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("level"),
        round(col("stateMean")(1), 3).as("slope"))
      .writeStream.format("console").outputMode("append")
      .option("truncate", "false").option("numRows", "8")
      .start()
    q.awaitTermination(seconds * 1000L)
    q.stop()
    spark.stop()
  }
}

/** Streaming recursive least squares recovering a linear model online. */
object RLSRateSourceOLS {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("RLSRateSourceOLS").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // y = 3 + 2x + noise, four independent models
    val data = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .withColumn("key", pmod(col("value"), lit(4)).cast("string"))
      .withColumn("t", col("timestamp"))
      .withColumn("x", (col("value") % 100).cast("double"))
      .withColumn("features", array(lit(1.0), col("x")))
      .withColumn("label", lit(3.0) + col("x") * 2.0 + randn(7))

    val rls = new RecursiveLeastSquaresFilter(2)
      .setStateKeyCol("key")
      .setEventTimeCol("t")
      .setFeaturesCol("features")
      .setLabelCol("label")
      .setRegularizationMatrixFactor(1e5)

    val q = rls.transform(data)
      .select(col("key"), col("stateIndex"),
        round(col("stateMean")(0), 3).as("intercept"),
        round(col("stateMean")(1), 3).as("slope"))
      .writeStream.format("console").outputMode("append")
      .option("truncate", "false").option("numRows", "8")
      .start()
    q.awaitTermination(seconds * 1000L)
    q.stop()
    spark.stop()
  }
}
