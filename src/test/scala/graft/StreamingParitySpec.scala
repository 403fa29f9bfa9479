package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.{LinearKalmanFilter, RecursiveLeastSquaresFilter, SparkTestSession}
import graft.linalg.DMat
import graft.mixture.MultivariateGaussianMixture

/** Batch ≡ streaming for stateful operators beyond the LKF (covered in
  * FilterSpec): RLS, the windowed MMAE bank and the online gaussian mixture,
  * across micro-batch boundaries. */
class StreamingParitySpec extends AnyFunSuite with SparkTestSession {

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 60000L)

  test("RLS streaming equals batch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 30).map(i => ("k", ts(i), Array(1.0, i.toDouble), 1.0 + 2.0 * i))

    def rls = new RecursiveLeastSquaresFilter(2)
      .setStateKeyCol("key").setEventTimeCol("t")
      .setFeaturesCol("features").setLabelCol("label")
      .setForgettingFactor(0.95)

    val batch = rls.transform(data.toDF("key", "t", "features", "label"))
      .select(col("stateIndex"), col("stateMean")(0), col("stateMean")(1))
      .as[(Long, Double, Double)].collect().sortBy(_._1)

    val stream = MemoryStream[(String, Timestamp, Array[Double], Double)]
    val sq = rls.transform(stream.toDS().toDF("key", "t", "features", "label"))
      .writeStream.format("memory").queryName("rls_parity").outputMode("append").start()
    stream.addData(data.take(11))
    sq.processAllAvailable()
    stream.addData(data.drop(11))
    sq.processAllAvailable()
    val streamed = spark.table("rls_parity")
      .select(col("stateIndex"), col("stateMean")(0), col("stateMean")(1))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    sq.stop()

    assert(batch.length == streamed.length)
    batch.zip(streamed).foreach { case ((i1, a1, b1), (i2, a2, b2)) =>
      assert(i1 == i2); assert(a1 == a2, s"idx $i1"); assert(b1 == b2)
    }
  }

  test("windowed MMAE streaming equals batch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(7)
    // 3-filter bank over one measurement stream (bankKey = bank member id)
    val data = for (i <- 1 to 24; fid <- 0 to 2) yield
      (s"m_$fid", ts(i), Array(0.5 * i + rng.nextGaussian()), 1.0 + fid * 4.0)

    def mmae = new LinearKalmanFilter(1, 1)
      .setStateKeyCol("bankKey").setEventTimeCol("t")
      .setMeasurementCol("meas")
      .setMeasurementNoiseCol("rmat")
      .setInitialStateCovariance(DMat.of(1, 1, 10.0))
      .setProcessNoise(DMat.of(1, 1, 1.0))
      .setSlidingLikelihoodWindow(5)
      .setEnableMultipleModelAdaptiveEstimation()
      .setWatermarkDuration("10 minutes")
      .setMultipleModelMeasurementWindowDuration("5 minutes")

    def withCols(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rmat", expr("struct(1 as numRows, 1 as numCols, array(r) as values)"))
      .drop("r")

    val batchIn = withCols(data.toDF("bankKey", "t", "meas", "r"))
    val batch = mmae.transform(batchIn)
      .select(col("stateIndex"), round(col("stateMean")(0), 9).as("m"))
      .as[(Long, Double)].collect().sortBy(_._1)

    val stream = MemoryStream[(String, Timestamp, Array[Double], Double)]
    val sq = mmae.transform(withCols(stream.toDS().toDF("bankKey", "t", "meas", "r")))
      .select(col("stateIndex"), round(col("stateMean")(0), 9).as("m"))
      .writeStream.format("memory").queryName("mmae_parity").outputMode("append").start()
    stream.addData(data.take(30))
    sq.processAllAvailable()
    stream.addData(data.drop(30))
    sq.processAllAvailable()
    // advance the watermark far enough to flush every window
    stream.addData(Seq(("m_0", ts(1000), Array(0.0), 1.0)))
    sq.processAllAvailable()
    val streamed = spark.table("mmae_parity")
      .where(col("stateIndex") <= 24) // drop the watermark-advancing tick
      .select(col("stateIndex"), col("m"))
      .as[(Long, Double)].collect().sortBy(_._1)
    sq.stop()

    assert(batch.length == streamed.length, s"${batch.length} vs ${streamed.length}")
    batch.zip(streamed).foreach { case ((i1, m1), (i2, m2)) =>
      assert(i1 == i2); assert(m1 == m2, s"stateIndex $i1: $m1 vs $m2")
    }
  }

  test("gaussian mixture streaming equals batch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(11)
    val data = (1 to 120).map { i =>
      val z = if (i % 2 == 0) 3.0 + rng.nextGaussian() else 20.0 + rng.nextGaussian()
      ("k", ts(i), Array(z))
    }

    def gmm = new MultivariateGaussianMixture(2, 1)
      .setStateKeyCol("key").setEventTimeCol("t").setSampleCol("sample")
      .setStepSize(0.1).setMinibatchSize(10)
      .setInitialMeans(Array(Array(0.0), Array(10.0)))
      .setInitialCovariances(Array(Array(10.0), Array(10.0)))

    val batch = gmm.transform(data.toDF("key", "t", "sample"))
      .select(col("stateIndex"), col("params")(0)(0), col("params")(1)(0))
      .as[(Long, Double, Double)].collect().sortBy(_._1)

    val stream = MemoryStream[(String, Timestamp, Array[Double])]
    val sq = gmm.transform(stream.toDS().toDF("key", "t", "sample"))
      .writeStream.format("memory").queryName("gmm_parity").outputMode("append").start()
    // boundary NOT aligned to minibatch size: state must carry the buffer
    stream.addData(data.take(37))
    sq.processAllAvailable()
    stream.addData(data.drop(37))
    sq.processAllAvailable()
    val streamed = spark.table("gmm_parity")
      .select(col("stateIndex"), col("params")(0)(0), col("params")(1)(0))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    sq.stop()

    assert(batch.length == streamed.length, s"${batch.length} vs ${streamed.length}")
    batch.zip(streamed).foreach { case ((i1, a1, b1), (i2, a2, b2)) =>
      assert(i1 == i2); assert(a1 == a2, s"idx $i1: $a1 vs $a2"); assert(b1 == b2)
    }
  }
}
