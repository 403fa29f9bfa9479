package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.{RecursiveLeastSquaresFilter, SparkTestSession}
import graft.mixture.MultivariateGaussianMixture

/** Batch ≡ streaming for stateful operators beyond the LKF (covered in
  * FilterSpec): RLS and the online gaussian mixture, across micro-batch
  * boundaries. */
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
