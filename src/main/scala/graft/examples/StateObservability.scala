package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.filter.LinearKalmanFilter
import graft.linalg.DMat

/**
 * State-store observability for hour-scale streams: runs a keyed LKF over a
 * rate source with watermark + event-time timeout and prints ONE JSON line
 * per micro-batch with the StreamingQueryProgress state metrics — rows
 * total/updated/removed, bytes in the store, rows dropped by the watermark.
 * This is the signal an operator watches to confirm state is bounded (rows
 * track LIVE keys, removals fire as keys go idle) before letting a stream
 * run for days.
 *
 * State store provider: the default HDFSBackedStateStoreProvider keeps every
 * key's state on the executor HEAP — fine while live keys x state size fits
 * in memory. For hour-scale streams with large/churning key spaces, run with
 * GRAFT_STATE_STORE=rocksdb to switch to the RocksDB provider (state lives
 * off-heap + on local disk, heap holds only the working set; changelog
 * checkpointing keeps commits incremental):
 *
 *   spark.sql.streaming.stateStore.providerClass=
 *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
 *   spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true
 *
 * Usage: sbt "runMain graft.examples.LKFStateMetrics [seconds]"
 */
object LKFStateMetrics {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(20)
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("LKFStateMetrics")
    if (sys.env.get("GRAFT_STATE_STORE").contains("rocksdb")) {
      builder
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // churning key space: key = value/200, so keys appear, live ~4s of rate
    // time, then go idle and must be timed out of the store
    val measurements = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .withColumn("key", expr("cast(value div 200 as string)"))
      .withColumn("t", col("timestamp"))
      .withColumn("meas", array(col("value") % 200 + randn(42)))

    val lkf = new LinearKalmanFilter(1, 1)
      .setStateKeyCol("key").setEventTimeCol("t").setMeasurementCol("meas")
      .setInitialStateCovariance(DMat.of(1, 1, 10.0))
      .setProcessNoise(DMat.of(1, 1, 1.0))
      .setMeasurementNoise(DMat.of(1, 1, 4.0))
      .setWatermarkDuration("2 seconds")
      .setStateTimeoutMode("event")
      .setStateTimeoutDuration("5 seconds")

    val q = lkf.transform(measurements)
      .select(col("key"), col("stateIndex"), round(col("stateMean")(0), 3).as("level"))
      .writeStream.format("noop").outputMode("append")
      .start()

    val deadline = System.currentTimeMillis() + seconds * 1000L
    var lastBatch = -1L
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(1000)
      for (p <- Option(q.lastProgress) if p.batchId != lastBatch; so <- p.stateOperators.headOption) {
        lastBatch = p.batchId
        println(
          s"""{"batch":${p.batchId},"inputRows":${p.numInputRows},""" +
          s""""stateRows":${so.numRowsTotal},"stateRowsUpdated":${so.numRowsUpdated},""" +
          s""""stateRowsRemoved":${so.numRowsRemoved},"stateBytes":${so.memoryUsedBytes},""" +
          s""""droppedByWatermark":${so.numRowsDroppedByWatermark}}""")
      }
    }
    q.stop()
    spark.stop()
  }
}
