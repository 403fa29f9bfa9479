package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.{LinearKalmanFilter, SparkTestSession}
import graft.linalg.DMat

/**
 * Long-stream state-store boundedness: an hour-scale stream with churning
 * keys must not accumulate state forever. With a watermark + event-time
 * timeout, keys idle past the timeout are REMOVED from the state store —
 * the StreamingQueryProgress state metrics must show rows bounded by the
 * live-key count, not the all-time key count.
 */
class BoundedStateSpec extends AnyFunSuite with SparkTestSession {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("event-time timeout keeps state rows bounded across many micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Timestamp, Array[Double])]
    val lkf = new LinearKalmanFilter(1, 1)
      .setStateKeyCol("key").setEventTimeCol("t").setMeasurementCol("meas")
      .setInitialStateCovariance(DMat.of(1, 1, 10.0))
      .setProcessNoise(DMat.of(1, 1, 1.0))
      .setMeasurementNoise(DMat.of(1, 1, 4.0))
      .setWatermarkDuration("1 minute")
      .setStateTimeoutMode("event")
      .setStateTimeoutDuration("2 minutes")

    val sq = lkf.transform(stream.toDS().toDF("key", "t", "meas"))
      .writeStream.format("memory").queryName("bounded_state").outputMode("append")
      .start()

    // 40 micro-batches, each a FRESH key 10 event-minutes later: every key
    // becomes idle >2 min behind the watermark one batch after it appears
    val nBatches = 40
    var peak = 0L
    for (b <- 0 until nBatches) {
      stream.addData(Seq(
        (s"k$b", ts(b * 10), Array(1.0 + b)),
        (s"k$b", ts(b * 10 + 1), Array(2.0 + b))))
      sq.processAllAvailable()
      for (p <- Option(sq.lastProgress); so <- p.stateOperators.headOption)
        peak = math.max(peak, so.numRowsTotal)
    }
    sq.processAllAvailable()
    val lastRows = sq.lastProgress.stateOperators.head.numRowsTotal
    sq.stop()

    // 40 all-time keys; without timeout the store would hold all 40 states.
    // Allow margin for timeout firing one batch late, but the store must stay
    // an order of magnitude below the all-time key count.
    assert(lastRows <= 4, s"final state rows $lastRows — timeout not removing state?")
    assert(peak <= 6, s"peak state rows $peak — state grew with all-time keys")

    // every key still produced its outputs before being dropped
    val outRows = spark.table("bounded_state").count()
    assert(outRows == nBatches * 2L, s"expected ${nBatches * 2} output rows, got $outRows")
  }
}
