package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.EventStreams

/**
 * Round-11 late-data axis for the streaming twins: the prior parity suites
 * split micro-batches but never exercised LATENESS. This spec drives
 * [[EventStreams.funnelStagesWatermarked]] across a watermark boundary:
 *
 *  - a late row INSIDE the watermark is absorbed (stream ≡ batch over all
 *    admitted rows);
 *  - a late row OUTSIDE the watermark is DROPPED by the engine, and the
 *    stream equals the batch fold over exactly the admitted subset — while
 *    the batch fold over ALL rows provably differs, so the drop is real,
 *    not vacuous.
 *
 * Watermark arithmetic in play: after batch 1 the watermark is
 * max(event time) − delay; batch 2's rows are filtered against THAT value
 * (watermarks advance between micro-batches, not within one).
 */
class StreamingLateDataSpec extends AnyFunSuite with SparkTestSession {

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  private val stages = Seq("a", "b", "c")

  test("watermarked funnel: late-inside absorbed, late-outside dropped, parity on the admitted subset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch 1: u1 a@0, b@5; u2 a@40; u3 a@60 (pushes max event time to 60)
    // watermark after batch 1 (delay 10 min): 60 - 10 = minute 50
    val b1 = Seq(("u1", ts(0), "a"), ("u1", ts(5), "b"),
      ("u2", ts(40), "a"), ("u3", ts(60), "a"))
    // batch 2: u1 c@55 (>= 50: late but INSIDE — absorbed);
    //          u2 b@45 (< 50: OUTSIDE — dropped by the engine)
    val b2 = Seq(("u1", ts(55), "c"), ("u2", ts(45), "b"))

    val stream = MemoryStream[(String, Timestamp, String)]
    val sq = EventStreams.funnelStagesWatermarked(
        stream.toDS().toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", stages, delay = "10 minutes")
      .writeStream.format("memory").queryName("late_funnel")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      // reached is monotone under admitted rows: latest = max per user
      val got = spark.table("late_funnel")
        .groupBy("user_id").agg(max("reached").as("reached"))
        .as[(String, Long)].collect().toMap

      // the q_funnel batch fold over an explicit row set
      def batchReach(rows: Seq[(String, Timestamp, String)]): Map[String, Long] = {
        def firstOf(tp: String) = min(when(col("event_type") === tp, col("ts")))
        rows.toDF("user_id", "ts", "event_type")
          .groupBy(col("user_id"))
          .agg(firstOf("a").as("t1"), firstOf("b").as("t2"), firstOf("c").as("t3"))
          .withColumn("reached",
            when(col("t1").isNull, 0L)
              .when(col("t2").isNull || col("t2") < col("t1"), 1L)
              .when(col("t3").isNull || col("t3") < col("t2"), 2L)
              .otherwise(3L))
          .select("user_id", "reached").as[(String, Long)].collect().toMap
      }

      val admitted = b1 ++ b2.filter { case (_, t, _) => t.getTime >= ts(50).getTime }
      assert(got == batchReach(admitted),
        s"stream $got != batch-over-admitted ${batchReach(admitted)}")
      // the drop is observable: u2 would reach 2 if the outside row counted
      val all = batchReach(b1 ++ b2)
      assert(all("u2") == 2L && got("u2") == 1L,
        s"outside-watermark row was not dropped (got ${got("u2")}, all-rows ${all("u2")})")
      // and the inside row was genuinely absorbed: u1 advanced to 3 in batch 2
      assert(got("u1") == 3L)
    } finally sq.stop()
  }

  test("state expires via event-time timeout after the ttl horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp, String)]
    // ttl 5 minutes past the watermark: u1's state (from minute 0-5) is
    // expired once the watermark passes ~minute 10; a fresh u1 row after
    // expiry starts the funnel OVER (reached resets to the new fold)
    val sq = EventStreams.funnelStagesWatermarked(
        stream.toDS().toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", stages,
        delay = "1 minutes", ttlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("ttl_funnel")
      .outputMode("update").start()
    try {
      stream.addData(Seq(("u1", ts(0), "a"), ("u1", ts(5), "b")))
      sq.processAllAvailable()
      // watermark -> 5-1=4; push it far past 4+5: driver row at minute 100
      stream.addData(Seq(("wm", ts(100), "a")))
      sq.processAllAvailable()
      // one more empty-ish advance so the timeout fires
      stream.addData(Seq(("wm", ts(101), "a")))
      sq.processAllAvailable()
      // u1 re-arrives with only stage b: with state expired this folds to
      // reached=0 (no stage a) — a 0 emission for u1 can ONLY happen if the
      // old firsts were removed (data-keyed check, no emission-order games)
      stream.addData(Seq(("u1", ts(102), "b")))
      sq.processAllAvailable()
      val u1Reached = spark.table("ttl_funnel")
        .where(col("user_id") === "u1").select("reached")
        .as[Long].collect().toSet
      assert(u1Reached.contains(0L), s"state survived past ttl (emissions $u1Reached)")
      assert(u1Reached.contains(2L), "sanity: pre-expiry fold reached 2")
    } finally sq.stop()
  }
}
