package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.EventStreams

/**
 * Batch ≡ streaming for the event-analytics pair: the funnel's
 * first-occurrence mins and the retention cohort's first-event min are both
 * commutative folds, so the stateful streaming twins must land on exactly
 * the batch answer once all events have been fed — across micro-batch
 * boundaries, with bounded per-user state (a handful of longs).
 */
class StreamingEventParitySpec extends AnyFunSuite with SparkTestSession {

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  private val stages = Seq("signup", "view", "click", "purchase")

  // u1 converts fully in order; u2 viewed before signup (stops at stage 1);
  // u3 signs up then clicks without a view (stops at 2); u4 never signs up
  private val rows = Seq(
    ("u1", 0L, "signup"), ("u1", 10L, "view"), ("u1", 20L, "click"),
    ("u1", 30L, "purchase"),
    ("u2", 5L, "view"), ("u2", 8L, "signup"), ("u2", 50L, "click"),
    ("u3", 2L, "signup"), ("u3", 7L, "view"), ("u3", 6L, "click"),
    ("u3", 4L, "purchase"),
    ("u4", 9L, "view"), ("u4", 11L, "purchase")
  ).map { case (u, m, et) => (u, ts(m), et) }

  test("funnel: streaming stage reach equals the batch first-occurrence fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch expectation via the q_funnel fold
    def firstOf(tp: String) = min(when(col("event_type") === tp, col("ts")))
    val batch = rows.toDF("user_id", "ts", "event_type")
      .groupBy(col("user_id"))
      .agg(firstOf("signup").as("t1"), firstOf("view").as("t2"),
        firstOf("click").as("t3"), firstOf("purchase").as("t4"))
      .select(col("user_id"),
        (when(col("t1").isNotNull, 1L).otherwise(0L) +
         when(col("t1").isNotNull && col("t2").isNotNull && col("t2") >= col("t1"), 1L).otherwise(0L) +
         when(col("t1").isNotNull && col("t2").isNotNull && col("t2") >= col("t1") &&
           col("t3").isNotNull && col("t3") >= col("t2"), 1L).otherwise(0L) +
         when(col("t1").isNotNull && col("t2").isNotNull && col("t2") >= col("t1") &&
           col("t3").isNotNull && col("t3") >= col("t2") &&
           col("t4").isNotNull && col("t4") >= col("t3"), 1L).otherwise(0L)).as("reached"))
      .as[(String, Long)].collect().toMap

    // streaming: split mid-user, mid-stage — u1's purchase and u2's click
    // arrive in the second micro-batch
    val (b1, b2) = rows.partition(_._2.getTime <= ts(20).getTime)
    val stream = MemoryStream[(String, Timestamp, String)]
    val sq = EventStreams.funnelStages(
        stream.toDS().toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", stages)
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      // last emitted row per user is the live funnel position
      val got = spark.table("funnel_parity")
        .withColumn("_n", monotonically_increasing_id())
        .orderBy(col("_n").desc).select("user_id", "reached")
        .as[(String, Long)].collect()
        .groupBy(_._1).map { case (u, v) => u -> v.head._2 }
      assert(got == batch, s"stream $got vs batch $batch")
      // and the spot meanings hold
      assert(batch("u1") == 4L && batch("u2") == 1L && batch("u3") == 2L && batch("u4") == 0L)
    } finally sq.stop()
  }

  test("retention: streaming first-ts tagging reproduces the batch cohort cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // spread events across weeks so multiple cohort cells appear
    val rrows = Seq(
      ("a", 0L), ("a", 7L * 1440 + 5L), ("a", 15L * 1440),
      ("b", 3L * 1440), ("b", 10L * 1440), ("b", 3L * 1440 + 30L),
      ("c", 20L * 1440)
    ).map { case (u, m) => (u, ts(m)) }

    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        expr("CAST(datediff(CAST(ts AS DATE), CAST(first_ts AS DATE)) div 7 AS BIGINT)")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .as[(java.sql.Date, Long, Long)].collect().sortBy(r => (r._1.getTime, r._2))

    val batchDf = rrows.toDF("user_id", "ts")
    val firsts = batchDf.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val batch = cells(batchDf.join(firsts, Seq("user_id")))

    // streaming: feed in event-time order (the watermarked shape), split so
    // users a and b both span the micro-batch boundary
    val ordered = rrows.sortBy(_._2.getTime)
    val (b1, b2) = ordered.partition(_._2.getTime <= ts(7L * 1440).getTime)
    val stream = MemoryStream[(String, Timestamp)]
    val sq = EventStreams.retentionCells(
        stream.toDS().toDF("user_id", "ts"), "user_id", "ts")
      .writeStream.format("memory").queryName("retention_parity")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      val got = cells(spark.table("retention_parity"))
      assert(got.toSeq == batch.toSeq, s"stream ${got.toSeq} vs batch ${batch.toSeq}")
    } finally sq.stop()
  }

  test("props profiling: typed-on-read JSON parses identically in a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prows = Seq(
      ("click", "u1", """{"k": 5}"""), ("click", "u2", """{"k": 7}"""),
      ("view", "u1", """{"j": 1}"""),  // no k field -> null
      ("view", "u3", "not json"),      // malformed -> null
      ("click", "u1", """{"k": -2}""")
    )
    def profile(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("user_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"))

    val batch = profile(prows.toDF("event_type", "user_id", "props"))
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq

    val stream = MemoryStream[(String, String, String)]
    val sq = profile(stream.toDS().toDF("event_type", "user_id", "props"))
      .writeStream.format("memory").queryName("props_parity")
      .outputMode("complete").start()
    try {
      stream.addData(prows.take(2)); sq.processAllAvailable()
      stream.addData(prows.drop(2)); sq.processAllAvailable()
      val got = spark.table("props_parity")
        .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(got == batch, s"stream $got vs batch $batch")
      assert(batch.find(_._1 == "click").get._4.contains(10L))
      assert(batch.find(_._1 == "view").get._3 == 0L)
    } finally sq.stop()
  }

  test("attribution: streaming touch state reproduces the batch channel credit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // u1 converts with its touches split across the micro-batch boundary;
    // u2 converts entirely in batch 2; u3 never converts (emits nothing);
    // u4's post-conversion ad must NOT earn credit
    val arows = Seq(
      ("u1", 1L, 0L, "ad"), ("u1", 2L, 10L, "email"),
      ("u1", 3L, 30L, "purchase"),
      ("u2", 4L, 25L, "email"), ("u2", 5L, 35L, "ad"),
      ("u2", 6L, 45L, "purchase"),
      ("u3", 7L, 5L, "ad"),
      ("u4", 8L, 2L, "search"), ("u4", 9L, 12L, "purchase"),
      ("u4", 10L, 22L, "ad")
    ).map { case (u, id, m, et) => (u, id, ts(m), et) }

    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(sum(when(col("kind") === "f", 1L).otherwise(0L)).as("first_touch_users"),
        sum(when(col("kind") === "l", 1L).otherwise(0L)).as("last_touch_users"))
      .as[(String, Long, Long)].collect().sorted.toSeq

    val batch = graft.operators.EventAnalytics.attribution(
        arows.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, Long, Long)].collect().sorted.toSeq

    // event-time-ordered feed split so u1 converts only in the second batch
    val ordered = arows.sortBy(r => (r._3.getTime, r._2))
    val (b1, b2) = ordered.partition(_._3.getTime <= ts(20).getTime)
    val stream = MemoryStream[(String, Long, Timestamp, String)]
    val sq = EventStreams.attributionTouches(
        stream.toDS().toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .writeStream.format("memory").queryName("attribution_parity")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      // latest emitted row per user is the live attribution
      val latest = spark.table("attribution_parity")
        .withColumn("_n", monotonically_increasing_id())
        .orderBy(col("_n").desc)
        .as[(String, String, String, Long)].collect()
        .groupBy(_._1).map { case (_, v) => (v.head._2, v.head._3) }.toSeq
      val got = rollup(latest
        .flatMap { case (f, l) => Seq((f, "f"), (l, "l")) }
        .toDF("event_type", "kind"))
      assert(got == batch, s"stream $got vs batch $batch")
      // spot meanings: u4's post-conversion ad earned nothing, u3 absent
      assert(batch == Seq(("ad", 1L, 1L), ("email", 1L, 1L), ("search", 1L, 1L)))
    } finally sq.stop()
  }

  test("transitions: streaming adjacency pairs reproduce the batch pair counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // u1 and u2 both span the micro-batch boundary; u3 ties on ts (id
    // tiebreak); u4 is single-event (no pair ever)
    val trows = Seq(
      ("u1", 1L, 0L, "a"), ("u1", 2L, 10L, "b"), ("u1", 5L, 40L, "a"),
      ("u2", 3L, 5L, "b"), ("u2", 6L, 50L, "b"),
      ("u3", 4L, 20L, "c"), ("u3", 7L, 20L * 1L, "a"), // same minute, id 4 < 7
      ("u4", 8L, 60L, "z")
    ).map { case (u, id, m, et) => (u, id, ts(m), et) }

    val batch = graft.operators.EventAnalytics.transitions(
        trows.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_type", "ts", "event_id")
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect().sorted.toSeq

    // event-time-ordered feed split mid-user (u1's third and u2's second
    // event arrive in the second micro-batch)
    val ordered = trows.sortBy(r => (r._3.getTime, r._2))
    val (b1, b2) = ordered.partition(_._3.getTime <= ts(20).getTime)
    val stream = MemoryStream[(String, Long, Timestamp, String)]
    val sq = EventStreams.transitionPairs(
        stream.toDS().toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_type", "ts", "event_id")
      .writeStream.format("memory").queryName("transitions_parity")
      .outputMode("append").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      val got = spark.table("transitions_parity")
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().sorted.toSeq
      assert(got == batch, s"stream $got vs batch $batch")
    } finally sq.stop()
  }

  test("sessionize: streaming sessions ≡ batch across mid-session AND mid-gap splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.EventStreams

    // u1: two sessions (events at 0,10,20 min | gap 40 min | 60,65);
    // u2: one session whose events straddle the micro-batch boundary;
    // u3: a session whose CLOSING gap straddles the boundary
    val evRows = Seq(
      ("u1", ts(0)), ("u1", ts(10)), ("u1", ts(20)),
      ("u2", ts(5)), ("u2", ts(15)),
      ("u3", ts(0)),
      // ---- micro-batch boundary ----
      ("u1", ts(60)), ("u1", ts(65)),
      ("u2", ts(25)),
      ("u3", ts(45)) // 45-min gap > 30 -> session 2
    )

    // batch expectation: the q_sessionize window fold
    val ev = evRows.toDF("user_id", "ts")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"))
    val batch = ev.withColumn("new_s",
        when(col("tus") - lag(col("tus"), 1).over(w) > 1800000000L ||
          lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tus")).as("start_us"), count(lit(1)).as("n_events"),
        expr("(max(tus) - min(tus)) div 1000000").as("dur_sec"))
      .select(col("user_id"), col("session_id"), col("start_us"),
        col("n_events"), col("dur_sec"))
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq

    val (b1, b2) = evRows.splitAt(6)
    val stream = MemoryStream[(String, Timestamp)]
    val sq = EventStreams.sessionize(
        stream.toDS().toDF("user_id", "ts"), "user_id", "ts", gapSec = 1800L)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"), col("dur_sec"))
      .writeStream.format("memory").queryName("sessionize_parity")
      .outputMode("update").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      // latest emitted row per (user, session) is the live session table.
      // Key "latest" on DATA (n_events, dur_sec — both monotone as a session
      // absorbs events), not on monotonically_increasing_id, whose high bits
      // encode partition id and do not follow cross-batch emission order.
      val got = spark.table("sessionize_parity")
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (_, v) => val r = v.maxBy(x => (x._4, x._5)); (r._1, r._2, r._3, r._4, r._5) }
        .toSeq.sorted
      assert(got == batch, s"stream $got vs batch $batch")
      // spot meanings: u1 has 2 sessions (3 then 2 events), u3's session 1
      // closed with 1 event across the gap split
      val m = batch.map(r => (r._1, r._2) -> r._4).toMap
      assert(m(("u1", 1L)) == 3L && m(("u1", 2L)) == 2L &&
        m(("u2", 1L)) == 3L && m(("u3", 1L)) == 1L && m(("u3", 2L)) == 1L)
    } finally sq.stop()
  }

  test("seasonality: streaming cell counts ≡ batch across a mid-cell micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.EventAnalytics

    // two types, several hours; the same (click, dow, 22) cell receives
    // events in BOTH micro-batches, so the running count must fold
    val evRows = Seq(
      ("click", ts(0)), ("click", ts(5)), ("click", ts(65)),   // hr 22 x2, 23...
      ("view", ts(2)), ("click", ts(7)), ("view", ts(70))
    )
    val batchDf = evRows.toDF("event_type", "ts")
    val batchCells = EventAnalytics.seasonalityCells(batchDf, "event_type", "ts")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val batchProfile = EventAnalytics.seasonality(batchDf, "event_type", "ts")
      .collect().map(_.toSeq).toSeq

    val (b1, b2) = evRows.splitAt(3) // the click/hr-22 cell spans the split
    val stream = MemoryStream[(String, Timestamp)]
    val sq = EventAnalytics.seasonalityCells(
        stream.toDS().toDF("event_type", "ts"), "event_type", "ts")
      .writeStream.format("memory").queryName("seasonality_parity")
      .outputMode("complete").start()
    try {
      stream.addData(b1); sq.processAllAvailable()
      stream.addData(b2); sq.processAllAvailable()
      val streamCells = spark.table("seasonality_parity")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(streamCells == batchCells, s"stream $streamCells vs batch $batchCells")
      // and the profile fold over the STREAMED cells equals the batch profile
      val streamProfile = EventAnalytics.seasonalityFromCells(
          spark.table("seasonality_parity"))
        .collect().map(_.toSeq).toSeq
      assert(streamProfile == batchProfile, s"stream $streamProfile vs batch $batchProfile")
    } finally sq.stop()
  }
}
