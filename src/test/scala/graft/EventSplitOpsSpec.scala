package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{DatasetSplit, EventAnalytics}

/** Round-8 event/split additions: the gap-windowed funnel, the
  * time-to-convert histogram, and the near-dup-aware leakage-proof split. */
class EventSplitOpsSpec extends AnyFunSuite with SparkTestSession {

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  test("windowed funnel drops conversions outside the gap") {
    import spark.implicits._
    // u1 converts within minutes; u2's view comes 8 days after signup
    val rows = Seq(
      ("u1", ts(0), "signup"), ("u1", ts(5), "view"),
      ("u2", ts(0), "signup"), ("u2", ts(8L * 24 * 60), "view")
    ).toDF("user_id", "ts", "event_type")
    val unbounded = EventAnalytics.funnel(rows, "user_id", "event_type", "ts",
      Seq("signup", "view")).head()
    assert(unbounded.getAs[Long]("reached_2") == 2L)
    val weekly = EventAnalytics.funnel(rows, "user_id", "event_type", "ts",
      Seq("signup", "view"), maxGapSeconds = 604800L).head()
    assert(weekly.getAs[Long]("reached_1") == 2L)
    assert(weekly.getAs[Long]("reached_2") == 1L, "the 8-day view must not count")
  }

  test("timeToConvert buckets whole-hour latencies in log2 bins") {
    import spark.implicits._
    // latencies: 0h (90s), 1h30 -> 1h, 9h; log2 buckets of hours+1: 1, 2, 4
    val rows = Seq(
      ("a", ts(0), "signup"), ("a", ts(1), "purchase"),   // 60s   -> 0h, bucket len(bin(1))=1
      ("b", ts(0), "signup"), ("b", ts(90), "purchase"),  // 90min -> 1h, bucket len(bin(2))=2
      ("c", ts(0), "signup"), ("c", ts(540), "purchase"), // 9h    -> bucket len(bin(10))=4
      ("d", ts(0), "purchase"), ("d", ts(10), "signup"),  // purchase precedes -> excluded
      ("e", ts(0), "signup")                              // never converts -> excluded
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.timeToConvert(rows, "user_id", "event_type", "ts",
        "signup", "purchase")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(1L -> ((1L, 0L, 0L)), 2L -> ((1L, 1L, 1L)), 4L -> ((1L, 9L, 9L))), out)
  }

  test("nearDupSafeSplit keeps every near-dup component in one split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("n_chars") > 120).select(col("doc_id"), col("text"))
    // plant a truncated copy of every doc — byte-different, near-dup identical
    val corpus = docs.unionAll(docs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      col("text").substr(lit(1), length(col("text")) - 30).as("text")))
    val out = DatasetSplit.nearDupSafeSplit(corpus, "doc_id", "text", 0.4)
    // leakage check: a component never spans two splits
    assert(out.groupBy(col("canonical_id"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count() == 0L)
    // and the planted copies really are linked: most originals share a
    // component (and hence a split) with their truncation
    val linked = out.select(col("doc_id"), col("canonical_id"))
      .withColumn("pair_key", pmod(col("doc_id"), lit(100000L)))
      .groupBy(col("pair_key")).agg(countDistinct(col("canonical_id")).as("k"))
    val frac = linked.where(col("k") === 1).count().toDouble / linked.count()
    assert(frac > 0.8, s"only $frac of planted near-dup pairs share a component")
  }
}
