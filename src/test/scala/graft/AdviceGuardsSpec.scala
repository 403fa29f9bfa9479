package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{CorpusStats, EventAnalytics}
import graft.sim.Similarity

/**
 * Loud-failure guards added on advisor findings: silent int64 wrap in
 * moments' power sums, NULL-everywhere lift when an A/B arm is empty, and
 * ragged vectors scored on truncated dot products in the silhouette kernel.
 * Each test plants the degenerate input and asserts the operator now fails
 * (or filters) explicitly instead of corrupting output.
 */
class AdviceGuardsSpec extends AnyFunSuite with SparkTestSession {

  test("moments fails loudly when |x| exceeds the int64-safe cube grain") {
    import spark.implicits._
    val ok = Seq(("g", 2097151L), ("g", 3L)).toDF("grp", "v")
    // boundary value passes: s3 = 2097151^3 + 27 stays under 2^63
    val r = CorpusStats.moments(ok, "grp", "v").collect().head
    assert(r.getAs[Long]("n") == 2L)

    val bad = Seq(("g", 2097152L)).toDF("grp", "v")
    val ex = intercept[Exception] {
      CorpusStats.moments(bad, "grp", "v").collect()
    }
    assert(ex.getMessage.contains("int64-safe grain") ||
      ex.getCause != null && ex.getCause.getMessage.contains("int64-safe grain"))
  }

  test("moments fails loudly when the s3 SUM wraps int64 across rows") {
    import spark.implicits._
    // each term fits the grain (2097151^3 ≈ 9.22e18 < 2^63) but TWO of them
    // sum past int64 — the round-9 advice hole: the per-term guard passed
    // while the sum silently wrapped. Now s3 accumulates in DECIMAL(38,0)
    // and the BIGINT emission range-checks.
    val bad = Seq(("g", 2097151L), ("g", 2097151L)).toDF("grp", "v")
    val ex = intercept[Exception] {
      CorpusStats.moments(bad, "grp", "v").collect()
    }
    assert(ex.getMessage.contains("sum(x^3) exceeds int64") ||
      ex.getCause != null && ex.getCause.getMessage.contains("sum(x^3) exceeds int64"))
    // negative twin: two large-negative rows must also trip the range check
    val badNeg = Seq(("g", -2097151L), ("g", -2097151L)).toDF("grp", "v")
    val ex2 = intercept[Exception] {
      CorpusStats.moments(badNeg, "grp", "v").collect()
    }
    assert(ex2.getMessage.contains("sum(x^3) exceeds int64") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("sum(x^3) exceeds int64"))
  }

  test("attribution fails loudly on pre-epoch timestamps or negative ids") {
    import spark.implicits._
    val ok = Seq(
      ("u1", "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      ("u1", "buy", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = EventAnalytics.attribution(ok, "user_id", "event_type", "ts", "event_id", "buy")
      .collect()
    assert(r.length == 1 && r.head.getAs[String]("event_type") == "view")

    val preEpoch = Seq(
      ("u1", "view", java.sql.Timestamp.valueOf("1969-06-01 10:00:00"), 1L),
      ("u1", "buy", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val ex = intercept[Exception] {
      EventAnalytics.attribution(preEpoch, "user_id", "event_type", "ts", "event_id", "buy").collect()
    }
    assert(ex.getMessage.contains("order key needs") ||
      ex.getCause != null && ex.getCause.getMessage.contains("order key needs"))

    val negId = Seq(
      ("u1", "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), -1L),
      ("u1", "buy", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val ex2 = intercept[Exception] {
      EventAnalytics.attribution(negId, "user_id", "event_type", "ts", "event_id", "buy").collect()
    }
    assert(ex2.getMessage.contains("order key needs") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("order key needs"))
  }

  test("abLift fails loudly when no user hashes into arm A") {
    import spark.implicits._
    // armPct=1: with two users the md5 buckets land in [1, 100) -> arm B
    // only (deterministic: same bucketing as DatasetSplit). If a future
    // testdata change puts a user in arm A this test must pick new ids.
    val events = Seq(("u1", "view"), ("u2", "buy")).toDF("user_id", "event_type")
    val buckets = events.select(
      graft.operators.DatasetSplit.bucket(col("user_id")).as("b"))
      .collect().map(_.getAs[Number]("b").intValue())
    assume(buckets.forall(_ >= 1), "ids must all hash outside arm A for this test")
    val ex = intercept[Exception] {
      EventAnalytics.abLift(events, "user_id", "event_type", "buy", armPct = 1)
        .collect()
    }
    assert(ex.getMessage.contains("arm A is empty") ||
      ex.getCause != null && ex.getCause.getMessage.contains("arm A is empty"))
  }

  test("HLL small-range linear counting: sparse keys estimate exactly, not ~45") {
    import spark.implicits._
    import graft.operators.Sketches
    // 1 distinct item: the raw harmonic estimate at m=64 is ~45 (the
    // documented small-range bias); the linear-counting branch must say 1
    val one = Seq(("g", "only-user")).toDF("grp", "item")
    val est1 = Sketches.hllDistinct(one, "grp", "item")
      .collect().head.getAs[Long]("est_distinct")
    assert(est1 == 1L, s"1 distinct estimated $est1")
    // 10 distinct items: linear counting corrects bucket collisions too
    // (k items in j<k buckets -> round(64*ln(64/(64-j))) recovers ~k)
    val few = (0 until 10).map(i => ("g", s"user$i")).toDF("grp", "item")
    val est10 = Sketches.hllDistinct(few, "grp", "item")
      .collect().head.getAs[Long]("est_distinct")
    assert(math.abs(est10 - 10L) <= 2L, s"10 distinct estimated $est10")
    // the table itself is the bit-exact contract both engines replay
    assert(Sketches.HllLinearTable.length == 64 && Sketches.HllLinearTable(63) == 0L)
  }

  test("silhouette drops ragged vectors instead of scoring truncated dots") {
    import spark.implicits._
    val good = (0 until 8).map(i =>
      (i.toLong, Array(if (i % 2 == 0) 1.0 else 0.0, if (i % 2 == 0) 0.0 else 1.0)))
    val ragged = Seq((100L, Array(1.0)), (101L, Array(1.0, 0.0, 5.0)))
    val df = (good ++ ragged).toDF("id", "vec")
    val out = Similarity.silhouette(df, "id", "vec", k = 2, iters = 2)
    // only the 8 well-formed vectors are scored: cell counts sum to 8
    val n = out.agg(sum(col("n_vecs"))).collect().head.getLong(0)
    assert(n == 8L)
  }
}
