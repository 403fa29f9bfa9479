package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch event-analytics operators behind q_funnel / q_retention, extracted
 * so Scala and Python callers share one formulation with the query layer.
 *
 * Scale shape: the funnel is ONE aggregation shuffle on the user key with
 * map-side partial mins (the stage fold and the final count are a
 * projection + a 1-row global agg); retention is the standard two-shuffle
 * co-partitioned pair (first-event agg, cohort-cell distinct) — no window,
 * no sort, both AQE-friendly.
 */
object EventAnalytics {

  /**
   * Ordered funnel conversion by first-occurrence times (the loose-funnel
   * definition): stage k is reached when every stage 1..k has occurred and
   * each first occurrence is no earlier than the previous stage's. Returns
   * one row: n_users plus reached_1..reached_n counts.
   */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame =
    funnel(events, userCol, typeCol, tsCol, stages, maxGapSeconds = 0L)

  /**
   * Windowed variant: stage k additionally requires its first occurrence
   * within `maxGapSeconds` of the previous stage's (the "converted within
   * 7 days" funnel every growth dashboard runs). `maxGapSeconds = 0` means
   * unbounded. Same single-shuffle shape.
   */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String], maxGapSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapSeconds >= 0L, "maxGapSeconds must be >= 0 (0 = unbounded)")
    val n = stages.length
    val firstAggs = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t${i + 1}")
    }
    val firsts = events.groupBy(col(userCol))
      .agg(firstAggs.head, firstAggs.tail: _*)
    def reached(k: Int): Column = (1 to k).map { i =>
      val present = col(s"t$i").isNotNull
      if (i == 1) present
      else {
        val ordered = present && col(s"t$i") >= col(s"t${i - 1}")
        if (maxGapSeconds == 0L) ordered
        else ordered &&
          col(s"t$i") <= col(s"t${i - 1}") + expr(s"INTERVAL $maxGapSeconds SECONDS")
      }
    }.reduce(_ && _)
    val flags = (1 to n).map(k => when(reached(k), 1L).otherwise(0L).as(s"s$k"))
    firsts.select(flags: _*)
      .agg(count(lit(1)).as("n_users"),
        (1 to n).map(k => sum(col(s"s$k")).as(s"reached_$k")): _*)
  }

  /**
   * Time-to-convert distribution: for every user whose first `toStage`
   * follows their first `fromStage`, the whole-hour latency folded into
   * log2 buckets — (hours_log2, n_users, min_hours, max_hours). One
   * aggregation shuffle + a tiny bucket agg, all integer arithmetic.
   */
  def timeToConvert(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      fromStage: String, toStage: String): DataFrame = {
    val firsts = events.groupBy(col(userCol)).agg(
      min(when(col(typeCol) === fromStage, col(tsCol))).as("t_from"),
      min(when(col(typeCol) === toStage, col(tsCol))).as("t_to"))
    firsts
      .where(col("t_from").isNotNull && col("t_to").isNotNull &&
        col("t_to") >= col("t_from"))
      .withColumn("hours",
        ((unix_micros(col("t_to")) - unix_micros(col("t_from"))) / 3600000000L)
          .cast("long"))
      .groupBy(length(bin(col("hours") + 1)).cast("long").as("hours_log2"))
      .agg(count(lit(1)).as("n_users"),
        min(col("hours")).as("min_hours"),
        max(col("hours")).as("max_hours"))
      .orderBy(col("hours_log2"))
  }

  /**
   * Weekly cohort retention triangle: cohort = week of the user's first
   * event; n_users = distinct users from that cohort active k weeks later.
   * Returns (cohort_week, week_offset, n_users) ordered.
   */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = events.select(col(userCol), col(tsCol))
    val firsts = ev.groupBy(col(userCol)).agg(min(col(tsCol)).as("first_ts"))
    ev.join(firsts, Seq(userCol))
      .select(col(userCol),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        (datediff(col(tsCol).cast("date"), col("first_ts").cast("date"))
          .cast("long") / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /**
   * First-order Markov transition matrix over event types: per user,
   * events totally ordered by `(tsCol, idCol)` (the unique-id tiebreak
   * makes the pair set deterministic), each adjacent pair contributes one
   * `(from_type, to_type)` observation. Returns
   * `(from_type, to_type, n, prob_micro)` where
   * `prob_micro = n * 1e6 div Σn` over the from_type row — the
   * "where do users go next" dashboard.
   *
   * Scale shape: one shuffle for the per-user sort (pairs come out of
   * `lead()` over the sorted partition — no self-join), one aggregation
   * shuffle on the (from, to) pair; the row normalizer is a window over
   * the TYPE×TYPE pair table (tiny — |types|² rows), never a second scan
   * of the events. Per-user partitions bound the sort; no global sort.
   */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob_micro",
        expr("CAST(n * 1000000 div from_total AS BIGINT)"))
      .drop("from_total")
      .orderBy(col("from_type"), col("to_type"))
  }

  /**
   * Top-k user journeys: each user's first `pathLen` event types (totally
   * ordered by `(tsCol, idCol)`) joined with '>', ranked by user count —
   * the "what do new users actually do" dashboard. Deterministic despite
   * `collect_list`'s partial-merge order: the list holds
   * `(ts, id, type)` structs and `array_sort` imposes the total order
   * before the slice; ranking ties break path-ascending.
   *
   * Scale shape: two aggregation shuffles (per-user assemble, path count);
   * the per-user array is bounded by that user's event count and the
   * emitted path by `pathLen`; the final top-k is TakeOrderedAndProject
   * (per-partition heaps, k rows to the driver — never a global sort).
   */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, pathLen: Int, k: Int): DataFrame = {
    require(pathLen > 0 && k > 0, "pathLen and k must be positive")
    events
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(typeCol).as("et")).as("e"))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(array_join(
        transform(slice(col("es"), 1, pathLen), e => e("et")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }
}
