package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.length
    val firstAggs = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t${i + 1}")
    }
    val firsts = events.groupBy(col(userCol))
      .agg(firstAggs.head, firstAggs.tail: _*)
    def reached(k: Int): Column = (1 to k).map { i =>
      val present = col(s"t$i").isNotNull
      if (i == 1) present else present && col(s"t$i") >= col(s"t${i - 1}")
    }.reduce(_ && _)
    val flags = (1 to n).map(k => when(reached(k), 1L).otherwise(0L).as(s"s$k"))
    firsts.select(flags: _*)
      .agg(count(lit(1)).as("n_users"),
        (1 to n).map(k => sum(col(s"s$k")).as(s"reached_$k")): _*)
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
}
