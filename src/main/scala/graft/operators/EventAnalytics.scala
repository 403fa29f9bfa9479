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
   * First/last-touch conversion attribution: for every user who converts
   * (has a `convType` event), the event types of their FIRST and LAST
   * touches strictly before the first conversion get one credit each.
   * Returns `(event_type, first_touch_users, last_touch_users)` — the
   * channel-credit dashboard marketers run next to the funnel.
   *
   * Determinism across engines: events are totally ordered by a zero-padded
   * `(ts_micros, event_id)` string key (unique id breaks timestamp ties),
   * so "first conversion", "first touch" and "last touch" are exact
   * `min_by`/`max_by` picks — no window-function tie luck.
   *
   * PRECONDITION (ENFORCED, round 10): `tsCol >= '1970-01-01'` and
   * `idCol >= 0`. The zero-padded string key renders negative values as
   * `-123...`, which sorts before every `0`-padded positive AND inverts
   * order among the negatives themselves — pre-epoch timestamps or negative
   * ids would silently mis-order, so they raise a loud error instead (same
   * contract as moments' grain guard). Shift such data (e.g. `ts + INTERVAL
   * n years`) before calling.
   *
   * Scale shape: ONE exchange on the user key — the per-user first
   * conversion rides an unordered window over that partitioning, the
   * pre-conversion filter is a projection, and the touch `groupBy(user)`
   * reuses the same hash partitioning (no second exchange); the final
   * channel rollup aggregates the |users|-row touch table into |types|
   * rows with map-side partials. No join against the event stream.
   */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, convType: String): DataFrame = {
    val tsMicros = unix_micros(col(tsCol))
    // enforce the order-key precondition loudly: a negative rendered into
    // the zero-padded key would silently mis-order first/last touches
    val guardedTs = when(tsMicros >= 0L && col(idCol).cast("long") >= 0L, tsMicros)
      .otherwise(raise_error(concat(
        lit("attribution: order key needs ts >= 1970-01-01 and id >= 0; got ts="),
        col(tsCol).cast("string"), lit(" id="), col(idCol).cast("string"))).cast("long"))
    val ord = concat(
      lpad(guardedTs.cast("string"), 20, "0"),
      lpad(col(idCol).cast("string"), 20, "0"))
    val w = Window.partitionBy(col(userCol))
    val touches = events
      .select(col(userCol), col(typeCol), ord.as("ord"))
      .withColumn("conv_ord",
        min(when(col(typeCol) === convType, col("ord"))).over(w))
      .where(col("conv_ord").isNotNull && col("ord") < col("conv_ord"))
      .groupBy(col(userCol))
      .agg(min_by(col(typeCol), col("ord")).as("first_touch"),
        max_by(col(typeCol), col("ord")).as("last_touch"))
    // unpivot the two credit kinds so ONE rollup serves both — a separate
    // groupBy per kind would recompute the whole touch subtree (scan +
    // window + agg) once per branch
    touches
      .select(explode(array(
        struct(lit(1).as("is_first"), col("first_touch").as("event_type")),
        struct(lit(0).as("is_first"), col("last_touch").as("event_type")))).as("x"))
      .groupBy(col("x.event_type").as("event_type"))
      .agg(sum(when(col("x.is_first") === 1, 1L).otherwise(0L)).as("first_touch_users"),
        sum(when(col("x.is_first") === 0, 1L).otherwise(0L)).as("last_touch_users"))
      .orderBy(col("event_type"))
  }

  /**
   * Log2-bucketed RFM segmentation over an order fact table: per customer,
   * recency (days since their last order, against the corpus max date),
   * frequency (order count) and monetary (exact DECIMAL(18,2) revenue sum —
   * order-independent addition, unlike a double sum) fold into bit-length
   * buckets, and the output is one row per `(r_bucket, f_bucket, m_bucket)`
   * segment with customer count, total revenue and max frequency.
   *
   * Data-independent bucket edges (log2, not ntile): an `ntile` quantile
   * scoring needs a GLOBAL sort window over every customer — the classic
   * single-partition scale killer. Bit-length buckets are a projection, keep
   * the whole plan at two aggregation shuffles (customer rollup, segment
   * rollup), and are stable period-over-period, which dashboards prefer.
   * The corpus max date is a 1-row broadcast.
   */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    val amt = col(amountCol).cast("decimal(18,2)")
    val perCust = orders.groupBy(col(custCol)).agg(
      max(col(dateCol)).as("last_order"),
      count(lit(1)).as("freq"),
      sum(amt).as("monetary"))
    val refDate = orders.agg(max(col(dateCol)).as("ref_date"))
    perCust.crossJoin(broadcast(refDate))
      .withColumn("recency_days",
        datediff(col("ref_date").cast("date"), col("last_order").cast("date"))
          .cast("long"))
      .select(
        length(bin(col("recency_days") + 1)).cast("long").as("r_bucket"),
        length(bin(col("freq"))).cast("long").as("f_bucket"),
        length(bin(floor(col("monetary")).cast("long") + 1)).cast("long")
          .as("m_bucket"),
        col("monetary"), col("freq"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).as("total_monetary"),
        max(col("freq")).as("max_freq"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
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

  /**
   * Robust daily-volume anomaly scores per event type: each (type, day)
   * count is scored against the type's median and MAD (median absolute
   * deviation) —
   *
   *   score_milli = |c − median| · 1000 div max(MAD, 1)
   *
   * — the outlier detector that a mean/stddev z-score cannot be, because
   * one broken day drags the mean but not the median. Medians are EXACT
   * lower medians (the value at row (n+1) div 2 under (value, day) order),
   * so every engine replays them bit-for-bit — no interpolation, no
   * approximate percentile.
   *
   * Scale shape: events collapse to the (types × days)-row daily-count
   * table in ONE aggregation shuffle with map-side partials; the median /
   * MAD windows then run on that bounded profile table, never on events.
   * Rows with score_milli ≥ `minScoreMilli` survive (0 keeps every day).
   */
  def dailyAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      minScoreMilli: Long): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"), col(tsCol).cast("date").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type"))
    daily
      .withColumn("rn", row_number().over(w.orderBy(col("c"), col("day"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("c"))).over(w))
      .withColumn("dev", abs(col("c") - col("med")))
      .withColumn("rn2", row_number().over(w.orderBy(col("dev"), col("day"))))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev"))).over(w))
      .withColumn("score_milli",
        expr("CAST(dev * 1000 div greatest(mad, 1) AS BIGINT)"))
      .where(col("score_milli") >= minScoreMilli)
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        col("med").as("median"), col("mad"), col("score_milli"))
      .orderBy(col("event_type"), col("day"))
  }

  /**
   * Session-shape distribution: 30-min-gap (or `gapSec`) sessions folded
   * into a log2 (duration_sec, n_events) histogram — the engagement-shape
   * dashboard (bounce scans vs long reads) one level above q_sessionize's
   * per-session rows. Buckets are bit-length cells (data-independent edges,
   * stable period-over-period); all arithmetic integer-exact.
   *
   * Scale shape: one window shuffle on the user key builds sessions (the
   * same lag/gap-sum q_sessionize uses; the session agg reuses that
   * partitioning), then the histogram rollup is a |cells|-row aggregation
   * with map-side partials.
   */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gapSec: Long): DataFrame = {
    require(gapSec > 0, "gapSec must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col("tsu"))
    val sess = events.select(col(userCol), unix_micros(col(tsCol)).as("tsu"))
      .withColumn("new_s",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapSec * 1000000L
            || lag(col("tsu"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("(max(tsu) - min(tsu)) div 1000000").as("dur_sec"))
    sess
      .groupBy(length(bin(col("dur_sec") + 1)).cast("long").as("dur_bucket"),
        length(bin(col("n_events"))).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("dur_sec")).as("max_dur_sec"))
      .orderBy(col("dur_bucket"), col("len_bucket"))
  }

  /**
   * Deterministic A/B assignment + conversion lift: users are split into
   * arms A/B by the same md5 percent-bucket every split operator uses
   * (stable across runs and engines — the assignment IS the experiment
   * design, so it must be replayable), conversion = at least one `convType`
   * event, and each arm reports users, conversions, the micro-quantized
   * conversion rate, and its lift against arm A.
   *
   * Scale shape: one aggregation shuffle on the user key (per-user
   * converted flag with a map-side max partial), then a 2-row arm rollup;
   * the lift window runs on the 2-row table.
   */
  def abLift(events: DataFrame, userCol: String, typeCol: String,
      convType: String, armPct: Int = 50): DataFrame = {
    require(armPct > 0 && armPct < 100, "armPct must be in (0, 100)")
    val arms = events.select(col(userCol), col(typeCol))
      .groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(DatasetSplit.bucket(col(userCol)) < armPct, "A").otherwise("B"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_converted"))
      .withColumn("cvr_micro",
        expr("CAST(n_converted * 1000000 div n_users AS BIGINT)"))
    arms
      // no user hashing into arm A (tiny/skewed corpora) would make the
      // baseline NULL and null out every arm's lift — fail loudly instead
      .withColumn("_base",
        max(when(col("variant") === "A", col("cvr_micro")))
          .over(Window.partitionBy()))
      .withColumn("lift_vs_a_micro",
        when(col("_base").isNull,
          raise_error(lit("abLift: arm A is empty — no baseline to lift against"))
            .cast("long"))
          .otherwise(col("cvr_micro") - col("_base")))
      .drop("_base")
      .orderBy(col("variant"))
  }

  /**
   * Per-user inter-arrival BURSTINESS — the bot/automation signal next to
   * the session dashboard: consecutive-event gaps (whole seconds) profiled
   * as the integer-exact FANO FACTOR of the gap distribution
   * (variance-to-mean, milli-quantized). Poisson arrivals sit at ~1000;
   * schedulers and scrapers run metronomic (≪ 1000); bursty crawl-and-
   * sleep automation runs ≫ 1000. sqrt-free ON PURPOSE: the coefficient
   * of variation needs a square root whose last-ulp behavior differs
   * across engines, while the Fano factor is a pure integer ratio every
   * engine replays exactly.
   *
   * Output, one row per user with ≥ 2 events: (userCol, n_gaps,
   * sum_gap_sec, fano_milli) with fano = (n·Σg² − (Σg)²)·1000 div (n·Σg);
   * users whose events all share one instant (Σg = 0) emit 0. Equal-ts
   * ties are harmless: the gap MULTISET is invariant under tie order
   * (ties contribute zero gaps wherever they land).
   *
   * Scale shape: ONE exchange on the user key — the lag window and the
   * per-user aggregation share its partitioning; Σg² accumulates in
   * DECIMAL(38,0) (month-long gaps square to ~7e12; 1e5 of them approach
   * int64, and the n·Σg² product would silently wrap it).
   */
  def burstiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("_tsu"))
    events.select(col(userCol), unix_micros(col(tsCol)).as("_tsu"))
      .withColumn("_prev", lag(col("_tsu"), 1).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("_g", expr("CAST((_tsu - _prev) div 1000000 AS BIGINT)"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_g")).as("sum_gap_sec"),
        sum(col("_g").cast("decimal(38,0)") * col("_g")).as("_s2"))
      .select(col(userCol), col("n_gaps"), col("sum_gap_sec"),
        when(col("sum_gap_sec") === 0L, lit(0L))
          .otherwise(expr(
            """CAST((CAST(n_gaps AS DECIMAL(38,0)) * _s2 -
              |       CAST(sum_gap_sec AS DECIMAL(38,0)) * sum_gap_sec) * 1000
              |  div (CAST(n_gaps AS DECIMAL(38,0)) * sum_gap_sec) AS BIGINT)""".stripMargin))
          .as("fano_milli"))
      .orderBy(col(userCol))
  }

  /**
   * APPROXIMATE weekly DAU/WAU stickiness via HyperLogLog registers — the
   * 100 TB twin of the exact query. The exact form pays two full
   * distinct-user shuffles (every (week, day, user) row moves — measured
   * 25.5× wall at 100× data, the heaviest non-output-bound soak point);
   * this one shuffles at most `HllM` register rows per (week, day) and per
   * week after map-side partial max — telemetry-priced, constant per-key
   * state, same dashboard.
   *
   * Error envelope: ±1.04/√64 ≈ 13% per estimate at the default register
   * count (monitoring-grade; see `Sketches.HllM` to trade memory for
   * precision), and it holds down to SMALL counts too: raw estimates in
   * HLL's biased small-range regime (≤ 2.5·m) switch to linear counting
   * over the empty registers (`Sketches.HllLinearTable`), so a sparse day
   * with 1 distinct user estimates 1, not ~45. All register arithmetic is
   * integer/bit-exact, so the estimate replays bit-for-bit in any engine;
   * determinism is NOT sacrificed for approximation.
   *
   * Output: (week, sum_daily_actives_est, wau_est, stickiness_micro_est).
   */
  def stickinessHll(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val base = events.select(
      date_trunc("week", col(tsCol)).cast("date").as("week"),
      col(tsCol).cast("date").as("day"),
      col(userCol).cast("string").as("_u"))
    val dayEst = Sketches.hllProfileBy(
        Sketches.hllRegistersBy(base, Seq("week", "day"), "_u"), Seq("week", "day"))
      .groupBy(col("week"))
      .agg(sum(col("est_distinct")).as("sum_daily_actives_est"))
    val weekEst = Sketches.hllProfileBy(
        Sketches.hllRegistersBy(base, Seq("week"), "_u"), Seq("week"))
      .select(col("week"), col("est_distinct").as("wau_est"))
    dayEst.join(weekEst, Seq("week"))
      .withColumn("stickiness_micro_est",
        expr("CAST(sum_daily_actives_est * 1000000 div (wau_est * 7) AS BIGINT)"))
      .orderBy(col("week"))
  }

  /**
   * Hour-of-week SEASONALITY profile per event type: for each (type, day-of-
   * week) cell, total events, the peak hour of day (ties → smallest hour)
   * with its count, and the cell's share of the type's weekly volume in
   * milli. The capacity-planning / anomaly-baseline dashboard: dow/hour
   * shapes are what daily-anomaly scores (cf. `dailyAnomalies`) get judged
   * against, and a flat profile on human-attributed traffic is itself a bot
   * signal (cf. `burstiness` for the per-user view).
   *
   * dow is 0=Sunday..6 (Spark's dayofweek-1 == DuckDB/Postgres dow), hour
   * 0..23 in session time. Scale shape: one hash-agg keyed by (type, dow,
   * hour) — at most |types|·168 rows after map-side partial aggregation —
   * then in-bounded-table folds: the peak is max(struct(count, 23-hour))
   * (no second shuffle; the agg re-keys within the same 168-row group), the
   * weekly share a 7-row window. Pure integer arithmetic.
   */
  def seasonality(events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    seasonalityFromCells(seasonalityCells(events, typeCol, tsCol))

  /**
   * The heavy half of [[seasonality]], STREAMING-SAFE by construction: the
   * (event_type, dow, hour) cell counts are a plain hash aggregation, so
   * the same code runs on a readStream (update/complete mode) with state
   * bounded at one count per occupied cell — ≤ |types|·168 rows no matter
   * how many events flow. The peak/share fold ([[seasonalityFromCells]])
   * then runs over the materialized cell table; batch ≡ stream because
   * count is a commutative fold (StreamingEventParitySpec crosses a
   * micro-batch boundary mid-cell to prove it).
   */
  def seasonalityCells(events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    events.select(col(typeCol).as("event_type"),
        (dayofweek(col(tsCol)) - 1).cast("long").as("dow"),
        hour(col(tsCol)).cast("long").as("hr"))
      .groupBy(col("event_type"), col("dow"), col("hr"))
      .agg(count(lit(1)).as("c"))

  /**
   * Activity CONCENTRATION (Lorenz deciles): rank users by event count and
   * report, per decile of the user population, how much of total activity
   * it carries — "the top 10% of users generate X‰ of events", the
   * abuse-triage and capacity-skew dashboard (cf. [[burstiness]] for the
   * per-user shape; this is the population shape). Integer-exact: decile =
   * (rank−1)·10 div n_users, shares in milli, cumulative share via a
   * 10-row window.
   *
   * Scale shape: events collapse to the per-user count table (one user-key
   * hash-agg); the only corpus-sized step after that is the global rank of
   * the USER table, which exact population ranking irreducibly needs. Note
   * that `row_number` over an unpartitioned window executes in a SINGLE
   * partition in Spark — |users| rows funnel through one task — so at true
   * scale the bounded-histogram twin [[concentrationProfile]] (no rank at
   * all) is the production form; this exact-decile operator is the
   * correctness witness. Ties rank by user id asc, so the decile
   * assignment is fully deterministic.
   */
  def userConcentration(events: DataFrame, userCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events.groupBy(col(userCol).as("_u")).agg(count(lit(1)).as("c"))
    val totals = perUser.agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"))
    perUser
      .withColumn("rk", row_number().over(Window.orderBy(col("c").desc, col("_u").asc)))
      .crossJoin(broadcast(totals))
      // rk is IntegerType (row_number), so the *10 must stage through BIGINT
      // or the product wraps past ~214M users (round-11 advice fix)
      .withColumn("decile", expr("CAST((CAST(rk AS BIGINT) - 1) * 10 div n_users AS BIGINT)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("c")).as("sum_events"),
        expr("CAST(sum(c) * 1000 div max(n_events) AS BIGINT)").as("share_milli"))
      .withColumn("cum_share_milli",
        sum(col("share_milli")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .orderBy(col("decile"))
  }

  /**
   * The 100 TB twin of [[userConcentration]]: the FULL Lorenz profile from
   * the activity-count HISTOGRAM — no rank of the user table at all. Users
   * collapse to (events_per_user → n_users) — bounded by the number of
   * DISTINCT activity levels, which is at most the max per-user count and
   * in practice a few thousand — and the cumulative shares (heaviest
   * users first) are windows over that bounded profile. Population deciles
   * read off the cum_users_milli column; the per-level resolution is
   * strictly richer than the decile fold. The only difference from the
   * exact decile operator is presentation: deciles that SPLIT inside a
   * tied activity level cannot be separated (the decile form breaks such
   * ties by user id; at scale that distinction is noise).
   *
   * Cross-products stage through DECIMAL(38,0) (c·n_users wraps int64 at
   * 1e9-event users × 1e10-user levels). Output per activity level c,
   * descending: (c, n_users, cum_users, cum_users_milli, cum_events_milli).
   */
  def concentrationProfile(events: DataFrame, userCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events.groupBy(col(userCol).as("_u")).agg(count(lit(1)).as("c"))
    val profile = perUser.groupBy(col("c")).agg(count(lit(1)).as("n_users"))
      .withColumn("lvl_events", expr("CAST(c AS DECIMAL(38,0)) * n_users"))
    val totals = profile.agg(sum(col("n_users")).as("total_users"),
      sum(col("lvl_events")).as("total_events"))
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    profile.crossJoin(broadcast(totals))
      .withColumn("cum_users", sum(col("n_users")).over(w).cast("long"))
      .withColumn("cum_events", sum(col("lvl_events")).over(w))
      .select(col("c"), col("n_users"), col("cum_users"),
        expr("CAST(CAST(cum_users AS DECIMAL(38,0)) * 1000 div total_users AS BIGINT)")
          .as("cum_users_milli"),
        expr("CAST(cum_events * 1000 div total_events AS BIGINT)").as("cum_events_milli"))
      .orderBy(col("c").desc)
  }

  /**
   * Weekly CHURN: per week, the distinct active users, how many of them
   * return the following week, and churn_milli = (wau − retained)·1000 div
   * wau. Weeks whose successor week is absent from the data entirely are
   * dropped (the trailing edge has no churn ground truth yet). The
   * forward-looking complement of the [[retention]] triangle's cohort view.
   *
   * Scale shape: events collapse to the distinct (week, user) table (one
   * hash-agg); retention is a self-join on (user, week+7d) — user-keyed,
   * co-partitioned with the distinct agg; everything else runs on
   * |weeks|-sized frames. Pure integer output.
   */
  def weeklyChurn(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wu = events.select(
        date_trunc("week", col(tsCol)).cast("date").as("week"),
        col(userCol).as("_u"))
      .distinct()
    val nxt = wu.select(col("week").as("_nw"), col("_u"))
    val retained = wu.join(nxt,
        nxt("_u") === wu("_u") && nxt("_nw") === date_add(wu("week"), 7))
      .groupBy(wu("week").as("week")).agg(count(lit(1)).as("retained"))
    val wau = wu.groupBy(col("week")).agg(count(lit(1)).as("wau"))
    val weeks = wu.select(col("week")).distinct()
    wau
      .join(weeks.select(col("week").as("_succ")),
        col("_succ") === date_add(col("week"), 7), "left_semi")
      .join(retained, Seq("week"), "left")
      .withColumn("retained", coalesce(col("retained"), lit(0L)))
      .withColumn("churn_milli", expr("CAST((wau - retained) * 1000 div wau AS BIGINT)"))
      .select(col("week"), col("wau"), col("retained"), col("churn_milli"))
      .orderBy(col("week"))
  }

  /** The bounded-profile fold of [[seasonality]]: peak hour, counts, weekly
    * share from a (event_type, dow, hr, c) cell table. */
  def seasonalityFromCells(byHour: DataFrame): DataFrame = {
    byHour
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("c")).as("n_events"),
        max(struct(col("c").as("c"), (lit(23L) - col("hr")).as("nh"))).as("pk"))
      .withColumn("peak_hour", lit(23L) - col("pk.nh"))
      .withColumn("peak_n", col("pk.c"))
      .withColumn("share_milli",
        expr("CAST(n_events * 1000 div (sum(n_events) OVER (PARTITION BY event_type)) AS BIGINT)"))
      .select(col("event_type"), col("dow"), col("n_events"),
        col("peak_hour"), col("peak_n"), col("share_milli"))
      .orderBy(col("event_type"), col("dow"))
  }
}
