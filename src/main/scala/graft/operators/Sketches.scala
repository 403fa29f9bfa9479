package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/**
 * Distributed count-min sketch over a token (or any string-keyed) stream.
 *
 * The sketch is a depth x width counter grid; item x increments cell
 * (r, h_r(x) mod width) for each of the `depth` salted hash rows. Point
 * estimates take the MIN over the item's depth cells — always an
 * overestimate, with error bounded by total_count * e / width at confidence
 * 1 - e^-depth. All integer arithmetic (salted md5-derived hashes, counts),
 * so the sketch and its estimates are bit-exact under any partitioning and
 * replayable in any engine.
 *
 * Scale shape: construction is ONE hash aggregation — rows explode to
 * `depth` cells map-side, partial counts combine per partition, and the
 * shuffle carries at most depth x width rows per partition regardless of
 * corpus size. The finished sketch is depth x width rows total (KBs), so
 * estimation broadcasts it; probes never shuffle.
 */
object Sketches {

  /** Salted cell column for hash row `r`: stableHash("r:" + item) mod width. */
  def cmsCell(item: Column, r: Int, width: Int): Column =
    TextFunctions.stableHash(concat(lit(s"$r:"), item)) % width

  /** Build the sketch: one row per non-empty cell, (r, c, cnt). */
  def countMin(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1)
    items.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsCell(col(itemCol), r, width).as("c"))): _*)).as("_cell"))
      .groupBy(col("_cell.r").as("r"), col("_cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point estimates for `probes` (distinct values in `itemCol`) against a
   * built sketch: min over the item's depth cells. The sketch side is
   * broadcast; absent cells count 0 (an item never inserted estimates 0
   * only if ALL its cells are empty — the standard CMS semantics).
   */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = probes.select(col(itemCol),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), cmsCell(col(itemCol), r, width).as("c"))): _*)).as("_cell"))
      .select(col(itemCol), col("_cell.r").as("r"), col("_cell.c").as("c"))
    cells.join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  // ---------------------------------------------------------------------
  // HyperLogLog: approximate distinct counting whose shuffle is m rows per
  // group, not one row per distinct item. At 100 TB a per-source
  // count(DISTINCT content) shuffles every distinct hash; the HLL register
  // table shuffles at most `m` (bucket, max_rho) rows per source after
  // map-side partial max — telemetry-priced dedup-rate monitoring.
  //
  // All integer arithmetic: bucket and rho come from independent salted
  // md5-derived 31-bit hashes, rho via binary-string length (no libm), so
  // the register table and the scaled harmonic sum are bit-exact under any
  // partitioning and replayable in any engine. Only the final estimate
  // divides once in IEEE double (identical expression both sides).
  // ---------------------------------------------------------------------

  /** Register count per group. 64 keeps the relative error ~1.04/sqrt(64)
    * = 13% — monitoring-grade; raise to 4096 for 1.6%. */
  val HllM = 64

  /** alpha_64 from Flajolet et al. 2007, Fig. 3. */
  val HllAlpha = 0.709

  /** Raw estimates at or below 2.5·m sit in HLL's biased small-range
    * regime (1 distinct user would estimate ~45 at m=64); below it the
    * standard correction is linear counting over the EMPTY registers. */
  val HllSmallRangeCutoff: Long = (2.5 * HllM).toLong

  /** Linear-counting lookup: `HllLinearTable(V-1) = round(m·ln(m/V))` for
    * V = 1..m empty registers. Precomputed to 64 integer literals so the
    * small-range branch stays bit-exact and engine-replayable (the oracle
    * SQL embeds the SAME table via [[hllLinearTableSql]] — no runtime
    * `ln` on either side). */
  val HllLinearTable: Array[Long] =
    (1 to HllM).map(v => Math.round(HllM * Math.log(HllM.toDouble / v))).toArray

  /** The table as a SQL list literal, for oracle replay. */
  def hllLinearTableSql: String = HllLinearTable.mkString("[", ", ", "]")

  /** rho: position of the first 1-bit in the 31-bit salted hash, in [1, 32]
    * (the all-zero hash maps to 32). bin() drops leading zeros in Spark and
    * DuckDB alike, so 32 - length(bin(v)) is the same integer in both. */
  private def hllRho(v: Column): Column =
    when(v === 0L, 32).otherwise(lit(32) - length(bin(v))).cast("int")

  /** Per-group register table: (groupCol, bucket, max_rho), at most m rows
    * per group. This is the mergeable sketch state — union register tables
    * from daily batches and re-max to sketch the union of the corpora. */
  def hllRegisters(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    hllRegistersBy(df, Seq(groupCol), itemCol)

  /** Multi-column-key register table (e.g. (week, day) actives). */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String], itemCol: String): DataFrame =
    df.select(groupCols.map(col) ++ Seq(
        (TextFunctions.stableHash(col(itemCol)) % HllM).as("bucket"),
        hllRho(TextFunctions.stableHash(concat(lit("rho:"), col(itemCol)))).as("rho")): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("max_rho"))

  /**
   * Distinct-count profile per group from the register table:
   * (groupCol, n_occupied, s_scaled, est_distinct). `s_scaled` is the
   * harmonic denominator scaled by 2^32 so it stays an exact BIGINT
   * (occupied register j contributes 2^(32-M_j), each empty one 2^32);
   * raw est = floor(alpha * m^2 * 2^32 / s_scaled).
   *
   * Small-range correction (round 10; r9 advice): a raw estimate at or
   * below 2.5·m with at least one empty register switches to linear
   * counting — `est = round(m·ln(m/V))` with V = empty registers — via the
   * precomputed integer table [[HllLinearTable]], so a (group) with ONE
   * distinct item estimates 1, not ~45, and the ±1.04/√m envelope holds
   * down to small cardinalities. Bit-exact: the table is 64 integer
   * literals replayed identically by the oracle.
   */
  def hllProfile(registers: DataFrame, groupCol: String): DataFrame =
    hllProfileBy(registers, Seq(groupCol))

  /** Multi-column-key profile twin of [[hllProfile]]. */
  def hllProfileBy(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val twoPow32 = 4294967296L
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_occupied"),
        sum(shiftLeftCol(lit(1L), lit(32) - col("max_rho"))).as("s_occ"))
      .select(groupCols.map(col) ++ Seq(col("n_occupied"),
        (col("s_occ") + (lit(HllM.toLong) - col("n_occupied")) * twoPow32).as("s_scaled")): _*)
      .withColumn("_raw",
        floor(lit(HllAlpha * HllM * HllM * twoPow32.toDouble) /
          col("s_scaled").cast("double")).cast("long"))
      .withColumn("est_distinct",
        when(col("n_occupied") < HllM && col("_raw") <= HllSmallRangeCutoff,
          element_at(lit(HllLinearTable), (lit(HllM) - col("n_occupied")).cast("int")))
          .otherwise(col("_raw")))
      .drop("_raw")
  }

  /** One-call convenience: registers + profile. */
  def hllDistinct(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    hllProfile(hllRegisters(df, groupCol, itemCol), groupCol)

  // ---------------------------------------------------------------------
  // Bloom filter: fixed-memory set membership. The k bit positions of an
  // item are salted md5-derived hashes mod m — deterministic and engine-
  // replayable, unlike hash implementations private to one engine. The
  // built bitset is m/8 bytes FOREVER, regardless of how many items went
  // in — the constant-memory alternative to broadcasting an ever-growing
  // distinct-value list.
  // ---------------------------------------------------------------------

  /** The k salted bit positions of an item, each in [0, m). */
  def bloomPositions(item: Column, k: Int, m: Int): Column =
    array((0 until k).map(i =>
      TextFunctions.stableHash(concat(lit(s"b$i:"), item)) % m): _*)

  /** Build the bitset from `items` as packed 64-bit words. The position set
    * is at most m distinct values (m/8 bytes of driver state — a bounded
    * model fetch, exactly like a trained quantizer), never the item count. */
  def bloomBuild(items: DataFrame, itemCol: String, k: Int, m: Int): Array[Long] = {
    require(m % 64 == 0, "m must pack into 64-bit words")
    val words = new Array[Long](m / 64)
    items.select(explode(bloomPositions(col(itemCol), k, m)).as("p")).distinct()
      .collect().foreach { r =>
        val p = r.getLong(0)
        words((p / 64).toInt) |= (1L << (p % 64).toInt)
      }
    words
  }

  /** might-contain probe against a built bitset literal: true iff all k of
    * the item's bits are set. Pure per-row projection (streaming-natural;
    * codegen keeps the word lookups in the fused stage). */
  def bloomMightContain(item: Column, words: Array[Long], k: Int, m: Int): Column =
    (0 until k).map { i =>
      val p = TextFunctions.stableHash(concat(lit(s"b$i:"), item)) % m
      (element_at(lit(words), (p / 64).cast("int") + 1)
        .bitwiseAND(shiftLeftCol(lit(1L), p % 64)) =!= 0L)
    }.reduce(_ && _)

  /** functions.shiftleft only takes a literal Int shift; the catalyst
    * ShiftLeft expression takes any column — bridge to it directly. */
  private def shiftLeftCol(v: Column, by: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.graftbridge.Bridge.expression(v),
        org.apache.spark.sql.graftbridge.Bridge.expression(by.cast("int"))))
}
