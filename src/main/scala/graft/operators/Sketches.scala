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
}
