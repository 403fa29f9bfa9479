package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sequence packing: assign documents to fixed-budget training
 * shards. Docs are laid out in id order within each partition-column group;
 * a doc starting at running offset `o` (sum of earlier docs' weights) lands
 * in shard `o div capacity`. A doc may straddle a boundary — its shard is
 * where it STARTS — so every shard except a group's last carries weight in
 * (capacity - max_doc_weight, capacity + max_doc_weight): the straddler
 * consumes budget from the next bucket, never creates a gap. Pure integer
 * arithmetic over a window cumsum: reproducible, growth-stable within a
 * group, replayable for audits.
 *
 * Scale shape: ONE shuffle (the window's hash partitioning on the group
 * columns) and an in-partition sort — the external-sort-backed window never
 * materializes a group in memory. Parallelism is the number of groups, so
 * callers pack within (split, hash-bucket) style groups sized to taste —
 * the assignment inside a group is sequential BY SPEC (greedy packing), not
 * by implementation accident.
 */
object ShardPacking {

  /** Adds `shard` (0-based within the group) to each row. */
  def withShard(
      df: DataFrame, idCol: String, weightCol: String,
      groupCols: Seq[String], capacity: Long): DataFrame = {
    require(capacity > 0)
    require(groupCols.nonEmpty, "pack within groups; a single global group serializes the corpus")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = Iterator.from(0).map(i => s"_off$i").find(!df.columns.contains(_)).get
    df.withColumn(off, (sum(col(weightCol)).over(w) - col(weightCol)).cast("long"))
      .withColumn("shard", expr(s"$off div $capacity"))
      .drop(off)
  }
}
