package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed point-in-interval (range) join. Spark plans a bare
 * `t BETWEEN start AND end` join as BroadcastNestedLoopJoin — O(|points| x
 * |intervals|) work that falls over once neither side broadcasts. This
 * operator makes the range predicate EQUI-joinable: each interval explodes
 * into the `bucketWidth`-sized buckets it covers (len/width + 1 rows), each
 * point maps to exactly ONE bucket, and the join runs as a hash/sort-merge
 * equi-join on the bucket key with the exact range check as a residual
 * filter. One shuffle of each side on the bucket key; no nested loop.
 *
 * `bucketWidth` tunes replication: intervals replicate ceil(len/width)+1
 * times, points never replicate. Pick width ~ the typical interval length
 * (replication ~2x) — the classic interval-bucketing trade-off.
 *
 * Works on any LONG coordinates (epoch days/seconds/micros, integer keys);
 * callers convert timestamps once — integer bucket arithmetic is exact and
 * engine-replayable.
 */
object RangeJoin {

  /** Inner-join `points` to every interval containing them:
    * point t in [start, end], both inclusive. Returns point columns +
    * interval columns (bucket column dropped). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      tCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val bkt = Iterator.from(0).map(i => s"_rjb$i")
      .find(n => !points.columns.contains(n) && !intervals.columns.contains(n)).get
    val iv = intervals.withColumn(bkt,
      explode(sequence(expr(s"$startCol div $bucketWidth"), expr(s"$endCol div $bucketWidth"))))
    val pt = points.withColumn(bkt, expr(s"$tCol div $bucketWidth"))
    pt.join(iv, Seq(bkt))
      .where(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop(bkt)
  }
}
