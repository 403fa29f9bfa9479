package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Distributed as-of join: for every left row, attach the most recent right
 * row with rightTime <= leftTime within the same key ("backward" direction)
 * — the temporal-alignment primitive Spark lacks natively.
 *
 * Physical strategy (the scalable pattern, not a window cross-join): both
 * sides union into one relation tagged with a side marker, hash-partition by
 * key, external-sort within partitions by (key, time, side) — right rows
 * sort BEFORE left rows at equal timestamps, giving inclusive semantics —
 * then a single linear scan carries the latest right row per key. One
 * shuffle each side, no per-key materialization, spill-safe: at 100 TB this
 * is a merge-join-shaped plan rather than an O(n·m) range join.
 */
object AsOfJoin {

  /**
   * @param left      left (probe) side
   * @param right     right (reference) side
   * @param leftKey   join key column on the left
   * @param rightKey  join key column on the right
   * @param leftTime  event time on the left (any orderable type)
   * @param rightTime event time on the right
   * @return left rows with right columns appended (null when no prior right
   *         row exists); right columns keep their names.
   *
   * Null-time semantics (match DuckDB ASOF): right rows with a null time are
   * ignored — they can never be "the most recent" match; left rows with a
   * null time sort before every timed right row and so get null right
   * columns.
   */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val lSchema = left.schema
    val rSchema = right.schema
    require(lSchema(leftTime).dataType == rSchema(rightTime).dataType,
      "as-of time columns must share a type")

    // unified layout: key, time, side, left columns (_l*), right columns (_r*)
    val nL = lSchema.length
    val nR = rSchema.length
    val unifiedSchema = StructType(
      Seq(
        lSchema(leftKey).copy(name = "_k"),
        lSchema(leftTime).copy(name = "_t"),
        StructField("_side", IntegerType, nullable = false)) ++
        lSchema.zipWithIndex.map { case (f, i) => f.copy(name = s"_l$i", nullable = true) } ++
        rSchema.zipWithIndex.map { case (f, i) => f.copy(name = s"_r$i", nullable = true) })

    val lPart = left.select(
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side")) ++
        lSchema.zipWithIndex.map { case (f, i) => col(f.name).as(s"_l$i") } ++
        rSchema.zipWithIndex.map { case (f, i) => lit(null).cast(f.dataType).as(s"_r$i") }: _*)
    val rPart = right.where(col(rightTime).isNotNull).select(
      Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        lSchema.zipWithIndex.map { case (f, i) => lit(null).cast(f.dataType).as(s"_l$i") } ++
        rSchema.zipWithIndex.map { case (f, i) => col(f.name).as(s"_r$i") }: _*)

    implicit val enc = RowEncoder.encoderFor(unifiedSchema)
    val joined = lPart.unionByName(rPart)
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_side"))
      .as[Row](enc)
      .mapPartitions { rows =>
        var curKey: Any = null
        var lastRight: Array[Any] = null
        rows.flatMap { row =>
          val k = row.get(0)
          if (k != curKey) { curKey = k; lastRight = null }
          if (row.getInt(2) == 0) {
            // right row: remember its payload
            lastRight = Array.tabulate(nR)(i => row.get(3 + nL + i))
            None
          } else {
            val leftVals = Array.tabulate(nL)(i => row.get(3 + i))
            val rightVals = if (lastRight != null) lastRight else Array.fill[Any](nR)(null)
            Some(Row.fromSeq(Seq(k, row.get(1), 1) ++ leftVals ++ rightVals))
          }
        }
      }(enc)

    joined.select(
      lSchema.zipWithIndex.map { case (f, i) => col(s"_l$i").as(f.name) } ++
        rSchema.zipWithIndex.map { case (f, i) => col(s"_r$i").as(f.name) }: _*)
  }
}
