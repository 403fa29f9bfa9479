package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/**
 * Deterministic train/val/test assignment for training-data pipelines:
 * bucket by a stable md5-derived hash of the id, so the split is (a)
 * reproducible run-to-run and cluster-size-independent, (b) stable under
 * corpus growth (a doc's split never changes when other docs are added —
 * unlike randomSplit), and (c) replayable in any engine for auditing.
 * Map-side only: adds a column, no shuffle.
 */
object DatasetSplit {

  /** Stable percent bucket in [0, 100) from the id's md5. */
  def bucket(id: Column): Column = TextFunctions.stableHash(id.cast("string")) % 100

  /** Adds a `split` column: train/val/test by hash bucket. */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100")
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
