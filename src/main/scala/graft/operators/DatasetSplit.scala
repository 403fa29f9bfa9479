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

  /** Caps each group's contribution at `k` rows — corpus curation's
    * "no source may dominate" step — by keeping the k rows with the
    * LOWEST stable id-hash (a deterministic uniform sample per group,
    * reproducible and replayable, unlike orderBy(rand())). One shuffle on
    * the group key; rank ties cannot occur (hash ties break by id). */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextFunctions.stableHash(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }
}
