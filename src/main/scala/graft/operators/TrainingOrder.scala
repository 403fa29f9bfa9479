package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic global training-order shuffle — the last step before a
 * corpus becomes a training stream. A good order is (a) pseudorandom (no
 * source/time runs: a shard must not be "all of crawl X"), (b) DIFFERENT
 * each epoch, (c) reproducible bit-for-bit from (id, epoch) alone so any
 * worker can recompute its slice without coordination.
 *
 * The classic trap is `ORDER BY rand()` + global row_number — one
 * partition sorts the world. Here order is hash-defined and shard-local:
 * shard = top md5 bits of (id, epoch) mod nShards (map-side, no shuffle to
 * decide placement), position = rank of the md5 key WITHIN the shard (one
 * window per (epoch, shard) — Spark runs all epoch×shard windows as a
 * single exchange + per-partition sort). Readers consume shards in id
 * order and each shard sequentially; the concatenation (shard, pos) IS the
 * epoch's global order. Shard sizes concentrate tightly around n/nShards
 * (binomial), matching how training shards are actually laid out.
 */
object TrainingOrder {

  /** md5-derived 32-bit key of (id, epoch) — the per-epoch shuffle seed. */
  private def shuffleKey(idCol: Column, epoch: Column): Column =
    md5(concat_ws("_", idCol, epoch))

  /**
   * Assign every (doc, epoch) a (shard, pos): `epochs` independent
   * pseudorandom permutations of `df`, each laid out as `nShards`
   * near-equal sequential shards. Output: (epoch, shard, id, pos).
   */
  def shuffleShards(
      df: DataFrame, idCol: String, epochs: Int, nShards: Int): DataFrame = {
    val e = df.select(col(idCol))
      .withColumn("epoch", explode(array((1 to epochs).map(lit): _*)))
      .withColumn("_skey", shuffleKey(col(idCol), col("epoch")))
      .withColumn("shard",
        conv(substring(col("_skey"), 1, 8), 16, 10).cast("long") % nShards)
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("_skey"), col(idCol))
    e.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col(idCol), col("pos"))
  }
}
