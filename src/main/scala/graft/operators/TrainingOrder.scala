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

  /**
   * Materialize a mixing allocation (`DatasetSplit.mixAllocation` output or
   * any (group, alloc) table) into exactly `alloc` rows per group by
   * REPEATING documents — the "Wikipedia × 4" upsampling step of every
   * published mixture recipe. Per group: every doc gets `alloc div n` full
   * copies, and the `alloc mod n` remainder goes to the docs with the
   * LOWEST md5(id) — deterministic, auditable, growth-stable.
   *
   * Scale shape: one window per group (rank by hash — same shape as the
   * per-source cap), a broadcast join against the |groups|-row allocation,
   * and a map-side `sequence` explode. Output rows = Σ alloc exactly.
   * Output: (group, id, copy) with copy in 1..copies(doc).
   */
  def upsampleToAllocation(
      df: DataFrame, idCol: String, groupCol: String,
      alloc: DataFrame): DataFrame = {
    val n = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val a = alloc.select(col(groupCol), col("alloc")).join(n, Seq(groupCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("_", col(idCol))), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("_r", row_number().over(w).cast("long"))
      .join(broadcast(a), Seq(groupCol))
      .withColumn("_copies",
        expr("alloc div _n") +
          when(col("_r") <= pmod(col("alloc"), col("_n")), 1L).otherwise(0L))
      .where(col("_copies") > 0L)
      .select(col(groupCol), col(idCol),
        explode(sequence(lit(1L), col("_copies"))).as("copy"))
  }

  /**
   * Deterministic proportional interleave of an upsampled mixture into ONE
   * training order: group g's r-th row (rank by md5(id, copy) within g)
   * lands at pos_key = ((2r−1)·T) div (2·|g|) — the Bresenham schedule
   * that spaces each group's rows evenly over [0, T), so a consumer
   * reading in (pos_key, group, rank) order sees every source at its
   * allocated proportion CONTINUOUSLY, not in source-sized runs (the
   * failure mode that makes loss curves sawtooth).
   *
   * Scale shape: one window per group + a broadcast of the |groups|-row
   * size table; nothing global. BIGINT-exact while T·2·max_rank < 2^63,
   * i.e. interleave units up to ~1.5e9 rows — for a 1e11-doc corpus,
   * compose with `shuffleShards` and interleave within each shard.
   * Output: (pos_key, group, id, copy, rank_in_group).
   */
  def interleave(
      upsampled: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val sizes = upsampled.groupBy(col(groupCol)).agg(count(lit(1)).as("_g"))
      .withColumn("_t", sum(col("_g")).over(Window.partitionBy())) // |groups| rows
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("_", col(idCol), col("copy"))), col(idCol), col("copy"))
    upsampled
      .withColumn("_r", row_number().over(w).cast("long"))
      .join(broadcast(sizes), Seq(groupCol))
      .select(
        expr("((2 * _r - 1) * _t) div (2 * _g)").as("pos_key"),
        col(groupCol), col(idCol), col("copy"), col("_r").as("rank_in_group"))
  }

  /**
   * Curriculum order: stage the corpus easy→hard by a caller-supplied
   * integer difficulty `levelCol` (length, quality tier, perplexity bucket —
   * any map-side score). Within a level docs are sharded by md5 for
   * parallelism and pseudorandomly ordered; a consumer reads levels
   * ascending, shards within a level in shard order, each shard
   * sequentially — the concatenation is the curriculum (Bengio et al.
   * 2009's staged regime, determinized).
   *
   * Scale shape: level and shard are both map-side projections (no shuffle
   * to DECIDE placement); the only exchange is the level×shard window's
   * hash partitioning, and every window sort is shard-local. Output:
   * (level, shard, id, pos).
   */
  def curriculum(
      df: DataFrame, idCol: String, levelCol: String, nShards: Int): DataFrame = {
    require(nShards > 0)
    val e = df.select(col(levelCol).cast("long").as("level"), col(idCol))
      .withColumn("_skey", md5(concat_ws("_", col(idCol), lit("cur"))))
      .withColumn("shard",
        conv(substring(col("_skey"), 1, 8), 16, 10).cast("long") % nShards)
    val w = Window.partitionBy(col("level"), col("shard"))
      .orderBy(col("_skey"), col(idCol))
    e.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("level"), col("shard"), col(idCol), col("pos"))
  }

  /**
   * Length-bucketed batch assembly — the dynamic-batching step that keeps
   * padding waste down: docs are bucketed by the BIT LENGTH of their weight
   * (log2 token count: within a bucket no doc is more than 2× any other, so
   * padding to the batch max wastes < 50% worst-case, ~15% typical), then
   * grouped into fixed `batchSize` batches in md5 order (pseudorandom
   * within bucket — no length-sorted curriculum leaking into batch order).
   *
   * Scale shape: bucket is a map-side projection; the per-bucket window is
   * the only exchange; batch assignment is integer arithmetic on the rank.
   * Parallelism is the bucket count — compose a (bucket, shard) key via
   * `curriculum`-style md5 sharding when one bucket dominates the corpus.
   * Output: (bucket, batch, id, weight).
   */
  def lengthBucketBatches(
      df: DataFrame, idCol: String, weightCol: String, batchSize: Int): DataFrame = {
    require(batchSize > 0)
    // bit-length bucketing is only meaningful for positive weights: 0 would
    // share bucket 1 with weight 1 and a negative weight would land in
    // bucket 64 (two's-complement bin), both silently violating the
    // "<2× spread per bucket" padding bound — fail loudly instead.
    val b = df.select(col(idCol), col(weightCol).cast("long").as("weight"))
      .withColumn("bucket",
        when(col("weight") > 0, length(bin(col("weight"))).cast("long"))
          .otherwise(raise_error(concat(
            lit("lengthBucketBatches: non-positive weight for id "),
            col(idCol).cast("string")))))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(concat_ws("_", col(idCol))), col(idCol))
    b.withColumn("_r", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(_r - 1) div $batchSize"))
      .select(col("bucket"), col("batch"), col(idCol), col("weight"))
  }
}
