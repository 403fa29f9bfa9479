package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{DatasetSplit, TrainingOrder}

/**
 * Behavior + plan-shape specs for the round-7 assembly wave: curriculum
 * staging, length-bucketed batches, the repetition-capped budget, and the
 * kNN label vote. Semantics pinned on constructed inputs; exact outputs on
 * the real tables are pinned by the DuckDB oracles.
 */
class Round7OpsSpec extends AnyFunSuite with SparkTestSession {

  test("curriculum: one placement per doc, contiguous positions per (level, shard)") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, i % 3)).toDF("doc_id", "level")
    val out = TrainingOrder.curriculum(docs, "doc_id", "level", nShards = 4).cache()
    try {
      assert(out.count() == 300L)
      assert(out.select("doc_id").distinct().count() == 300L)
      // levels survive the staging untouched
      assert(out.where(col("level") =!= pmod(col("doc_id"), lit(3))).count() == 0L)
      // per (level, shard): pos is exactly 1..n
      val bad = out.groupBy("level", "shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .where(col("mx") =!= col("n") || col("mn") =!= 1L).count()
      assert(bad == 0L)
      // order is pseudorandom within a level, not id order: some shard must
      // hold a doc whose pos rank disagrees with its id rank
      val disagree = out.where(col("level") === 0 && col("shard") === 0)
        .select(col("doc_id"), col("pos")).collect().sortBy(_.getLong(1))
        .map(_.getLong(0))
      assert(!disagree.sameElements(disagree.sorted), "md5 order degenerated to id order")
    } finally out.unpersist()
  }

  test("length-bucket batches: bit-length buckets bound padding, batches fill to size") {
    import spark.implicits._
    // weights 1..100: bucket b holds weights in [2^(b-1), 2^b)
    val docs = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val out = TrainingOrder.lengthBucketBatches(docs, "id", "w", batchSize = 8).cache()
    try {
      assert(out.count() == 100L)
      // bucket = bit length of the weight
      assert(out.where(col("bucket") =!=
        length(bin(col("weight"))).cast("long")).count() == 0L)
      // within a bucket no doc is 2x+ another: max < 2 * min
      val spread = out.groupBy("bucket")
        .agg(max("weight").as("mx"), min("weight").as("mn"))
        .where(col("mx") >= col("mn") * 2).count()
      assert(spread == 0L)
      // every batch except a bucket's last carries exactly batchSize docs
      val sizes = out.groupBy("bucket", "batch").agg(count(lit(1)).as("n"))
      val lastBatch = sizes.groupBy("bucket").agg(max("batch").as("last"))
      val short = sizes.join(lastBatch, Seq("bucket"))
        .where(col("batch") =!= col("last") && col("n") =!= 8L).count()
      assert(short == 0L)
    } finally out.unpersist()
  }

  test("budget allocation caps repetition at maxEpochs and surfaces the shortfall") {
    import spark.implicits._
    // tiny corpus, huge budget: every group would overshoot without the cap
    val sizes = Seq(("a", 100L), ("b", 10000L)).toDF("g", "n")
    val out = DatasetSplit.budgetAllocation(sizes, "g", "n", totalTarget = 1000000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("raw_alloc"), r.getAs[Long]("alloc"),
          r.getAs[Long]("epochs_micro"), r.getAs[Long]("shortfall"))).toMap
    // group a: cap = 400 << its sqrt share of 1M; clamped, shortfall visible
    assert(out("a")._2 == 400L, out("a").toString)
    assert(out("a")._3 == 4000000L) // exactly 4 epochs, in ppm
    assert(out("a")._4 == out("a")._1 - 400L && out("a")._4 > 0L)
    // allocations never exceed raw shares; epochs never exceed the cap
    out.values.foreach { case (raw, alloc, ep, short) =>
      assert(alloc <= raw && ep <= 4000000L && short == raw - alloc)
    }
  }

  test("budget allocation leaves small shares uncapped (epochs < maxEpochs)") {
    import spark.implicits._
    val sizes = Seq(("a", 100000L), ("b", 100000L)).toDF("g", "n")
    val out = DatasetSplit.budgetAllocation(sizes, "g", "n", totalTarget = 100000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("epochs_micro")).toMap
    // each gets ~half an epoch: far under the cap, zero shortfall
    assert(out.values.forall(ep => ep < 1000000L && ep > 400000L), out.toString)
  }

  test("knn label vote predicts the query's own cluster on a separable space") {
    import spark.implicits._
    // two tight clusters on orthogonal axes; 64-dim to match the real table
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(64)(d => (if (d == axis) 1.0 else 0.0) + (if (d == 63) jitter else 0.0))
        .map(_.toFloat)
    val rows = (0L until 20L).map { i =>
      val axis = if (i % 2 == 0) 0 else 1
      (i, vec(axis, 0.001 * i), axis.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_vote").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = AssemblyQueries.queries("q_knn_label_vote")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.length == 20)
    out.foreach { case (qid, (truth, pred, correct)) =>
      assert(pred == truth && correct == 1L, s"qid $qid predicted $pred, truth $truth")
    }
  }

  test("plan shape: curriculum/pad-batch windows shuffle once on their group keys") {
    val dir = "/root/testdata/sf0.001"
    val pc = SparkEntry.queries("q_curriculum")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pc.contains("hashpartitioning(level"), pc.take(3000))
    assert(!pc.contains("CartesianProduct"), pc.take(3000))
    val pb = SparkEntry.queries("q_pad_batches")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pb.contains("hashpartitioning(bucket"), pb.take(3000))
  }

  test("plan shape: knn label vote never sort-merge-joins; corpus stays map-side") {
    val p = SparkEntry.queries("q_knn_label_vote")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("hashpartitioning(vec_id"), p.take(3000))
  }
}
