package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{DatasetSplit, TrainingOrder}

/**
 * Round-8 robustness specs for the advisor findings: budget allocation in
 * the documented multi-billion-token regime (the round-7 BIGINT multiply
 * overflowed there), degenerate group sizes, and the length-bucket weight
 * domain guard.
 */
class Round8OpsSpec extends AnyFunSuite with SparkTestSession {

  test("budget allocation is exact at a 10B-token target over billion-token groups") {
    import spark.implicits._
    // the cookbook regime the round-7 scaladoc claimed but never tested:
    // totalTarget * weight_micro here is ~5e17 * 1e10 — far past int64;
    // the DECIMAL(38,0) path must reproduce exact BigInt arithmetic
    val groups = Seq(("web", 3_000_000_000L), ("code", 800_000_000L),
      ("books", 120_000_000L), ("wiki", 40_000_000L))
    val total = 10_000_000_000L
    val out = DatasetSplit.budgetAllocation(groups.toDF("g", "n"), "g", "n",
        totalTarget = total, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("raw_alloc"), r.getAs[Long]("alloc"),
          r.getAs[Long]("epochs_micro"), r.getAs[Long]("shortfall"))).toMap
    // BigInt replay of the documented formula
    val w = groups.map { case (g, n) =>
      g -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }.toMap
    val wt = w.values.sum
    groups.foreach { case (g, n) =>
      val raw = (BigInt(total) * w(g) / wt).toLong
      val alloc = math.min(raw, n * 4)
      val ep = (BigInt(alloc) * 1000000 / BigInt(n)).toLong
      assert(out(g) == ((raw, alloc, ep, raw - alloc)), s"group $g")
    }
    // the sqrt temper plus cap spends nearly the whole budget here
    assert(out.values.map(_._2).sum <= total)
  }

  test("budget allocation: zero-size group gets zero weight/alloc/epochs, no error") {
    import spark.implicits._
    val out = DatasetSplit.budgetAllocation(
        Seq(("a", 0L), ("b", 10000L)).toDF("g", "n"), "g", "n",
        totalTarget = 100000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("weight_micro"), r.getAs[Long]("alloc"),
          r.getAs[Long]("epochs_micro"))).toMap
    assert(out("a") == ((0L, 0L, 0L)))
    assert(out("b")._2 > 0L)
  }

  test("budget allocation: negative size fails loudly with the group named") {
    import spark.implicits._
    val df = Seq(("bad", -5L)).toDF("g", "n")
    val e = intercept[Exception] {
      DatasetSplit.budgetAllocation(df, "g", "n", 1000L, 4).collect()
    }
    assert(e.getMessage.contains("negative") || e.getMessage.contains("bad"),
      e.getMessage)
  }

  test("mix allocation survives a petascale target without overflow") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (s"s${i % 7}", i)).toDF("src", "id")
    val total = 5_000_000_000_000_000L // 5e15 "tokens"
    val out = DatasetSplit.mixAllocation(df, "src", total).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum <= total)
    assert(out.forall(_.getAs[Long]("alloc") > 0L))
  }

  test("length-bucket batches: non-positive weight fails loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      TrainingOrder.lengthBucketBatches(
        Seq((1L, 10L), (2L, 0L)).toDF("id", "w"), "id", "w", batchSize = 4).collect()
    }
    assert(e.getMessage.contains("non-positive"), e.getMessage)
  }
}
