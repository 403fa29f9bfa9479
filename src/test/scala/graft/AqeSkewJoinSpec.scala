package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession

/**
 * The skew lever from SURVEY §4: when a join key IS hot despite salting
 * (real corpora always find a way), AQE must split the oversized partition
 * at runtime instead of stalling one task. Proves the engine's config
 * actually triggers OptimizeSkewedJoin on a constructed 100k-row hot key.
 */
class AqeSkewJoinSpec extends AnyFunSuite with SparkTestSession {

  test("AQE splits a skewed sort-merge join at runtime") {
    // isolated child session: thresholds tuned so the tiny fixture skews,
    // without perturbing parallel suites
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // one hot key with 100k fat rows, 50 normal keys with 100 each
    val left = ((1 to 100000).map(i => (0L, s"payload_left_$i" * 4)) ++
      (for (k <- 1 to 50; i <- 1 to 100) yield (k.toLong, s"p$i")))
      .toDF("key", "pl")
    val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("key", "pr")

    val joined = left.join(right, "key")
    // drive joined's OWN execution so ITS AdaptiveSparkPlan finalizes
    // (count() builds a separate aggregate query execution)
    assert(joined.queryExecution.toRdd.count() == 105000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "AQE did not mark the skewed join:\n" + plan.take(3000))
  }
}
