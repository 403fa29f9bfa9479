package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.sim.Similarity

/**
 * Guards the property the scaled-integer Lloyd mean exists for: the IVF
 * quantizer must be BIT-identical regardless of how the corpus is
 * partitioned or how the shuffle interleaves partial aggregates. A float-sum
 * mean would differ in the last ulps between 2 and 32 partitions; the
 * floor(v*2^16+0.5)-summed-as-long design (Similarity.ivfTrainKMeans) must
 * not. This is what makes a 100 TB training run replayable and auditable on
 * any cluster size.
 */
class KMeansDeterminismSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def train(shufflePartitions: Int, inputPartitions: Int): Array[(Long, Array[Double])] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(inputPartitions)
      Similarity.ivfTrainKMeans(emb, "vec_id", "embedding", k = 8, iters = 3)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("Lloyd quantizer is bit-identical across shuffle/input partitionings") {
    val a = train(shufflePartitions = 2, inputPartitions = 1)
    val b = train(shufflePartitions = 32, inputPartitions = 7)
    assert(a.length == b.length)
    for (((cidA, vA), (cidB, vB)) <- a.zip(b)) {
      assert(cidA == cidB)
      assert(vA.length == vB.length)
      // byte-level equality: compare raw IEEE-754 bit patterns, not ==
      val bitsA = vA.map(java.lang.Double.doubleToRawLongBits)
      val bitsB = vB.map(java.lang.Double.doubleToRawLongBits)
      assert(java.util.Arrays.equals(bitsA, bitsB),
        s"cell $cidA centroids differ across partitionings: ${vA.take(4).mkString(",")} vs ${vB.take(4).mkString(",")}")
    }
  }

  test("quantizer centroids actually moved from the sampled warm init") {
    val sampled = Similarity.ivfTrain(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", k = 8)
    val trained = train(shufflePartitions = 4, inputPartitions = 4)
    val moved = sampled.map(_._2).zip(trained.map(_._2))
      .count { case (s, t) => !java.util.Arrays.equals(s, t) }
    assert(moved > 0, "Lloyd iterations were a no-op on real data")
  }
}
