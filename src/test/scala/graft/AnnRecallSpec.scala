package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.sim.Similarity

/**
 * Quality guard for the approximate ANN paths: correctness oracles pin the
 * EXACT output of the fixed pipeline, but a quantizer/probe regression that
 * still produces self-consistent output would slip through. Recall against
 * the brute-force ground truth is the metric that catches it.
 *
 * Measured on seeded CLUSTERED data — the regime IVF/LSH exist for (near
 * neighbors share cells/buckets). On uniform random vectors, probing 2/32
 * cells necessarily sees ~6% of the corpus and recall is low by
 * construction, which measures the data, not the algorithm (the sf0.001
 * embeddings table measured 0.29 exactly that way).
 */
class AnnRecallSpec extends AnyFunSuite with SparkTestSession {

  private val dim = 16
  private val clusters = 16
  private val perCluster = 40

  /** 16 well-separated seeded gaussian clusters, 40 points each. */
  private def clustered = {
    import spark.implicits._
    val rng = new scala.util.Random(20260813)
    val centers = Array.fill(clusters, dim)(rng.nextGaussian() * 8.0)
    (0 until clusters * perCluster).map { i =>
      val c = centers(i % clusters)
      (i.toLong, Array.tabulate(dim)(d => (c(d) + rng.nextGaussian() * 0.4).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.select(col("qid").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
  }

  private def recallAtK(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, truth) => approx.getOrElse(q, Set.empty).intersect(truth).size }
    hits.sum.toDouble / exact.values.map(_.size).sum
  }

  test("IVF (Lloyd quantizer, nprobe=2/32) holds recall@10 >= 0.9 on clustered data") {
    val emb = clustered
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = topk(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "qid", "qv", k = 10))
    val cents = Similarity.ivfTrainKMeans(emb, "vec_id", "embedding", 32, iters = 2)
    val ivf = topk(Similarity.ivfTopKWith(cents, emb, q, "vec_id", "embedding", "qid", "qv",
      k = 10, nprobe = 2))
    val r = recallAtK(ivf, exact)
    assert(r >= 0.9, f"IVF recall@10 degraded to $r%.3f")
  }

  test("hyperplane LSH (6 planes) holds recall@10 >= 0.7 on clustered data") {
    val emb = clustered
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = topk(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "qid", "qv", k = 10))
    val lsh = topk(Similarity.lshTopK(emb, q, "vec_id", "embedding", "qid", "qv",
      k = 10, planes = 6, dim = dim))
    val r = recallAtK(lsh, exact)
    assert(r >= 0.7, f"LSH recall@10 degraded to $r%.3f")
  }
}
