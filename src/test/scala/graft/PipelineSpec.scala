package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ExactDedup, MinHashLSH, SimHash}
import graft.filter.SparkTestSession
import graft.sim.Similarity
import graft.text.TextFunctions

class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away to the hills"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away to the"),
      (3L, "completely different content about spark query engines and distributed joins"),
      (4L, "the quick brown fox jumps over the lazy dog and runs far away to the hills")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    import spark.implicits._
    val g = ExactDedup.groups(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dup = g.where(col("n_copies") === 2).select("canonical_id").as[Long].head()
    assert(dup == 1L)
    assert(ExactDedup.dedup(docs, "doc_id", "text").count() == 3)
  }

  test("minhash LSH finds the truncated near-duplicate, not unrelated docs") {
    import spark.implicits._
    val nd = new MinHashLSH(32, 8, 3).nearDuplicates(docs, "doc_id", "text", 0.4)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 2L)), s"expected (1,2) in $nd")
    assert(nd.contains((1L, 4L))) // identical docs
    assert(!nd.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs at hamming 0, near-dup within 3") {
    import spark.implicits._
    val nd = SimHash.nearDuplicates(docs, "doc_id", "text", 3)
      .select($"a", $"b", $"hamming").as[(Long, Long, Long)].collect()
    val byPair = nd.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.get((1L, 4L)).contains(0L))
  }

  test("cosine similarity: identity and orthogonality") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 1L).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val top = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", "qid", "qv", k = 2)
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toMap
    assert(top(3L) == 1.0) // same direction
    assert(top(2L) == 0.0) // orthogonal
  }

  test("language id picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "xyzzy qwerty zzz")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextFunctions.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("fingerprint is order-sensitive; token sets are not") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = df.select(TextFunctions.fingerprint($"text")).as[Long].collect()
    assert(fps(0) != fps(1))
    val sets = df.select(array_sort(TextFunctions.tokenHashSet($"text"))).as[Array[Long]].collect()
    assert(sets(0).sameElements(sets(1)))
  }

  test("k-means quantizer keeps k fixed and reduces quantization distortion") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val k = 8
    val sampled = Similarity.ivfTrain(emb, "vec_id", "v", k)
    val trained = Similarity.ivfTrainKMeans(emb, "vec_id", "v", k, iters = 3)
    assert(trained.length == k)

    def meanSim(cents: Array[(Long, Array[Double])]): Double = emb
      .withColumn("cell", Similarity.ivfCellExpr(col("v"), cents))
      .join(cents.toSeq.map { case (c, arr) => (c, arr.toSeq) }.toDF("cell", "cvec"), Seq("cell"))
      .select(avg(Similarity.cosine(col("v"), col("cvec").cast("array<double>"))))
      .head().getDouble(0)

    val (before, after) = (meanSim(sampled), meanSim(trained))
    assert(after >= before - 1e-9, s"k-means did not improve assignment: $before -> $after")
  }

  test("brute-force ANN plan broadcasts the query side (no corpus shuffle)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, Array.fill(8)(i.toFloat / 100))).toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val plan = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", "qid", "qv", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
