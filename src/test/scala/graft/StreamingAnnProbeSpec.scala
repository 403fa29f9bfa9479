package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.sim.Similarity

/**
 * Streaming twin of the incremental ANN probe (round 12, VERDICT item 7):
 * the index is a static parquet table, a stream of query vectors scores
 * against it per micro-batch — exactly the q_dedup_incremental daily-ingest
 * discipline applied to embeddings. The probe's per-query top-k is a rank
 * window, which streaming DataFrames can't host directly, so the production
 * shape is foreachBatch: each micro-batch is a bounded frame probed with the
 * SAME batch operator (stream-static join on cell, window inside the batch).
 * Per-query results are complete within the query's own micro-batch (one
 * row per query, candidates come only from the static side), so streamed
 * results across ANY micro-batch split must equal the one-shot batch probe
 * of the union — both for the fixed-k probe and the k ∝ N hier probe.
 */
class StreamingAnnProbeSpec extends AnyFunSuite with SparkTestSession {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def roundTripIndex(df: DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("annstream").toString
    df.write.partitionBy("cell").mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def runStreamed(
      probe: DataFrame => DataFrame,
      queries: Seq[(Long, Array[Double])]): Seq[(Long, Long, Double, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Double])]
    val acc = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long)]()
    val sq = stream.toDS().toDF("qid", "qv").writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        acc ++= probe(batchDf.toDF())
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        ()
      }.start()
    // three uneven micro-batches so boundaries land mid-stream
    val (a, rest) = queries.splitAt(math.max(1, queries.size / 3))
    val (b, c) = rest.splitAt(math.max(1, rest.size / 2))
    stream.addData(a); sq.processAllAvailable()
    stream.addData(b); sq.processAllAvailable()
    stream.addData(c); sq.processAllAvailable()
    sq.stop()
    acc.toSeq
  }

  private def queriesSeq: Seq[(Long, Array[Double])] = {
    import spark.implicits._
    emb.where(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
  }

  test("fixed-k probe: streamed micro-batches == one-shot batch probe") {
    val history = emb.where(col("vec_id") % 3 =!= 0)
    val cents = Similarity.ivfTrainKMeans(history, "vec_id", "embedding", 16, iters = 1)
    val index = roundTripIndex(Similarity.ivfIndex(cents, history, "vec_id", "embedding"))
    val qs = queriesSeq
    val batchDf = {
      import spark.implicits._
      qs.toDF("qid", "qv")
    }
    val expected = Similarity.ivfProbeIndex(cents, index, batchDf,
        "vec_id", "qid", "qv", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = runStreamed(
      b => Similarity.ivfProbeIndex(cents, index, b, "vec_id", "qid", "qv", k = 5, nprobe = 2),
      qs)
    assert(streamed.nonEmpty && streamed.size == expected.size)
    assert(streamed.toSet == expected.toSet)
  }

  test("k-scaled hier probe: streamed micro-batches == one-shot batch probe") {
    val history = emb.where(col("vec_id") % 3 =!= 0)
    val cents = Similarity.ivfTrainKMeans(history, "vec_id", "embedding", 21, iters = 1)
    val index = roundTripIndex(
      Similarity.ivfIndex(cents, history, "vec_id", "embedding", hierAssign = true))
    val qs = queriesSeq
    val batchDf = {
      import spark.implicits._
      qs.toDF("qid", "qv")
    }
    val expected = Similarity.ivfProbeIndexHier(cents, index, batchDf,
        "vec_id", "qid", "qv", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = runStreamed(
      b => Similarity.ivfProbeIndexHier(cents, index, b, "vec_id", "qid", "qv", k = 8),
      qs)
    assert(streamed.nonEmpty && streamed.size == expected.size)
    assert(streamed.toSet == expected.toSet)
  }
}
