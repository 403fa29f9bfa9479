package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.VectorExpressions

/**
 * Batch ≡ streaming for the wave-9 scoring stages. Both follow the
 * train-batch / score-stream deployment shape (like the NB classifier and
 * the OOV vocab): the bounded model — centroid set, top component — is
 * trained once on a batch corpus, then the per-row kernel scores an
 * unbounded stream statelessly.
 */
class StreamingWave9ParitySpec extends AnyFunSuite with SparkTestSession {

  test("silhouette scoring under fixed centroids is a stateless map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Array(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)))
    def score(df: org.apache.spark.sql.DataFrame) = {
      val v = col("embedding").cast("array<double>")
      df.select(col("vec_id"),
        VectorExpressions.nearestCentroid(v, cents).as("cell"),
        VectorExpressions.centroidSilhouette(v, cents).as("s_micro"))
    }
    val rows = Seq(
      (0L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (1L, Seq(0.1f, 0.9f, 0.0f, 0.0f)),
      (2L, Seq(0.7f, 0.7f, 0.0f, 0.0f))) // equidistant -> s = 0
    val expected = score(rows.toDF("vec_id", "embedding"))
      .as[(Long, Long, Long)].collect().sorted
    assert(expected.find(_._1 == 2L).exists(_._3 == 0L), expected.toSeq)

    val stream = MemoryStream[(Long, Seq[Float])]
    val sq = score(stream.toDS().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("sil_parity")
      .outputMode("append").start()
    stream.addData(rows.take(2)); sq.processAllAvailable()
    stream.addData(rows.drop(2)); sq.processAllAvailable()
    val streamed = spark.table("sil_parity")
      .as[(Long, Long, Long)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }

  test("pca projection under a fixed component is a stateless map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // component trained once (here: a known axis at 1e6 fixed point)
    val vfix = Seq(750000L, 1000000L, 0L, 0L)
    def score(df: org.apache.spark.sql.DataFrame) = {
      val q = transform(col("embedding").cast("array<double>"),
        x => round(x * 1000).cast("long"))
      df.select(col("vec_id"),
        aggregate(zip_with(q, typedLit(vfix), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("p"))
    }
    val rows = Seq(
      (0L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),   // p = 600*75e4 + 800*1e6
      (1L, Seq(-0.6f, -0.8f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))   // orthogonal -> 0
    val expected = score(rows.toDF("vec_id", "embedding"))
      .as[(Long, Long)].collect().sorted
    assert(expected.toSeq ==
      Seq((0L, 1250000000L), (1L, -1250000000L), (2L, 0L)), expected.toSeq)

    val stream = MemoryStream[(Long, Seq[Float])]
    val sq = score(stream.toDS().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("pca_parity")
      .outputMode("append").start()
    stream.addData(rows.take(1)); sq.processAllAvailable()
    stream.addData(rows.drop(1)); sq.processAllAvailable()
    val streamed = spark.table("pca_parity").as[(Long, Long)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }
}
