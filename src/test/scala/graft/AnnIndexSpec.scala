package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.sim.Similarity

/**
 * Round-11 incremental ANN index: the persisted cell-assignment table is
 * equivalent to recomputing assignments (probe ≡ full rebuild), survives a
 * parquet round trip (the deployment shape: write once, probe every ingest
 * batch), and extends by appending the new batch's own assignments.
 */
class AnnIndexSpec extends AnyFunSuite with SparkTestSession {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("parquet round-tripped index probe equals full rebuild") {
    val history = emb.where(col("vec_id") % 3 =!= 0)
    val batch = emb.where(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cents = Similarity.ivfTrainKMeans(history, "vec_id", "embedding", 16, iters = 1)

    val dir = Files.createTempDirectory("annidx").toString
    Similarity.ivfIndex(cents, history, "vec_id", "embedding")
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val probed = Similarity.ivfProbeIndex(cents, index, batch,
        "vec_id", "qid", "qv", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val full = Similarity.ivfTopKWith(cents, history, batch,
        "vec_id", "embedding", "qid", "qv", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(probed.nonEmpty && probed.sameElements(full))
  }

  test("index extends by appending the new batch's assignments") {
    val history = emb.where(col("vec_id") % 3 =!= 0)
    val batch = emb.where(col("vec_id") % 3 === 0)
    val cents = Similarity.ivfTrainKMeans(history, "vec_id", "embedding", 16, iters = 1)
    // appending assign(batch) to assign(history) == assign(history ∪ batch):
    // assignment is per-row against the FROZEN quantizer, so the index is a
    // pure union — the property that makes daily ingest O(batch), not O(all)
    val a = Similarity.ivfIndex(cents, history, "vec_id", "embedding")
      .unionByName(Similarity.ivfIndex(cents, batch, "vec_id", "embedding"))
    val b = Similarity.ivfIndex(cents, emb, "vec_id", "embedding")
    assert(a.select("vec_id", "cell").except(b.select("vec_id", "cell")).count() == 0L)
    assert(b.select("vec_id", "cell").except(a.select("vec_id", "cell")).count() == 0L)
    assert(a.count() == b.count())
  }
}
