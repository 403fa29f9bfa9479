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

  test("hier probe: cell-consistent candidates, well-formed ranks, parquet-stable") {
    // the k ∝ N scale path: BOTH sides route through the O(√k) hier
    // assignment, so every returned neighbor must live in exactly the cell
    // its query routed to, ranks must be a clean per-query 1..<=k ladder by
    // (sim desc, id asc), and the result must survive an index round trip
    import graft.sim.Similarity.{ivfCellExprHier, ivfIndex, ivfProbeIndexHier, ivfTrainKMeans}
    val history = emb.where(col("vec_id") % 3 =!= 0)
    val batch = emb.where(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cents = ivfTrainKMeans(history, "vec_id", "embedding", 16, iters = 1, hierAssign = true)
    val index = ivfIndex(cents, history, "vec_id", "embedding", hierAssign = true)
    val got = ivfProbeIndexHier(cents, index, batch, "vec_id", "qid", "qv", k = 5)

    val qCells = batch
      .withColumn("qcell", ivfCellExprHier(col("qv").cast("array<double>"), cents))
      .select(col("qid"), col("qcell"))
    val iCells = index.select(col("vec_id"), col("cell").as("icell"))
    val joined = got.join(qCells, Seq("qid")).join(iCells, Seq("vec_id"))
    assert(joined.where(col("qcell") =!= col("icell")).count() == 0L,
      "a neighbor came from outside the query's routed cell")

    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to g.length).toSeq, s"rank ladder broken for $q")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2); case _ => true
      }, s"rank order violates (sim desc, id asc) for $q")
      assert(g.length <= 5)
    }

    val dir = java.nio.file.Files.createTempDirectory("annidxh").toString
    index.write.partitionBy("cell").mode("overwrite").parquet(dir)
    val probed2 = ivfProbeIndexHier(cents, spark.read.parquet(dir), batch,
        "vec_id", "qid", "qv", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(probed2.sameElements(rows.sortBy(t => (t._1, t._4))))
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
