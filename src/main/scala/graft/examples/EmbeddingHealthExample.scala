package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.{Pca, Similarity}

/**
 * The embedding-space health check a pipeline runs BEFORE any ANN / dedup /
 * semantic stage trusts the geometry, as one runnable program:
 *
 *  1. encoder sanity — zero vectors, norm spread (q_embed_stats shape);
 *  2. anisotropy — the all-but-the-top diagnostic: top principal component
 *     and the variance share it hoards (high share ⇒ cosine is dominated by
 *     one corpus-wide direction, not semantics);
 *  3. projection mass per label — which slices load on that axis;
 *  4. cluster quality — simplified silhouette of the deterministic Lloyd
 *     quantizer (low s ⇒ the cells IVF/SemDeDup route by are boundary mush).
 *
 * Every number printed here is an operator the DuckDB gate verifies
 * value-exact; this example just chains them on real testdata.
 *
 * Usage: sbt "runMain graft.examples.EmbeddingHealthExample [sfDir]"
 */
object EmbeddingHealthExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("EmbeddingHealthExample").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()

    // 1. encoder sanity: any zero vectors? norm spread per label
    val q = transform(col("embedding").cast("array<double>"),
      x => round(x * 1000).cast("long"))
    val zeros = emb.select(
        aggregate(q, lit(0L), (a, v) => greatest(a, abs(v))).as("amax"))
      .where(col("amax") === 0L).count()
    println(s"[health] vectors: $n, zero vectors: $zeros")

    // 2. anisotropy: variance share of the dominant direction
    val (comp, lambda, trace) = Pca.topComponentVector(emb, "embedding", dim = 64)
    val sharePct = if (trace > 0) lambda * 100.0 / trace else 0.0
    println(f"[health] top-direction variance share: $sharePct%.2f%% " +
      s"(lambda_c=$lambda, trace_c=$trace)")

    // 3. which labels load on the anisotropy axis (reuse the trained
    // component — no second covariance job)
    println("[health] projection mass by label (top 5 by |mass|):")
    Pca.projectProfileWith(emb, "label", "embedding", dim = 64, comp)
      .orderBy(col("sum_abs_p").desc).limit(5).collect()
      .foreach(r => println(s"[health]   label=${r.getLong(0)} " +
        s"n=${r.getLong(1)} sum_abs_p=${r.getLong(3)}"))

    // 4. cluster quality of the quantizer ANN/SemDeDup would route by
    val sil = Similarity.silhouette(emb, "vec_id", "embedding", k = 8, iters = 2)
      .collect()
    val meanS = sil.map(_.getLong(2)).sum.toDouble /
      math.max(1L, sil.map(_.getLong(1)).sum) / 1e6
    println(f"[health] mean simplified silhouette over ${sil.length} cells: $meanS%.3f " +
      "(near 1 = well separated, near 0 = boundary mush)")

    spark.stop()
  }
}
