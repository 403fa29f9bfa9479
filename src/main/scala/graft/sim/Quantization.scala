package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Int8 scalar quantization of embedding columns — the compression step
 * that makes billion-vector ANN affordable: 4x smaller than float32 (and
 * SIMD-dot-product-friendly on real hardware), at a recall cost the
 * [[QuantizationSpec]] measures rather than assumes.
 *
 * Each vector is scaled by its own max-|x| ("per-vector absmax", the
 * standard inference-quantization scheme) and each element mapped to
 * round(127 * x / scale), implemented as floor(v + 0.5) so the rounding
 * rule is a single IEEE-exact primitive replayable bit-for-bit in any
 * engine — no libm, no banker's-rounding ambiguity.
 *
 * Scale shape: a pure map-side projection over the embedding table — no
 * shuffle, no driver state, whole-stage codegen over array transforms.
 * At 100 TB the quantized table is what you persist and scan for ANN;
 * the float originals stay cold.
 */
object Quantization {

  /** round-half-up(127 * v / scale) as exact IEEE ops. */
  private def q(v: Column, scale: Column): Column =
    floor((v.cast("double") * lit(127.0)) / scale + lit(0.5)).cast("long")

  /** Adds `scale` (double, per-vector absmax) and `qvec` (array<long> of
    * int8-range codes) next to the embedding. Zero vectors quantize to
    * zeros with scale 0. */
  def withInt8(df: DataFrame, vecCol: String): DataFrame = {
    val emb = col(vecCol)
    df.withColumn("scale", array_max(transform(emb, v => abs(v.cast("double")))))
      .withColumn("qvec",
        when(col("scale") > 0, transform(emb, v => q(v, col("scale"))))
          .otherwise(transform(emb, v => lit(0L))))
  }

  /** Compact audit profile of the quantization, integer-exact for oracle
    * replay: dimension, code checksum, saturated-code count, and the scale
    * floored to micro units. */
  def int8Profile(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val qd = withInt8(df, vecCol)
    qd.select(
      col(idCol),
      size(col(vecCol)).cast("long").as("dim"),
      aggregate(col("qvec"), lit(0L), (acc, v) => acc + v).as("checksum"),
      size(filter(col("qvec"), v => abs(v) === 127)).cast("long").as("n_sat"),
      floor(col("scale") * lit(1000000.0)).cast("long").as("scale_micro"))
  }

  /** Dequantized cosine similarity between a quantized vector and a float
    * query — what an int8 ANN serving path computes. qvec dequantizes to
    * (code * scale / 127). */
  def dequantCosine(qvec: Column, scale: Column, query: Column): Column = {
    val deq = transform(qvec, c => (c.cast("double") * scale) / lit(127.0))
    Similarity.cosine(deq, query)
  }
}
