package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media ride through the pipeline as opaque
 * `binary` columns plus typed metadata, partition-friendly and spillable.
 * The actual decoders (image/audio/video libs) are NOT available in this
 * environment, so `decodeStub` derives deterministic fake features — the
 * Spark-side contract (schema, batching via mapPartitions, partition
 * pruning on metadata) is real and tested.
 *
 * At 100 TB: binaries stay columnar in parquet, metadata predicates push
 * down to the scan (so decode only touches selected rows), and the decode
 * stage is a narrow mapPartitions (no shuffle).
 */
object Multimodal {

  /** Typed record for a decoded media batch row. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      header: Array[Byte], // first bytes, e.g. magic number
      width: Int, // stub-derived
      height: Int,
      feature: Array[Float]) // stub embedding

  /** Attach a binary payload column derived from text (stand-in for real
    * media bytes; deterministic). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /**
   * Deterministic decode STUB standing in for an image decoder: real
   * implementations replace `fakeDecode` only — batching shape, schema and
   * the narrow-plan contract stay identical.
   */
  def decodeStub(df: DataFrame, idCol: String, payloadCol: String)(implicit dummy: DummyImplicit): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          fakeDecode(id, bytes)
        }
      }
  }

  /** ??? in spirit: a deterministic fake decoder. A real deployment links an
    * image/audio codec here; everything else is production plumbing. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val header = bytes.take(4)
    // pretend the first bytes encode dimensions
    val w = 64 + (if (n > 0) (bytes(0) & 0x7f) else 0)
    val h = 64 + (if (n > 1) (bytes(1) & 0x7f) else 0)
    val feat = Array.tabulate(8)(i => (if (n > i) (bytes(i % n) & 0xff) else 0).toFloat / 255f)
    MediaFeatures(id, n.toLong, header, w, h, feat)
  }
}
