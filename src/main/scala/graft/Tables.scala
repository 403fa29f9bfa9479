package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared testdata readers. The ONE place that touches session state:
 * events.parquet has shipped with two physical `ts` encodings across driver
 * testdata generations — TIMESTAMP(NANOS) (readable only as long via the
 * legacy session flag; µs resolution, so dividing to micros is lossless) and
 * native TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). The legacy flag is a
 * session conf, not a per-read option, so reading NANOS files requires the
 * session-level set; it is idempotent and additive (it only widens what the
 * reader accepts) but it IS a global side effect — which is why every query
 * family funnels through this single helper instead of setting it locally
 * (one documented footgun beats five copies).
 */
private[graft] object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to a session-TZ TIMESTAMP regardless of the
    * file's physical encoding (see object doc). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
