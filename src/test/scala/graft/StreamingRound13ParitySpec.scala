package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.UnicodeExpressions
import graft.multimodal.Multimodal
import graft.text.UnicodeText

/**
 * Batch ≡ streaming for the round-12 operators (VERDICT r12 #7). All three
 * are stateless per-row maps — the ingest-time deployment shape is
 * readStream → score → writeStream append with no state store — so the
 * parity contract is exact row equality between the batch run and the
 * MemoryStream run over the same rows, delivered across multiple batches.
 */
class StreamingRound13ParitySpec extends AnyFunSuite with SparkTestSession {

  private val texts = Seq(
    (0L, "hello streaming world"),
    (1L, "こんにちは世界"), // こんにちは世界
    (2L, "Привет мир 123"), // Привет мир
    (3L, "مرحبا بالعالم"), // مرحبا بالعالم
    (4L, ""))

  test("script-histogram language ID is a stateless streaming map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def score(df: DataFrame): DataFrame = {
      val sc = UnicodeText.scriptCounts(col("text"))
      df.withColumn("_sc", sc)
        .select(col("doc_id"), UnicodeText.dominantScript(col("_sc")).as("script"),
          col("_sc")(UnicodeText.Scripts.indexOf("latn")).as("n_latn"),
          col("_sc")(UnicodeText.Scripts.indexOf("kana")).as("n_kana"))
    }
    val expected = score(texts.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(expected.map(_._2).toSeq == Seq("latn", "kana", "cyrl", "arab", "und"),
      expected.toSeq)

    val stream = MemoryStream[(Long, String)]
    val sq = score(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("script_parity")
      .outputMode("append").start()
    stream.addData(texts.take(2)); sq.processAllAvailable()
    stream.addData(texts.drop(2)); sq.processAllAvailable()
    val streamed = spark.table("script_parity")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }

  test("unicode token stats kernel is a stateless streaming map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def score(df: DataFrame): DataFrame =
      df.select(col("doc_id"), UnicodeExpressions.uTokenStats(col("text")).as("st"))
        .select(col("doc_id"), col("st")(0).as("n_tokens"),
          col("st")(1).as("n_distinct"), col("st")(2).as("cp_len_sum"))
    val expected = score(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // CJK text splits per codepoint: 7 single-cp tokens from doc 1
    assert(expected.find(_._1 == 1L).exists(r => r._2 == 7L && r._4 == 7L), expected.toSeq)
    assert(expected.find(_._1 == 4L).exists(r => r._2 == 0L), expected.toSeq)

    val stream = MemoryStream[(Long, String)]
    val sq = score(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("utok_parity")
      .outputMode("append").start()
    stream.addData(texts.take(3)); sq.processAllAvailable()
    stream.addData(texts.drop(3)); sq.processAllAvailable()
    val streamed = spark.table("utok_parity")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }

  test("JPEG/BMP perceptual fingerprint is a stateless streaming map") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q_image_dedup_jpeg shape: per source text a mosaic BMP and a real
    // baseline JPEG of the same raster — byte-different containers, one
    // decoded image, one dHash
    val docs = Seq(
      (0L, "a streaming document with enough characters to rasterize"),
      (1L, "another, different document body so the hashes differ"))
    def fingerprints(df: DataFrame): DataFrame = {
      val bmp = Multimodal.withMosaicBmpPayload(df, "text")
        .select(col("doc_id"), col("payload"))
      val jpg = Multimodal.withJpegPayload(
          df.select((col("doc_id") + 100L).as("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("payload"))
      Multimodal.perceptualHash(bmp.unionAll(jpg), "doc_id", "payload")
    }
    val expected = fingerprints(docs.toDF("doc_id", "text"))
      .as[(Long, java.lang.Long)].collect().sortBy(_._1)
    // cross-format pair agrees, different docs differ
    val em = expected.toMap
    assert(em(0L) == em(100L) && em(1L) == em(101L) && em(0L) != em(1L), expected.toSeq)

    val stream = MemoryStream[(Long, String)]
    val sq = fingerprints(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("jpeg_phash_parity")
      .outputMode("append").start()
    stream.addData(docs.take(1)); sq.processAllAvailable()
    stream.addData(docs.drop(1)); sq.processAllAvailable()
    val streamed = spark.table("jpeg_phash_parity")
      .as[(Long, java.lang.Long)].collect().sortBy(_._1)
    sq.stop()
    assert(streamed.toSeq == expected.toSeq)
  }
}
