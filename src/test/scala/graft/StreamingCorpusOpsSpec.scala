package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.{Decontamination, Sketches}

/**
 * Batch ≡ streaming for the round-5 corpus operators:
 *  - the count-min sketch is an incremental aggregate — streamed counts
 *    after any number of micro-batches equal the batch sketch of the union;
 *  - decontamination against a driver-held eval gram set is a STATELESS
 *    MAP (`overlapMap`), so the same code runs unchanged on a stream and
 *    agrees with the aggregating batch form (`overlap`) row for row.
 */
class StreamingCorpusOpsSpec extends AnyFunSuite with SparkTestSession {

  test("count-min sketch accumulates incrementally on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq.fill(30)("alpha") ++ Seq.fill(10)("beta") ++ (1 to 50).map(i => s"n$i")
    val batch2 = Seq.fill(20)("alpha") ++ (51 to 90).map(i => s"n$i")

    val expected = Sketches.countMin((batch1 ++ batch2).toDF("tok"), "tok", 4, 64)
      .as[(Int, Long, Long)].collect().toSet

    val stream = MemoryStream[String]
    val sq = Sketches.countMin(stream.toDS().toDF("tok"), "tok", 4, 64)
      .writeStream.format("memory").queryName("cms_parity").outputMode("complete").start()
    stream.addData(batch1)
    sq.processAllAvailable()
    stream.addData(batch2)
    sq.processAllAvailable()
    val streamed = spark.table("cms_parity").as[(Int, Long, Long)].collect().toSet
    sq.stop()

    assert(streamed == expected)
  }

  test("map-only decontamination equals the aggregating form and streams unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq((100L, "the secret benchmark answer key sequence here")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a clean document with plenty of ordinary words inside it"),
      (2L, "contains the secret benchmark answer key sequence here verbatim"),
      (3L, "tiny"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")

    val viaAgg = Decontamination.overlap(docs, evalDocs, "doc_id", "text", 5)
      .as[(Long, Long, Long, Boolean)].collect().sorted
    val grams = Decontamination.evalGrams(evalDocs, "text", 5)
    val viaMap = Decontamination.overlapMap(docs, grams, "doc_id", "text", 5)
      .as[(Long, Long, Long, Boolean)].collect().sorted
    assert(viaAgg.toSeq == viaMap.toSeq, s"agg=${viaAgg.toSeq} map=${viaMap.toSeq}")
    assert(viaMap.find(_._1 == 2L).get._4) // the contaminated doc is flagged

    val stream = MemoryStream[(Long, String)]
    val sq = Decontamination.overlapMap(stream.toDS().toDF("doc_id", "text"), grams, "doc_id", "text", 5)
      .writeStream.format("memory").queryName("deco_parity").outputMode("append").start()
    stream.addData(Seq((1L, "a clean document with plenty of ordinary words inside it")))
    sq.processAllAvailable()
    stream.addData(Seq((2L, "contains the secret benchmark answer key sequence here verbatim")))
    sq.processAllAvailable()
    val streamed = spark.table("deco_parity").as[(Long, Long, Long, Boolean)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == viaMap.filter(r => r._1 == 1L || r._1 == 2L).toSeq)
  }

  test("subword counting is a stateless map: batch ≡ stream under a fixed trained kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train once on a batch corpus — the kernel is then broadcast state,
    // applicable to any stream (the NB-classifier deployment shape)
    val train = Seq.tabulate(6)(i => (i.toLong, s"banana bandana cabana $i"))
      .toDF("doc_id", "text")
    val k = graft.text.SubwordTokenizer.kernel(
      graft.text.SubwordTokenizer.trainVocab(train, "text", 4, 64, 2L), 4)

    val batchRows = Seq((10L, "banana bandana"), (11L, "panama canal"), (12L, ""))
    val batch = graft.text.SubwordTokenizer.withSubwordCount(
        batchRows.toDF("doc_id", "text"), "text", k, "n_subwords")
      .select("doc_id", "n_subwords").as[(Long, Long)].collect().sorted

    val stream = MemoryStream[(Long, String)]
    val sq = graft.text.SubwordTokenizer.withSubwordCount(
        stream.toDS().toDF("doc_id", "text"), "text", k, "n_subwords")
      .select("doc_id", "n_subwords")
      .writeStream.format("memory").queryName("subword_parity")
      .outputMode("append").start()
    stream.addData(batchRows.take(1)); sq.processAllAvailable()
    stream.addData(batchRows.drop(1)); sq.processAllAvailable()
    val streamed = spark.table("subword_parity").as[(Long, Long)].collect().sorted
    sq.stop()
    assert(streamed.toSeq == batch.toSeq, s"stream=${streamed.toSeq} batch=${batch.toSeq}")
  }

  test("blocklist counting is a stateless map: batch ≡ stream under a fixed automaton") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kern = graft.text.Blocklist.kernel(Seq("on", "ion", "zz"))
    val rows = Seq((1L, "onion station"), (2L, "no hits"), (3L, "zzz onon"))

    def counted(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      graft.text.Blocklist.counts(col("text"), kern).as("c"))

    val batch = counted(rows.toDF("doc_id", "text"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq

    val stream = MemoryStream[(Long, String)]
    val sq = counted(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("blocklist_parity")
      .outputMode("append").start()
    stream.addData(rows.take(1)); sq.processAllAvailable()
    stream.addData(rows.drop(1)); sq.processAllAvailable()
    val streamed = spark.table("blocklist_parity")
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    sq.stop()
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.head._2 == Seq(3L, 2L, 0L))
  }

  test("moments power sums accumulate incrementally on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(("s", 2L), ("s", 4L), ("t", 5L), ("s", 6L), ("t", 7L))

    val batch = graft.operators.CorpusStats
      .moments(rows.toDF("src", "len"), "src", "len")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

    // streaming form: the same power-sum aggregation in complete mode
    // (sums are associative+commutative, so partial fold order is free);
    // the quantized projections run on the aggregated frame
    val stream = MemoryStream[(String, Long)]
    val x = col("len").cast("long")
    val sq = stream.toDS().toDF("src", "len")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"),
        sum(x.cast("decimal(38,0)") * x * x * x).as("_s4d"))
      .writeStream.format("memory").queryName("moments_parity")
      .outputMode("complete").start()
    stream.addData(rows.take(2)); sq.processAllAvailable()
    stream.addData(rows.drop(2)); sq.processAllAvailable()
    val streamed = spark.table("moments_parity")
      .select(col("src"), col("n"), col("s1"), col("s2"), col("s3"),
        expr("CAST(_s4d div 1000000 AS BIGINT)").as("s4_q6"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").as("mean_micro"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * s2 -
                      CAST(s1 AS DECIMAL(38,0)) * s1) * 1000000
                 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("var_micro"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    sq.stop()
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("hll registers accumulate incrementally on a stream (stickiness twin)") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two micro-batches of (user, ts) activity; the register table is a
    // pure (key, bucket) -> max(rho) aggregate, so streamed max after any
    // micro-batch split equals the batch registers of the union — the
    // streaming path of q_stickiness_hll (registers stream; the tiny
    // profile/ratio read runs on the register table downstream)
    def ev(u: Int, day: Int): (String, Timestamp) =
      (s"user_$u", new Timestamp(1700000000000L + day * 86400000L))
    val batch1 = (0 until 150).map(u => ev(u, u % 3))
    val batch2 = (100 until 250).map(u => ev(u, u % 5))

    def prep(df: org.apache.spark.sql.DataFrame) = df
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        col("ts").cast("date").as("day"), col("user").as("_u"))

    val all = (batch1 ++ batch2).toDF("user", "ts")
    val batchRegs = Sketches
      .hllRegistersBy(prep(all), Seq("week", "day"), "_u")
      .as[(java.sql.Date, java.sql.Date, Long, Int)].collect().toSet

    val stream = MemoryStream[(String, Timestamp)]
    val sq = Sketches
      .hllRegistersBy(prep(stream.toDS().toDF("user", "ts")), Seq("week", "day"), "_u")
      .writeStream.format("memory").queryName("hll_parity")
      .outputMode("complete").start()
    stream.addData(batch1)
    sq.processAllAvailable()
    stream.addData(batch2)
    sq.processAllAvailable()
    val streamed = spark.table("hll_parity")
      .as[(java.sql.Date, java.sql.Date, Long, Int)].collect().toSet
    sq.stop()
    assert(streamed == batchRegs)

    // the downstream profile over the streamed register table matches the
    // one-call batch estimate exactly
    val estBatch = Sketches.hllProfileBy(
        Sketches.hllRegistersBy(prep(all), Seq("week", "day"), "_u"),
        Seq("week", "day"))
      .select(col("day"), col("est_distinct"))
      .as[(java.sql.Date, Long)].collect().toSet
    val estStream = Sketches.hllProfileBy(
        spark.table("hll_parity"), Seq("week", "day"))
      .select(col("day"), col("est_distinct"))
      .as[(java.sql.Date, Long)].collect().toSet
    assert(estStream == estBatch)
  }

  test("BPE apply batch ≡ stream: merge table broadcast, pure projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.text.BpeTrainer
    val corpus = Seq(
      (1L, "the lowest newer lower west western er ne"),
      (2L, "newest lowest widest wider low new est"),
      (3L, "ester tester wetter letter newer lower"),
      (4L, "west vest rest nest jest best chest")).toDF("doc_id", "text")
    // TRAIN batch-side: the merge table is the bounded tokenizer artifact
    val (merges, words) = BpeTrainer.train(corpus, "text", nMerges = 4, minPairCount = 2L)
    assert(merges.nonEmpty)
    // batch reference: the word-table join form (q_bpe_segment's shape)
    val viaJoin = BpeTrainer.segmentCounts(corpus, "doc_id", "text", words)
      .as[(Long, Long, Long)].collect().toSet
    // map-side twin on the SAME batch frame must agree row for row (all
    // words were seen at train time, no empty docs in the fixture)
    val viaMap = BpeTrainer
      .segmentCountsMapSide(corpus, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaMap == viaJoin, s"map=$viaMap join=$viaJoin")
    // stream the same docs in two micro-batches: a pure projection needs
    // no state and emits identical per-doc rows in append mode
    val stream = MemoryStream[(Long, String)]
    val sq = BpeTrainer
      .segmentCountsMapSide(stream.toDS().toDF("doc_id", "text"), "doc_id", "text", merges)
      .writeStream.format("memory").queryName("bpe_apply_parity")
      .outputMode("append").start()
    val rows = corpus.as[(Long, String)].collect()
    stream.addData(rows.take(2).toSeq)
    sq.processAllAvailable()
    stream.addData(rows.drop(2).toSeq)
    sq.processAllAvailable()
    val streamed = spark.table("bpe_apply_parity")
      .as[(Long, Long, Long)].collect().toSet
    sq.stop()
    assert(streamed == viaJoin, s"stream=$streamed batch=$viaJoin")
    // OOV contract: unseen words count at their char-fold length
    val oov = BpeTrainer.segmentCountsMapSide(
      Seq((9L, "zzz qqq")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().head
    assert(oov == ((9L, 2L, 6L)), s"oov=$oov")
  }

  test("incremental novelty runs as a STREAM-STATIC join and equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    // the history gram table is the STATIC side (the persisted store); the
    // ingest batch is the stream — the exact deployment shape
    val history = CorpusStats.gramTable(
      Seq((0L, "a b c d e f")).toDF("doc_id", "text"), "text", n = 5)
    val ingest = Seq(
      (10L, "a b c d e f"),    // fully seen -> 0
      (11L, "p q r s t u"),    // fully novel -> 1000
      (12L, "a b c d e zz"))   // half -> 500
    val batch = CorpusStats.noveltyAgainst(
        ingest.toDF("doc_id", "text"), history, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    val stream = MemoryStream[(Long, String)]
    val sq = CorpusStats.noveltyAgainst(
        stream.toDS().toDF("doc_id", "text"), history, "doc_id", "text", n = 5)
      .writeStream.format("memory").queryName("novelty_parity")
      .outputMode("complete").start()
    try {
      stream.addData(ingest.take(1))
      sq.processAllAvailable()
      stream.addData(ingest.drop(1))
      sq.processAllAvailable()
      val streamed = spark.table("novelty_parity")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch.map(r => r._1 -> r._4).toMap ==
        Map(10L -> 0L, 11L -> 1000L, 12L -> 500L))
    } finally sq.stop()
  }

  test("unicode text path is stateless-map streaming-safe (nfc/script/tokens)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.text.UnicodeText
    // NFC + script ID + token stats are pure projections: the same Column
    // expressions run unchanged on a readStream in append mode, and the
    // streamed rows equal the batch projection of the union (the ingest-
    // time multilingual triage shape: normalize -> route by script)
    val rows = Seq(
      (1L, "résumé data"),            // NFD -> folds under NFC
      (2L, "Привет мир"),
      (3L, "世界模型"))
    def project(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      md5(UnicodeText.nfc(col("text"))).as("nfc_md5"),
      UnicodeText.dominantScript(UnicodeText.scriptCounts(col("text"))).as("script"),
      graft.functions.UnicodeExpressions.uTokenStats(col("text"))(0).as("n_tokens"))
    val batch = project(rows.toDF("doc_id", "text"))
      .as[(Long, String, String, Long)].collect().sorted.toSeq

    val stream = MemoryStream[(Long, String)]
    val sq = project(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("unicode_parity")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(1)); sq.processAllAvailable()
      stream.addData(rows.drop(1)); sq.processAllAvailable()
      val streamed = spark.table("unicode_parity")
        .as[(Long, String, String, Long)].collect().sorted.toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      val byId = batch.map(r => r._1 -> r._3).toMap
      assert(byId == Map(1L -> "latn", 2L -> "cyrl", 3L -> "hani"))
    } finally sq.stop()
  }
}
