package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.DatasetSplit

/**
 * Batch ≡ streaming for the LLM-pipeline operators (round-4 additions),
 * extending the reference's batch≡stream discipline
 * (reference: src/main/scala/com/github/ozancicek/artan/ml/state/
 * StatefulTransformer.scala:103) to the newest operators:
 *
 *  - event sequences: the batch window-function sessionization is exactly
 *    `session_window` + sorted `collect_list` on a stream;
 *  - deterministic split: a stateless map, so the SAME code runs unchanged
 *    on a streaming DataFrame with identical assignments;
 *  - per-group cap: the batch lowest-hash selection needs the full group,
 *    so the streaming twin is admission control (first k per group) with
 *    one counter of state per group, enforced ACROSS micro-batches.
 */
class StreamingPipelineParitySpec extends AnyFunSuite with SparkTestSession {

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  test("event sequences: streaming session_window equals batch window-function sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two users, 30-min-gap sessions; gaps chosen off the exact boundary
    // (29/31 min) — batch uses gap > 30min, session_window uses >= gap
    val rows = Seq(
      ("u1", 0L, 1L, "view"), ("u1", 10L, 2L, "click"), ("u1", 39L, 3L, "view"),
      ("u1", 75L, 4L, "buy"), ("u1", 80L, 5L, "view"),
      ("u2", 5L, 6L, "view"), ("u2", 36L, 7L, "click"), ("u2", 40L, 8L, "click"),
      ("u2", 200L, 9L, "buy")
    ).map { case (u, m, id, et) => (u, ts(m), id, et) }

    def seqAgg = concat_ws(",", transform(
      array_sort(collect_list(struct(col("t"), col("event_id"), col("event_type")))),
      x => x.getField("event_type")))

    // batch: the q_event_sequences formulation (lag/sum window functions)
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val lagT = lag(unix_millis(col("t")), 1).over(w)
    val batch = rows.toDF("user_id", "t", "event_id", "event_type")
      .withColumn("new_s",
        when(lagT.isNull || unix_millis(col("t")) - lagT > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("t")).as("session_start"), count(lit(1)).as("n_events"), seqAgg.as("seq"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("seq"))
      .as[(String, Timestamp, Long, String)].collect().sorted

    // streaming: session_window across a mid-session micro-batch boundary.
    // Feed batches in event-time order (a real stream's shape) — the u2
    // {36,40} session spans the boundary; nothing arrives behind the
    // watermark (max_seen - 10min), so no event is dropped as late.
    val (early, late) = rows.partition(_._2.getTime <= ts(36).getTime)
    val stream = MemoryStream[(String, Timestamp, Long, String)]
    val sq = stream.toDS().toDF("user_id", "t", "event_id", "event_type")
      .withWatermark("t", "10 minutes")
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), seqAgg.as("seq"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("seq"))
      .writeStream.format("memory").queryName("seq_parity").outputMode("append").start()
    stream.addData(early)
    sq.processAllAvailable()
    stream.addData(late)
    sq.processAllAvailable()
    stream.addData(Seq(("zz", ts(100000), 99L, "tick"))) // flush watermark
    sq.processAllAvailable()
    val streamed = spark.table("seq_parity")
      .where(col("user_id") =!= "zz")
      .as[(String, Timestamp, Long, String)].collect().sorted
    sq.stop()

    assert(batch.length == 5, s"expected 5 sessions, batch found ${batch.length}")
    assert(batch.toSeq == streamed.toSeq,
      s"batch=${batch.mkString("; ")}\nstream=${streamed.mkString("; ")}")
  }

  test("deterministic split is a stateless map: identical assignments on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = (0L until 500L).map(i => (i, s"doc $i"))

    val batch = DatasetSplit.withSplit(ids.toDF("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().sorted

    val stream = MemoryStream[(Long, String)]
    val sq = DatasetSplit.withSplit(stream.toDS().toDF("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("split"))
      .writeStream.format("memory").queryName("split_parity").outputMode("append").start()
    stream.addData(ids.take(123))
    sq.processAllAvailable()
    stream.addData(ids.drop(123))
    sq.processAllAvailable()
    val streamed = spark.table("split_parity").as[(Long, String)].collect().sorted
    sq.stop()

    assert(batch.toSeq == streamed.toSeq)
    // all three splits materialize (hash buckets cover train/val/test)
    assert(batch.map(_._2).distinct.toSet == Set("train", "val", "test"))
  }

  test("streaming per-group cap admits exactly k per source across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // source "a": 30 rows split 20+10 across batches; "b": 5 rows (< k)
    val batch1 = (0L until 20L).map(i => ("a", i)) ++ (0L until 3L).map(i => ("b", 100L + i))
    val batch2 = (20L until 30L).map(i => ("a", i)) ++ (3L until 5L).map(i => ("b", 100L + i))

    val stream = MemoryStream[(String, Long)]
    val sq = DatasetSplit.capPerGroupStreaming(
        stream.toDS().toDF("source", "doc_id"), "source", 25)
      .writeStream.format("memory").queryName("cap_parity").outputMode("append").start()
    stream.addData(batch1)
    sq.processAllAvailable()
    stream.addData(batch2)
    sq.processAllAvailable()
    val counts = spark.table("cap_parity").groupBy("source").count()
      .as[(String, Long)].collect().toMap
    sq.stop()

    // "a" is capped at 25 even though no single micro-batch exceeded the cap
    // (20 then 10) — proof the admission counter survives batch boundaries
    assert(counts == Map("a" -> 25L, "b" -> 5L), s"got $counts")

    // batch capPerGroup enforces the same cardinality contract on the union
    val allRows = (batch1 ++ batch2).toDF("source", "doc_id")
    val capped = DatasetSplit.capPerGroup(allRows, "doc_id", "source", 25)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(capped == Map("a" -> 25L, "b" -> 5L))
  }

  test("PII redaction and int8 quantization run unchanged on a stream (stateless maps)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "mail me at a.user@example.com or call 5551234567 now"),
      (2L, "clean row with no identifiers at all"),
      (3L, "ids 99887766 and c@d.org mixed in"))
    val vecs = Seq((1L, Array(1.0f, -2.0f, 0.5f)), (2L, Array(0.0f, 0.0f, 0.0f)))

    def redact(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.text.TextFunctions.redactPii(col("text")).as("red"))
    val batchRed = redact(docs.toDF("doc_id", "text"))
      .as[(Long, String)].collect().sorted

    val ds = MemoryStream[(Long, String)]
    val sq1 = redact(ds.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("redact_parity").outputMode("append").start()
    ds.addData(docs.take(2)); sq1.processAllAvailable()
    ds.addData(docs.drop(2)); sq1.processAllAvailable()
    val streamRed = spark.table("redact_parity").as[(Long, String)].collect().sorted
    sq1.stop()
    assert(batchRed.toSeq == streamRed.toSeq)
    assert(streamRed.forall { case (_, s) => !s.contains("@example.com") && !s.contains("5551234567") })

    def profile(df: org.apache.spark.sql.DataFrame) =
      graft.sim.Quantization.int8Profile(df, "vec_id", "embedding")
    val batchQ = profile(vecs.toDF("vec_id", "embedding"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    val vs = MemoryStream[(Long, Array[Float])]
    val sq2 = profile(vs.toDS().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("quant_parity").outputMode("append").start()
    vs.addData(vecs); sq2.processAllAvailable()
    val streamQ = spark.table("quant_parity").as[(Long, Long, Long, Long, Long)].collect().sorted
    sq2.stop()
    assert(batchQ.toSeq == streamQ.toSeq)
  }

  test("bloom decontamination probes run unchanged on a stream (map-only, broadcast-free)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val words = graft.operators.Decontamination.evalBloom(eval, "text", 5)
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta"), // shares eval 5-grams
      (11L, "one two three four five six seven"))       // disjoint

    def probe(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Decontamination.overlapBloom(df, words, "doc_id", "text", 5)
    val batch = probe(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Boolean)].collect().sorted

    val ds = MemoryStream[(Long, String)]
    val sq = probe(ds.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bloom_parity").outputMode("append").start()
    ds.addData(docs.take(1)); sq.processAllAvailable()
    ds.addData(docs.drop(1)); sq.processAllAvailable()
    val stream = spark.table("bloom_parity").as[(Long, Long, Long, Boolean)].collect().sorted
    sq.stop()
    assert(batch.toSeq == stream.toSeq)
    val flags = stream.map(r => r._1 -> r._4).toMap
    assert(flags(10L) && !flags(11L), flags)
  }

  test("text normalization runs unchanged on a stream (stateless map)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "  Mixed   CASE...  and   gaps!!! "),
      (2L, "mixed case. and gaps!"),
      (3L, "untouched line"))

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.text.TextFunctions.normalize(col("text")).as("n"))
    val batchN = norm(docs.toDF("doc_id", "text")).as[(Long, String)].collect().sorted

    val ds = MemoryStream[(Long, String)]
    val sq = norm(ds.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("norm_parity").outputMode("append").start()
    ds.addData(docs.take(1)); sq.processAllAvailable()
    ds.addData(docs.drop(1)); sq.processAllAvailable()
    val streamN = spark.table("norm_parity").as[(Long, String)].collect().sorted
    sq.stop()
    assert(batchN.toSeq == streamN.toSeq)
    // 1 and 2 canonicalize to the same bytes — the streaming dedup key
    val m = streamN.toMap
    assert(m(1L) == m(2L))
  }
}
