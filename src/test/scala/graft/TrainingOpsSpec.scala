package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.TrainingOrder
import graft.text.TextClassifiers

/**
 * Behavior specs for the training-assembly operators (NB classifier, DSIR
 * weights, shuffle shards): semantics pinned on constructed inputs where the
 * right answer is known by inspection; the driver's DuckDB oracle pins exact
 * outputs on the real tables.
 */
class TrainingOpsSpec extends AnyFunSuite with SparkTestSession {

  test("naive bayes separates classes with disjoint vocabularies") {
    import spark.implicits._
    // positive docs speak only 'alpha beta', negative only 'gamma delta';
    // a perfectly separable corpus must classify itself perfectly
    val docs = (1L to 10L).map { i =>
      if (i <= 5) (i, "alpha beta alpha beta", 1L)
      else (i, "gamma delta gamma delta", 0L)
    }.toDF("id", "text", "y")
    val model = TextClassifiers.naiveBayesTrain(docs, "text", "y")
    val out = TextClassifiers.naiveBayesScore(docs, "id", "text", "y", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (1L to 5L).foreach(i => assert(out(i)._2 == 1L, s"doc $i should be positive: ${out(i)}"))
    (6L to 10L).foreach(i => assert(out(i)._2 == 0L, s"doc $i should be negative: ${out(i)}"))
    // bits('alpha') = floor(log2(10+1)) - floor(log2(0+1)) = 3 - 0; 4 tokens
    // per doc, prior = 0 (balanced classes) -> score 12
    assert(out(1L)._1 == 12L)
    assert(out(6L)._1 == -12L)
  }

  test("naive bayes: doc with no tokens scores exactly the prior") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha", 1L), (2L, "beta", 0L), (3L, "...", 0L)
    ).toDF("id", "text", "y")
    val model = TextClassifiers.naiveBayesTrain(docs, "text", "y")
    val out = TextClassifiers.naiveBayesScore(docs, "id", "text", "y", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // prior = floor(log2(1+1)) - floor(log2(2+1)) = 1 - 1 = 0
    assert(out(3L) == ((0L, 0L)))
  }

  test("dsir weights rank target-like docs above off-target docs") {
    import spark.implicits._
    // target domain speaks 'spark sql' bigrams; off-target speaks 'cat dog'.
    // A raw doc in target vocabulary must out-weight one in off-target
    // vocabulary, and weights must be identical for identical docs.
    val docs = ((1L to 8L).map(i => (i, "spark sql spark sql spark", 1L)) ++
      (9L to 16L).map(i => (i, "cat dog cat dog cat", 0L))).toDF("id", "text", "y")
    val out = TextClassifiers.dsirWeights(docs, "id", "text", "y")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 > out(9L)._1, s"target doc must out-weight off-target: ${out(1L)} vs ${out(9L)}")
    assert(out(1L) == out(8L) && out(9L) == out(16L)) // deterministic per content
    assert(out(1L)._2 == 1L && out(9L)._2 == 0L)
  }

  test("shuffle shards: every doc placed once per epoch, epochs permute differently") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    val out = TrainingOrder.shuffleShards(docs, "doc_id", epochs = 2, nShards = 8)
      .cache()
    try {
      // exactly one placement per (doc, epoch)
      assert(out.count() == 800L)
      assert(out.select("epoch", "doc_id").distinct().count() == 800L)
      // positions within a shard are 1..n with no gaps
      val bad = out.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .where(col("mx") =!= col("n") || col("mn") =!= 1L).count()
      assert(bad == 0L)
      // epoch 1 and epoch 2 orders differ (different md5 keys): the same
      // doc lands elsewhere for at least most docs
      val same = out.where(col("epoch") === 1).as("a")
        .join(out.where(col("epoch") === 2).as("b"), Seq("doc_id"))
        .where(col("a.shard") === col("b.shard") && col("a.pos") === col("b.pos"))
        .count()
      assert(same < 40L, s"epochs must permute differently, $same/400 fixed points")
      // determinism: recompute equals first run byte-for-byte
      val again = TrainingOrder.shuffleShards(docs, "doc_id", epochs = 2, nShards = 8)
      assert(out.exceptAll(again).count() == 0L && again.exceptAll(out).count() == 0L)
      // shard balance: binomial concentration keeps every shard within 3x mean
      val sizes = out.groupBy("epoch", "shard").count()
        .agg(min("count"), max("count")).head()
      assert(sizes.getLong(1) <= 3 * sizes.getLong(0))
    } finally out.unpersist()
  }

  test("upsample materializes exactly the allocation; interleave spaces groups evenly") {
    import spark.implicits._
    // 3 sources with 10 docs each; force allocations 20 / 10 / 4
    val docs = (for (s <- Seq("a", "b", "c"); i <- 0 until 10)
      yield (s, s.hashCode.toLong * 100 + i)).toDF("source", "doc_id")
    val alloc = Seq(("a", 20L), ("b", 10L), ("c", 4L)).toDF("source", "alloc")
    val ups = TrainingOrder.upsampleToAllocation(docs, "doc_id", "source", alloc).cache()
    try {
      // exact allocation per group
      val got = ups.groupBy("source").count().as[(String, Long)].collect().toMap
      assert(got == Map("a" -> 20L, "b" -> 10L, "c" -> 4L), got.toString)
      // a: 10 docs x2 copies exactly; b: every doc once; c: 4 distinct docs once
      assert(ups.where($"source" === "a").groupBy("doc_id").count()
        .where($"count" =!= 2).count() == 0L)
      assert(ups.where($"source" === "c").select("doc_id").distinct().count() == 4L)
      // interleave: every row gets a unique (pos_key, source, rank) slot;
      // group a (20 of 34 rows) never waits more than 3 positions between
      // consecutive rows — even spacing, not run-length batching
      val il = TrainingOrder.interleave(ups, "doc_id", "source")
      assert(il.count() == 34L)
      val aPos = il.where($"source" === "a").select("pos_key")
        .as[Long].collect().sorted
      assert(aPos.length == 20 && aPos.head <= 1L && aPos.last >= 32L)
      val maxGap = aPos.sliding(2).map(p => p(1) - p(0)).max
      assert(maxGap <= 3L, s"group a spacing broke: gap $maxGap in ${aPos.mkString(",")}")
      // determinism
      val again = TrainingOrder.interleave(ups, "doc_id", "source")
      assert(il.exceptAll(again).count() == 0L)
    } finally ups.unpersist()
  }

  test("map-form NB scoring equals the join form and streams unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta alpha", 1L), (2L, "alpha beta beta", 1L),
      (3L, "gamma delta gamma", 0L), (4L, "delta gamma delta", 0L),
      (5L, "...", 0L)).toDF("id", "text", "y")
    val model = TextClassifiers.naiveBayesTrain(docs, "text", "y")
    val viaJoin = TextClassifiers.naiveBayesScore(docs, "id", "text", "y", model)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val (bits, prior) = TextClassifiers.naiveBayesModel(docs, "text", "y")
    val viaMap = TextClassifiers.naiveBayesScoreMap(
      docs.select("id", "text"), "id", "text", bits, prior)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(viaJoin == viaMap, s"join=$viaJoin map=$viaMap")

    // the SAME expression on a stream, across micro-batch boundaries
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(Long, String)]
    val sq = TextClassifiers.naiveBayesScoreMap(
      stream.toDS().toDF("id", "text"), "id", "text", bits, prior)
      .writeStream.format("memory").queryName("nb_parity").outputMode("append").start()
    stream.addData(Seq((1L, "alpha beta alpha"), (3L, "gamma delta gamma")))
    sq.processAllAvailable()
    stream.addData(Seq((2L, "alpha beta beta")))
    sq.processAllAvailable()
    val streamed = spark.table("nb_parity").as[(Long, Long, Long, Long)].collect().sorted.toSeq
    sq.stop()
    assert(streamed == viaMap.filter(r => Set(1L, 2L, 3L).contains(r._1)))
  }

  test("bottom-k sample: mergeable, deterministic, and the streaming reservoir converges to it") {
    import graft.operators.DatasetSplit
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 60L).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("source", "doc_id")
    val batch = DatasetSplit.bottomKSample(docs, "source", "doc_id", 4)
      .select("source", "doc_id", "sample_rank")
      .as[(String, Long, Long)].collect().toSet
    assert(batch.size == 8 && batch.count(_._1 == "a") == 4)
    // mergeability: bottom-k of the two halves' bottom-k's == global bottom-k
    val h1 = DatasetSplit.bottomKSample(docs.where($"doc_id" < 30), "source", "doc_id", 4)
    val h2 = DatasetSplit.bottomKSample(docs.where($"doc_id" >= 30), "source", "doc_id", 4)
    val remerged = DatasetSplit.bottomKSample(
      h1.drop("sample_rank").unionAll(h2.drop("sample_rank")), "source", "doc_id", 4)
      .select("source", "doc_id", "sample_rank").as[(String, Long, Long)].collect().toSet
    assert(remerged == batch, s"merge broke: $remerged vs $batch")

    // streaming: reservoir state across micro-batches; the LAST snapshot
    // per group equals the batch sample over the union
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(String, Long)]
    val sq = DatasetSplit.bottomKSampleStreaming(
      stream.toDS().toDF("source", "doc_id"), "source", "doc_id", 4)
      .writeStream.format("memory").queryName("res_parity").outputMode("update").start()
    stream.addData((0L until 30L).map(i => (if (i % 2 == 0) "a" else "b", i)))
    sq.processAllAvailable()
    stream.addData((30L until 60L).map(i => (if (i % 2 == 0) "a" else "b", i)))
    sq.processAllAvailable()
    // memory sink in update mode appends updated rows; the final reservoir
    // is the last 8 emitted rows (4 per group from the second batch)
    val snap = spark.table("res_parity")
      .groupBy("source", "doc_id").agg(max("sample_rank").as("r")).collect()
    sq.stop()
    // streaming output ids are StringType (state keyed by the stringified
    // id — the same bytes the batch md5 hashes); cast back for the compare
    val streamedFinal = DatasetSplit.bottomKSampleStreaming(
      docs, "source", "doc_id", 4) // batch Dataset through the same code
      .select(col("source"), col("doc_id").cast("long").as("doc_id"), col("sample_rank"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamedFinal == batch,
      s"stateful kernel on batch != window form: $streamedFinal vs $batch")
    // and the streamed run admitted every final member at some point
    val streamedIds = snap.map(r => (r.getString(0), r.getString(1).toLong)).toSet
    assert(batch.map(t => (t._1, t._2)).subsetOf(streamedIds))
  }

  test("streaming bottom-k accepts non-numeric ids and matches the batch sample") {
    import graft.operators.DatasetSplit
    import spark.implicits._
    // string ids previously failed the streaming twin's long cast; the
    // state is now keyed by the stringified id — the exact md5 input of
    // the batch form — so any batch-accepted id type streams too
    val df = Seq(("a", "doc-x"), ("a", "doc-y"), ("a", "doc-z"), ("b", "w1"))
      .toDF("source", "doc_id")
    val batch = DatasetSplit.bottomKSample(df, "source", "doc_id", 2)
      .select("source", "doc_id", "sample_rank")
      .as[(String, String, Long)].collect().toSet
    val streamed = DatasetSplit.bottomKSampleStreaming(df, "source", "doc_id", 2)
      .select("source", "doc_id", "sample_rank")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("chunking: overlapping windows cover every token; degenerate docs emit nothing") {
    import graft.operators.CorpusStats
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0,4
      (2L, "only two"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = CorpusStats.chunkDocuments(df, "doc_id", "text", size = 6, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1: starts 0/4 — window at 4 reaches the end (4+6 ≥ 10), so no
    // start-8 window is emitted (its 2 tokens are a strict subset of the
    // start-4 window; a subset chunk would pollute chunk-level dedup)
    assert(out((1L, 0L)) == 6L && out((1L, 1L)) == 6L)
    assert(out((2L, 0L)) == 2L)
    assert(!out.keySet.exists(k => k._1 == 3L || k._1 == 4L))
    // stride coverage: the union of [i*stride, i*stride+size) covers 0..n-1
    assert(out.keySet.count(_._1 == 1L) == 2)
  }

  test("chunking emits no window fully contained in its predecessor") {
    import graft.operators.CorpusStats
    import spark.implicits._
    // 61 tokens, size 40 / stride 30: the old per-stride rule emitted a
    // third 1-token window at start 60 ⊂ [30,70) — assert it is gone and
    // the last window still covers the final token.
    val df = Seq((1L, (1 to 61).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.chunkDocuments(df, "doc_id", "text", size = 40, stride = 30)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((0L, 40L), (1L, 31L)), out.mkString(","))
  }

  test("token drift surfaces appearing/disappearing tokens first, stable ones last") {
    import graft.operators.CorpusStats
    import spark.implicits._
    // side 0 and side 1 share 'stable' at equal rates; 'gone' exists only
    // on side 0, 'novel' only on side 1 — the movers must outrank 'stable'
    val df = Seq(
      (0L, "stable stable gone gone gone"),
      (1L, "stable stable novel novel novel")).toDF("side", "text")
    val out = CorpusStats.tokenDrift(df, "text", "side", 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // T_a = T_b = 5: stable is perfectly balanced -> drift 0;
    // gone/novel: |3*5 - 0*5| = 15
    assert(out("stable") == 0L)
    assert(out("gone") == 15L && out("novel") == 15L)
  }

  test("classifier scoring plans broadcast the model, never shuffle it") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 5}", i % 2)).toDF("id", "text", "y")
    val model = TextClassifiers.naiveBayesTrain(docs, "text", "y")
    val plan = TextClassifiers.naiveBayesScore(docs, "id", "text", "y", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"model join must broadcast:\n$plan")
    val dsirPlan = TextClassifiers.dsirWeights(docs, "id", "text", "y")
      .queryExecution.executedPlan.toString
    assert(dsirPlan.contains("BroadcastHashJoin") || dsirPlan.contains("BroadcastExchange"),
      s"dsir bucket-model join must broadcast:\n$dsirPlan")
  }
}
