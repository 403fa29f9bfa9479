package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.dedup.MinHashLSH
import graft.operators.DatasetSplit
import graft.sim.Similarity

/** Degenerate-input contracts: null/empty text through the dedup pipeline,
  * zero vectors through cosine, hostile ids through the splitter. A 100 TB
  * corpus always contains the weird rows. */
class RobustnessSpec extends AnyFunSuite with SparkTestSession {

  test("dedup pipelines tolerate null and empty documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "xy")). // shorter than the shingle size
      toDF("doc_id", "text")
    val lsh = new MinHashLSH(32, 8, 3)

    val pairs = lsh.nearDuplicates(docs, "doc_id", "text", 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), pairs.toSeq)

    val groups = lsh.duplicateGroups(docs, "doc_id", "text", 0.4)
      .as[(Long, Long)].collect().toMap
    assert(groups(2L) == 1L)
    // null text: the doc must survive with itself as canonical, not crash
    assert(groups(4L) == 4L && groups(3L) == 3L && groups(5L) == 5L, groups)
  }

  test("decontamination and line dedup tolerate null, empty and short documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared line\nunique body one"),
      (2L, "shared line\nunique body two"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "tiny")).toDF("doc_id", "text")

    val deco = graft.operators.Decontamination
      .overlap(docs, docs.where($"doc_id" === 1L), "doc_id", "text", 5)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // null/empty/short docs: zero grams, clean, present in the output
    assert(Seq(3L, 4L, 5L).forall(id => deco(id)._2 == 0L && !deco(id)._4), deco)

    val ld = graft.operators.LineDedup.removeBoilerplate(docs, "doc_id", "text", 2L)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(ld(1L) == ((1L, 2L, 1L, "unique body one")), ld(1L))
    // null behaves as empty: one blank line, nothing removed, no crash
    assert(ld(4L) == ((4L, 1L, 0L, "")), ld(4L))
    assert(ld(3L) == ((3L, 1L, 0L, "")), ld(3L))
  }

  test("curation funnel counts null-text docs at stage 0 even with lying metadata") {
    import spark.implicits._
    val good = (1 to 60).map(i => f"beta$i%03d").mkString(" ")
    // doc 4 claims 300 chars but has null text: the null kernel stats must
    // fail it at the token stage, not null-skip it into full survival
    val docs = Seq((1L, good, good.length.toLong), (4L, null.asInstanceOf[String], 300L))
      .toDF("doc_id", "text", "n_chars")
    val eval = docs.where($"doc_id" === -1L) // empty eval set
    val f = graft.operators.CurationFunnel
      .funnel(docs, eval, "doc_id", "text", "n_chars")
      .as[(Long, Long, Long)].collect().sortBy(_._1).map(r => r._1 -> (r._2, r._3)).toMap
    assert(f(0L) == ((2L, good.length.toLong + 300L)), f) // both docs at stage 0
    // the null-text doc passes length (its metadata says 300 chars) but the
    // null kernel stats fail it at the TOKEN stage: present at 1, gone at 2
    assert(f(1L) == ((2L, good.length.toLong + 300L)), f)
    assert(f(2L) == ((1L, good.length.toLong)), f)
    assert(f(4L) == ((1L, good.length.toLong)), f)
  }

  test("cosine contract: zero vectors score 0, never NaN") {
    import spark.implicits._
    val df = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array(0.0, 0.0), Array(0.0, 0.0))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b")).as("s"))
      .as[Double].collect()
    assert(sims.forall(s => s == 0.0 && !s.isNaN), sims.toSeq)
  }

  test("hash split handles zero and negative ids") {
    import spark.implicits._
    val splits = DatasetSplit.withSplit(Seq(-5L, -1L, 0L, 1L).toDF("id"), "id")
      .select(col("split")).as[String].collect()
    assert(splits.forall(Set("train", "val", "test")), splits.toSeq)
  }

  test("normalize and bigram surprisal are null/empty-safe") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "  A  ")).toDF("doc_id", "text")
    val norm = df.select(col("doc_id"), graft.text.TextFunctions.normalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(norm(1L).isEmpty)       // null propagates, no exception
    assert(norm(2L).contains(""))  // empty stays empty
    assert(norm(3L).contains("a"))
    val bs = graft.operators.CorpusStats.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bs.size == 3 && bs.values.forall(_ == ((0L, 0L))), bs) // <2 tokens everywhere
  }

  test("ngram stats and PII counters are null-safe") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "text")
    val rows = df.select(col("id"),
        graft.functions.HashExpressions.ngramStats(col("text")).as("st"),
        graft.text.TextFunctions.emailCount(col("text")).as("e"))
      .collect()
    assert(rows.length == 2) // no exceptions; null text -> null struct
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(rows.find(_.getLong(0) == 2L).get.getStruct(1).getLong(0) == 0L)
  }

  test("classifiers tolerate null/empty text and single-class corpora") {
    import graft.text.TextClassifiers
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta", 1L), (2L, null.asInstanceOf[String], 1L),
      (3L, "", 0L), (4L, "alpha", 0L)).toDF("id", "text", "y")
    val model = TextClassifiers.naiveBayesTrain(df, "text", "y")
    val nb = TextClassifiers.naiveBayesScore(df, "id", "text", "y", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nb.keySet == Set(1L, 2L, 3L, 4L) && nb(2L) == 0L && nb(3L) == 0L)
    val dw = TextClassifiers.dsirWeights(df, "id", "text", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dw.keySet == Set(1L, 2L, 3L, 4L) && dw(2L) == 0L)
    // single-class corpus: prior dominates, nothing divides by zero
    val onecls = Seq((1L, "alpha beta", 1L), (2L, "beta", 1L)).toDF("id", "text", "y")
    val m1 = TextClassifiers.naiveBayesTrain(onecls, "text", "y")
    val preds = TextClassifiers.naiveBayesScore(onecls, "id", "text", "y", m1)
      .select("pred").as[Long].collect()
    assert(preds.forall(_ == 1L))
  }

  test("upsample with allocation below group size keeps a deterministic subset") {
    import graft.operators.TrainingOrder
    import spark.implicits._
    val docs = (0L until 10L).map(i => ("s", i)).toDF("source", "doc_id")
    val alloc = Seq(("s", 3L)).toDF("source", "alloc")
    val ups = TrainingOrder.upsampleToAllocation(docs, "doc_id", "source", alloc)
    assert(ups.count() == 3L)
    assert(ups.select(max("copy")).head().getLong(0) == 1L)
    // zero allocation: group vanishes entirely, no exception
    val none = TrainingOrder.upsampleToAllocation(docs, "doc_id", "source",
      Seq(("s", 0L)).toDF("source", "alloc"))
    assert(none.count() == 0L)
  }
}
