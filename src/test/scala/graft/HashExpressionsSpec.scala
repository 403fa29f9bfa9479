package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.functions.HashExpressions
import graft.text.TextFunctions

/** The native codegen kernels must be bit-identical to the declarative
  * TextFunctions formulations they replace — checked on real corpus docs
  * (unicode, punctuation, multi-byte) plus edge cases. */
class HashExpressionsSpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(300)
    val edges = Seq(
      (9001L, null.asInstanceOf[String]),
      (9002L, ""),
      (9003L, "one two"), // fewer than 3 tokens -> empty shingle set
      (9004L, "ONE one ONE one repeated Repeated"),
      (9005L, "中文文档 mixed 中文 ascii tokens 123 !!!"),
      (9006L, "  \t punct---only???  ")
    ).toDF("doc_id", "text")
    corpus.unionByName(edges)
  }

  test("native shingleHashSet equals the declarative formulation") {
    val d = docs
    val diff = d.select(
        TextFunctions.shingleHashSet(col("text"), 3).as("hof"),
        HashExpressions.shingleHashSet(col("text"), 3).as("native"))
      .where(not(col("hof") <=> col("native")))
    assert(diff.count() == 0)
  }

  test("native tokenHashes(31) equals transform(tokens, stableHash)") {
    val d = docs
    val diff = d.select(
        transform(TextFunctions.tokens(col("text")), TextFunctions.stableHash _).as("hof"),
        HashExpressions.tokenHashes(col("text"), 31).as("native"))
      .where(not(col("hof") <=> col("native")))
    assert(diff.count() == 0)
  }

  test("native tokenHashes(60) equals transform(tokens, tokenHash60)") {
    val d = docs
    val diff = d.select(
        transform(TextFunctions.tokens(col("text")), graft.dedup.SimHash.tokenHash60 _).as("hof"),
        HashExpressions.tokenHashes(col("text"), 60).as("native"))
      .where(not(col("hof") <=> col("native")))
    assert(diff.count() == 0)
  }

  test("native minhash signature equals the aggregate/zip_with fold") {
    val mh = new graft.dedup.MinHashLSH(32, 8, 3)
    val aArr = typedLit((0 until 32).map(mh.coefA).toArray)
    val bArr = typedLit((0 until 32).map(mh.coefB).toArray)
    val hofSig = {
      val sset = HashExpressions.shingleHashSet(col("text"), 3)
      aggregate(sset, array_repeat(lit(TextFunctions.P), 32),
        (acc, x) => zip_with(acc, typedLit(Array.tabulate(32)(identity)),
          (c, i) => least(c, (element_at(aArr, i + 1) * x + element_at(bArr, i + 1)) % TextFunctions.P)))
    }
    val diff = docs.select(
        hofSig.as("hof"),
        mh.signatureFromSet(HashExpressions.shingleHashSet(col("text"), 3)).as("native"))
      .where(not(col("hof") <=> col("native")))
    assert(diff.count() == 0)
  }

  test("tokenStats equals the declarative token folds") {
    val lists = Seq(TextFunctions.EnStopwords, Seq("der", "die", "das"))
    val st = HashExpressions.tokenStats(col("text"), lists)
    val toks = TextFunctions.tokens(col("text"))
    val diff = docs.select(
        st.getField("ntoks").as("n_n"), size(toks).cast("long").as("n_h"),
        st.getField("lensum").as("l_n"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("l_h"),
        st.getField("hits")(0).as("h0_n"),
        size(filter(toks, t => t.isInCollection(lists(0)))).cast("long").as("h0_h"),
        st.getField("hits")(1).as("h1_n"),
        size(filter(toks, t => t.isInCollection(lists(1)))).cast("long").as("h1_h"))
      .where(not(col("n_n") <=> col("n_h")) or not(col("l_n") <=> col("l_h"))
        or not(col("h0_n") <=> col("h0_h")) or not(col("h1_n") <=> col("h1_h")))
    assert(diff.count() == 0)
  }

  test("rollingHash equals the aggregate fold") {
    val hashes = HashExpressions.tokenHashes(col("text"), 31)
    val diff = docs.select(
        HashExpressions.rollingHash(hashes).as("native"),
        aggregate(hashes, lit(0L), (acc, h) => (acc * 31L + h) % TextFunctions.P).as("hof"))
      .where(not(col("native") <=> col("hof")))
    assert(diff.count() == 0)
  }

  test("expressions stay inside whole-stage codegen") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        HashExpressions.shingleHashSet(col("text"), 3).as("s"),
        HashExpressions.tokenHashes(col("text"), 60).as("t"),
        HashExpressions.winnowedHashes(col("text"), 40, 10).as("w"))
      .queryExecution.executedPlan
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.toString.startsWith("*("), plan.toString)
  }

  test("winnowedHashes rolling update equals the direct polynomial, on random unicode") {
    import graft.functions.HashKernels.{WinnowB, WinnowM}
    // independent reference: direct O(width) modular sum at every position
    def reference(s: String, width: Int, rate: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - width).flatMap { p =>
        var h = 0L
        for (j <- 0 until width) h = (h * WinnowB + cps(p + j)) % WinnowM
        if (h % rate == 0) Some(h) else None
      }
    }
    val rng = new scala.util.Random(42)
    // codepoint-safe alphabet (indexing chars would split the surrogate pair)
    val alphabet = Seq("a", "b", "c", "h", " ", "X", "0", "9", ".", ",", "é", "漢", "🙂")
    val strings = (1 to 50).map(_ =>
      (1 to 30 + rng.nextInt(300)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString) :+
      "short" :+ "" :+ ("x" * 40)
    import spark.implicits._
    for (w <- Seq(8, 40); r <- Seq(1, 10)) {
      val viaKernel = strings.toDF("text")
        .select(HashExpressions.winnowedHashes(col("text"), w, r).as("h"))
        .as[Seq[Long]].collect()
      strings.zip(viaKernel).foreach { case (s, got) =>
        assert(got == reference(s, w, r), s"width=$w rate=$r for ${s.take(30)}")
      }
    }
  }
}
