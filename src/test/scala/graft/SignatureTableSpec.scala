package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{MinHashLSH, SignatureStore}
import graft.filter.SparkTestSession

/**
 * The externalized-signature path and the cross-operator signature cache:
 * (1) `signatures()` written to a parquet TABLE and read back must drive
 * `candidatePairsFromSigs` / `nearDuplicatesFromSigs` /
 * `duplicateGroupsFromSigs` to byte-identical results as the raw-text
 * entry points — the petabyte-scale contract where signatures are computed
 * once per corpus and every dedup recipe runs against the table; and
 * (2) `SignatureStore` must hand two different OPERATORS on the same
 * corpus plan the same persisted projection (the q_dedup_pipeline /
 * q_cluster_split sharing win) while keying apart different corpora and
 * different hash families.
 */
class SignatureTableSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    val base = (0 until 60).map { i =>
      (i.toLong, s"document $i discusses topic${i % 7} at length with shared vocabulary " +
        s"alpha beta gamma delta epsilon zeta eta theta iota kappa body$i tail$i")
    }
    // plant near-dups: truncated copies of the first 10 docs
    val dups = (0 until 10).map { i =>
      val t = base(i)._2
      (1000L + i, t.substring(0, t.length - 12))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("signature table written to parquet replays the raw-text dedup exactly") {
    val lsh = new MinHashLSH(32, 8, 3)
    val dir = Files.createTempDirectory("graft_sigs_").toString
    lsh.signatures(corpus, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)

    val fromText = lsh.nearDuplicates(corpus, "doc_id", "text", 0.4)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fromTable = lsh.nearDuplicatesFromSigs(table, "doc_id", 0.4)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fromText.nonEmpty && fromText.sameElements(fromTable))

    val candText = lsh.candidatePairs(corpus, "doc_id", "text")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val candTable = lsh.candidatePairsFromSigs(table, "doc_id")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(candText.sameElements(candTable))

    val grpText = lsh.duplicateGroups(corpus, "doc_id", "text", 0.4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val grpTable = lsh.duplicateGroupsFromSigs(table, "doc_id", 0.4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grpText.sameElements(grpTable))
  }

  test("SignatureStore shares one persisted projection across operators") {
    SignatureStore.clear()
    val lsh = new MinHashLSH(32, 8, 3)
    val c = corpus
    val s1 = SignatureStore.sigs(c, "doc_id", "text", lsh)
    val s2 = SignatureStore.sigs(c, "doc_id", "text", lsh)
    assert(s1 eq s2, "same corpus plan + params must hit the cache")

    // a different corpus plan (extra filter) must key apart
    val s3 = SignatureStore.sigs(c.where(col("doc_id") < 1000), "doc_id", "text", lsh)
    assert(!(s3 eq s1))

    // same corpus, different hash family must key apart
    val s4 = SignatureStore.sigs(c, "doc_id", "text", new MinHashLSH(16, 4, 3))
    assert(!(s4 eq s1))
    SignatureStore.clear()
  }

  test("pipeline and nearDupSafeSplit agree on groups via the shared store") {
    SignatureStore.clear()
    SignatureStore.resetStats()
    val c = corpus
    // both entry points run off the shared signature projection (the
    // bench-sharing win); their group structures differ by design (star
    // forest vs full CC over verified pairs) but both must collapse the
    // planted truncated copies into multi-member groups
    val kept = graft.dedup.Dedup.pipeline(c, "doc_id", "text", 0.4)
    val grouped = kept.where(col("n_members") > 1)
      .agg(coalesce(sum(col("n_members")), lit(0L))).collect().head.getLong(0)
    assert(grouped >= 20L, "planted truncated copies must land in multi-member groups")
    val split = graft.operators.DatasetSplit
      .nearDupSafeSplit(c, "doc_id", "text", 0.4)
    assert(split.where(col("canonical_id") =!= col("doc_id")).count() >= 10L)
    // near-dup members never cross the split boundary
    val leaky = split.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(leaky == 0L)
    // the cross-operator saving, PROVEN (round 10; r8 task 5 adjudication):
    // both operators above ran on the same corpus plan + hash family, so
    // the tokenize→shingle→minhash pass must have executed exactly once —
    // one miss (whoever came first), every later access a hit
    val (hits, misses) = SignatureStore.stats
    assert(misses == 1L, s"signatures derived from raw text $misses times — expected once")
    assert(hits >= 1L, s"second operator never hit the shared store (hits=$hits)")
    SignatureStore.clear()
  }

  test("SignatureStore survives a semanticHash collision by plan equality") {
    // can't force a real 32-bit collision deterministically, but the store
    // must key on the PLAN, not its hash: two plans that differ only in a
    // filter constant are the closest controllable proxy — equal-looking,
    // unequal structurally — and must never share an entry
    SignatureStore.clear()
    val lsh = new MinHashLSH(32, 8, 3)
    val c = corpus
    val a = SignatureStore.sigs(c.where(col("doc_id") < 500), "doc_id", "text", lsh)
    val b = SignatureStore.sigs(c.where(col("doc_id") < 501), "doc_id", "text", lsh)
    assert(!(a eq b), "different corpus plans must not share a cache entry")
    assert(a.count() == 60L && b.count() == 60L) // both frames usable
    SignatureStore.clear()
  }
}
