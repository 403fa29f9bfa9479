package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.dedup.MinHashLSH

/** Incremental dedup must equal the full-corpus run restricted to pairs
  * that touch the new batch — history is consulted signatures-only, and
  * history×history pairs are never re-reported. */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestSession {

  test("nearDuplicatesAgainst == full nearDuplicates restricted to new-doc pairs") {
    import spark.implicits._
    def words(from: Int, until: Int): String = (from until until).map(i => s"w$i").mkString(" ")
    // 1~2 within history, 3~4 within batch, 5~1 across, 9/10 unrelated
    val docs = Seq(
      (1L, words(0, 24)),            // history
      (2L, words(0, 26)),            // history, ~1
      (9L, words(200, 220)),         // history, unrelated
      (3L, words(50, 74)),           // new
      (4L, words(50, 76)),           // new, ~3
      (5L, words(0, 25)),            // new, ~1 and ~2 (cross-batch)
      (10L, words(300, 320))).       // new, unrelated
      toDF("doc_id", "text")
    val isNew = Set(3L, 4L, 5L, 10L)
    val lsh = new MinHashLSH(32, 8, 3)

    val full = lsh.nearDuplicates(docs, "doc_id", "text", 0.4)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val expected = full.filter { case ((a, b), _) => isNew(a) || isNew(b) }

    val history = lsh.signatures(docs.where(!$"doc_id".isin(isNew.toSeq: _*)), "doc_id", "text")
    val incr = lsh.nearDuplicatesAgainst(
        history, docs.where($"doc_id".isin(isNew.toSeq: _*)), "doc_id", "text", 0.4)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap

    assert(incr == expected, s"incr=$incr expected=$expected")
    // sanity: the fixture exercises within-history (excluded), within-batch
    // and cross-batch (included) pair classes
    assert(full.contains((1L, 2L)) && !incr.contains((1L, 2L)))
    assert(incr.contains((3L, 4L)) && incr.contains((1L, 5L)) && incr.contains((2L, 5L)))
  }
}
