package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.dedup.{Dedup, MinHashLSH}

/** Min-label propagation must converge every component to its minimum id —
  * including chains, which one bucket-min star round cannot close. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestSession {

  test("connectedComponents converges chains, cliques and singletons") {
    import spark.implicits._
    val ids = (1L to 10L).toDF("id")
    // chain 1-2-3-4, clique 5-6-7, pair 8-9, singleton 10
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L), (9L, 8L))
      .toDF("a", "b")
    val labels = Dedup.connectedComponents(ids, edges).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), labels)
    assert(Seq(5L, 6L, 7L).forall(labels(_) == 5L), labels)
    assert(Seq(8L, 9L).forall(labels(_) == 8L), labels)
    assert(labels(10L) == 10L)
  }

  test("nearDuplicateComponents closes a text chain a~b~c with a!~c") {
    import spark.implicits._
    // b shares a long prefix with a and gains tokens; c extends b further:
    // jaccard(a,b), jaccard(b,c) >= 0.5 but jaccard(a,c) < 0.5
    def words(from: Int, until: Int): String = (from until until).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, words(0, 20)),
      (2L, words(0, 32)),
      (3L, words(0, 44)),
      (9L, words(100, 120))). // unrelated singleton
      toDF("doc_id", "text")

    // sanity: the pair graph really is a chain under this threshold
    val lsh = new MinHashLSH(32, 16, 3)
    val pairs = lsh.nearDuplicates(docs, "doc_id", "text", 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)), pairs)
    assert(!pairs.contains((1L, 3L)), s"a~c unexpectedly similar: $pairs")

    val canon = lsh.nearDuplicateComponents(docs, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toMap
    assert(canon(1L) == 1L && canon(2L) == 1L && canon(3L) == 1L,
      s"chain not fully canonicalized: $canon")
    assert(canon(9L) == 9L)

    // the single star round, by contrast, leaves the chain split per link
    val star = lsh.duplicateGroups(docs, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toMap
    assert(star(2L) == 1L, star)
  }
}
