package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.dedup.Dedup
import graft.operators.{DatasetSplit, Decontamination, LineDedup}

class SplitAndRetentionSpec extends AnyFunSuite with SparkTestSession {

  test("hash split is deterministic, growth-stable and near the target fractions") {
    import spark.implicits._
    val small = DatasetSplit.withSplit((1L to 500L).toDF("id"), "id")
      .as[(Long, String)].collect().toMap
    val large = DatasetSplit.withSplit((1L to 2000L).toDF("id"), "id")
      .as[(Long, String)].collect().toMap
    // a doc's split never changes when the corpus grows
    assert(small.forall { case (id, s) => large(id) == s })
    val frac = large.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac)
    assert(math.abs(frac("val") - 0.1) < 0.04, frac)
    assert(math.abs(frac("test") - 0.1) < 0.04, frac)
  }

  test("capPerGroup keeps exactly k deterministic rows per group") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1 to 100) yield (s"$g$i".hashCode.toLong, g))
      .toDF("id", "grp")
    val once = DatasetSplit.capPerGroup(df, "id", "grp", 10)
      .as[(Long, String)].collect().toSet
    val again = DatasetSplit.capPerGroup(df.repartition(7), "id", "grp", 10)
      .as[(Long, String)].collect().toSet
    assert(once.size == 20)
    assert(once.groupBy(_._2).forall(_._2.size == 10))
    assert(once == again, "cap sample not deterministic across partitionings")
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    def words(from: Int, until: Int): String = (from until until).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (1L, words(0, 20)),              // fully inside the eval doc's range
      (2L, words(15, 40)),             // overlaps eval grams [15..20)
      (3L, words(100, 130)),           // disjoint vocabulary -> clean
      (4L, "too short")                // < n tokens -> 0 grams, clean
    ).toDF("doc_id", "text")
    val eval = Seq((100L, words(0, 25))).toDF("doc_id", "text")

    val out = Decontamination.overlap(train, eval, "doc_id", "text", 5)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)

    val byId = out.map(r => r._1 -> r).toMap
    // doc 1: 16 grams (20 tokens), every one inside eval's 21 grams
    assert(byId(1L) == ((1L, 16L, 16L, true)), byId(1L))
    // doc 2 spans w15..w39; eval covers w0..w24, so the 6 grams starting at
    // w15..w20 (each fully inside w15..w24) overlap
    assert(byId(2L)._2 == 21L && byId(2L)._3 == 6L && byId(2L)._4, byId(2L))
    assert(byId(3L) == ((3L, 26L, 0L, false)), byId(3L))
    assert(byId(4L) == ((4L, 0L, 0L, false)), byId(4L))
  }

  test("line dedup removes corpus-frequent lines, preserves order, never strips blanks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nunique alpha\n\nunique beta\nHEADER"),  // header twice in one doc
      (2L, "HEADER\nunique gamma"),
      (3L, "HEADER\nunique delta"),
      (4L, "no header here\n\nat all")
    ).toDF("doc_id", "text")

    val out = LineDedup.removeBoilerplate(docs, "doc_id", "text", 3L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList

    // HEADER occurs in docs 1-3 (3 distinct docs >= 3) -> removed everywhere,
    // including BOTH copies in doc 1; blank lines survive (never boilerplate)
    assert(out == List(
      (1L, 5L, 2L, "unique alpha\n\nunique beta"),
      (2L, 2L, 1L, "unique gamma"),
      (3L, 2L, 1L, "unique delta"),
      (4L, 3L, 0L, "no header here\n\nat all")), out)
  }

  test("keepBest keeps the max score per group, smallest id on ties") {
    import spark.implicits._
    val scored = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L), (9L, 7L))
      .toDF("id", "score")
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (9L, 9L))
      .toDF("id", "canonical_id")
    val kept = Dedup.keepBest(scored, "id", "score", groups)
      .select(col("canonical_id"), col("kept_id"), col("kept_score"), col("n_members"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(kept.toSeq == Seq((1L, 2L, 30L, 4L), (9L, 9L, 7L, 1L)), kept.toSeq)
  }
}
