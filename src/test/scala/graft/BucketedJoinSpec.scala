package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession

/**
 * The co-location lever from SURVEY §3/§4: at 100 TB, repeated joins on the
 * same key should read bucketed tables so the join runs with ZERO shuffle
 * exchanges. This spec proves the engine's plans actually get there — both
 * sides bucketed on the join key → SortMergeJoin with no Exchange.
 */
class BucketedJoinSpec extends AnyFunSuite with SparkTestSession {

  test("join of two tables bucketed on the key plans with zero shuffle exchanges") {
    // isolated child session: own conf + catalog (suites run in parallel;
    // mutating autoBroadcastJoinThreshold on the SHARED session would race
    // with the broadcast-plan assertions elsewhere), same SparkContext
    val s = spark.newSession()
    import s.implicits._
    // external tables via explicit path — warehouse.dir is a static conf.
    // Tiny test tables would otherwise broadcast, proving nothing about
    // co-location: force the shuffle-vs-bucketing decision.
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    (1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "payload")
      .write.mode("overwrite").bucketBy(4, "id").sortBy("id")
      .option("path", s"$wh/t_docs").saveAsTable("t_docs")
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "label")
      .write.mode("overwrite").bucketBy(4, "id").sortBy("id")
      .option("path", s"$wh/t_labels").saveAsTable("t_labels")

    val joined = s.table("t_docs").join(s.table("t_labels"), "id")
    assert(joined.count() == 1000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles:\n" + plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(2000))

    // control: the same join over unbucketed parquet DOES shuffle
    s.table("t_docs").select("id", "payload")
      .write.mode("overwrite").parquet(s"$wh/flat_docs")
    val flat = s.read.parquet(s"$wh/flat_docs").join(s.table("t_labels"), "id")
    flat.count() // resolve AQE final plan
    val flatPlan = flat.queryExecution.executedPlan.toString
    assert(flatPlan.contains("Exchange hashpartitioning"),
      "control join unexpectedly shuffle-free:\n" + flatPlan.take(2000))
  }
}
