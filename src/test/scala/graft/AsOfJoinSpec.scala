package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.SparkTestSession
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 1000L)

  test("backward as-of join picks the latest right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      ("a", ts(5), "l1"), ("a", ts(10), "l2"), ("a", ts(1), "l0"),
      ("b", ts(7), "l3")
    ).toDF("k", "t", "lv")
    val right = Seq(
      ("a", ts(2), "r2"), ("a", ts(5), "r5"), ("a", ts(9), "r9"),
      ("b", ts(8), "r8")
    ).toDF("k2", "t2", "rv")

    val out = AsOfJoin.backward(left, right, "k", "k2", "t", "t2")
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap

    assert(out("l0").isEmpty)        // t=1: no right row yet
    assert(out("l1").contains("r5")) // t=5: inclusive match at equal time
    assert(out("l2").contains("r9")) // t=10: latest right at 9
    assert(out("l3").isEmpty)        // b at t=7: right row is at 8 (future)
  }

  test("null-time right rows are ignored; null-time left rows match nothing") {
    import spark.implicits._
    val left = Seq(
      ("a", Some(ts(5)), "l1"), ("a", None, "lnull")
    ).toDF("k", "t", "lv")
    val right = Seq(
      ("a", None, "rnull"), // must NOT become anyone's match (DuckDB ASOF semantics)
      ("a", Some(ts(2)), "r2")
    ).toDF("k2", "t2", "rv")

    val out = AsOfJoin.backward(left, right, "k", "k2", "t", "t2")
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap

    assert(out("l1").contains("r2"))
    assert(out("lnull").isEmpty)
  }

  test("as-of join plan is one shuffle per side (union + hash partition)") {
    import spark.implicits._
    val left = Seq(("a", ts(1), 1.0)).toDF("k", "t", "x")
    val right = Seq(("a", ts(0), 2.0)).toDF("k2", "t2", "y")
    val plan = AsOfJoin.backward(left, right, "k", "k2", "t", "t2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_k"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
