package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver contract, pinned: every query has an oracle and vice versa —
 * a query without an oracle would silently lose its value-exact gate row,
 * and an oracle without a query would make the driver's compare fail on a
 * missing parquet dump. Also guards the naming convention and non-empty
 * SQL (an empty string would make DuckDB error the whole gate).
 */
class ContractSpec extends AnyFunSuite {

  test("SparkEntry.queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the q_snake convention and oracles are non-empty SQL") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("q[a-z0-9_]+"), s"bad query name: $n")
    }
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"),
        s"oracle for $n is not runnable SQL")
    }
  }

  test("Verify.costOrder mentions every query exactly once (cheap-first ordering intact)") {
    // not a hard requirement (unknown names sort last), but a missing entry
    // silently runs a new query at the end regardless of its real cost, and
    // a duplicate would double-run under a subset filter built on it
    val order = {
      val f = Verify.getClass.getDeclaredFields.find(_.getName.contains("costOrder"))
      f.foreach(_.setAccessible(true))
      f.map(_.get(Verify).asInstanceOf[Seq[String]]).getOrElse(Seq.empty)
    }
    assert(order.nonEmpty, "costOrder not found via reflection")
    val dupes = order.groupBy(identity).collect { case (n, v) if v.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate costOrder entries: $dupes")
    val missing = SparkEntry.queries.keySet -- order.toSet
    assert(missing.isEmpty, s"queries missing from Verify.costOrder: ${missing.toSeq.sorted}")
  }
}
