package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.changelog.Changelog
import graft.sources.Tables

class StatementsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("batch statement: create → completed → results as +I changelog") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    val stmts = new Statements(spark)
    val stmt = stmts.create(
      "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment")
    assert(stmt.name.startsWith("stmt-") && stmt.name.length == "stmt-".length + 12)
    assert(stmt.phase == Phase.Completed)
    assert(stmt.columns == Seq("c_mktsegment", "n"))
    assert(stmts.waitForStatus(stmt, Set(Phase.Completed)).isDefined)

    val cl = new Changelog(stmt.columns, stmt.results())
    cl.consume()
    val table = cl.collapse()
    assert(table.size == 5)
    assert(table.columns == Seq("c_mktsegment", "n"))
  }

  test("statements are memoized by SQL text") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    val stmts = new Statements(spark)
    val a = stmts.create("SELECT count(*) AS n FROM nation")
    val b = stmts.create("SELECT count(*) AS n FROM nation")
    assert(a eq b)
  }
}
