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

  test("streaming statement: running phase, changelog results, stop") {
    val dirPath = java.nio.file.Files.createTempDirectory("stmt-stream")
    java.nio.file.Files.writeString(dirPath.resolve("b1.json"),
      """{"guid":"u1","eyeColor":"brown","age":41,"balance":"$10.00"}
        |{"guid":"u2","eyeColor":"blue","age":25,"balance":"$20.00"}
        |""".stripMargin)
    graft.sources.UserStream.file(spark, dirPath.toString)
      .createOrReplaceTempView("user_stream")
    val stmts = new Statements(spark)
    // no keyCols: the facade derives the grouping key from the plan
    val stmt = stmts.create(
      "SELECT eyeColor, count(*) AS n FROM user_stream GROUP BY eyeColor")
    try {
      assert(stmt.isStreaming)
      assert(stmts.waitForStatus(stmt, Set(Phase.Running)).isDefined)
      stmt.handle.get.processAllAvailable()
      val results = stmt.results()
      val got = Iterator.continually(results.next())
        .take(10).flatten.map(_.row).toSet
      assert(got == Set(Vector("brown", 1L), Vector("blue", 1L)))
      // second file = next page of the continuous query
      java.nio.file.Files.writeString(dirPath.resolve("b2.json"),
        """{"guid":"u3","eyeColor":"brown","age":52,"balance":"$30.00"}
          |""".stripMargin)
      stmt.handle.get.processAllAvailable()
      val more = Iterator.continually(results.next())
        .take(10).flatten.map(r => (r.op, r.row)).toSet
      assert(more.contains((Some(1), Vector("brown", 1L)))) // -U old
      assert(more.contains((Some(2), Vector("brown", 2L)))) // +U new
    } finally {
      stmt.stop()
      assert(stmt.phase == Phase.Completed)
    }
  }

  test("statements are memoized by SQL text") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    val stmts = new Statements(spark)
    val a = stmts.create("SELECT count(*) AS n FROM nation")
    val b = stmts.create("SELECT count(*) AS n FROM nation")
    assert(a eq b)
  }

  test("same SQL with different keyCols is a distinct statement") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    val stmts = new Statements(spark)
    val sql = "SELECT n_regionkey, n_name, count(*) AS n FROM nation " +
      "GROUP BY n_regionkey, n_name"
    val a = stmts.create(sql)
    val b = stmts.create(sql, keyCols = Seq("n_regionkey", "n_name"))
    assert(!(a eq b), "different changelog keying must not reuse the memo")
    assert(stmts.create(sql, keyCols = Seq("n_regionkey", "n_name")) eq b)
  }

  test("a failing batch statement reaches the failed phase") {
    Tables.registerAll(spark, SparkTestSession.sf0001)
    val stmts = new Statements(spark)
    // analyzes fine, fails at execution: ANSI cast of a non-numeric string
    val stmt = stmts.create(
      "SELECT CAST(n_name AS INT) + 1 AS boom FROM nation")
    intercept[Exception] {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      try stmt.results().foreach(_ => ())
      finally spark.conf.set("spark.sql.ansi.enabled", "false")
    }
    assert(stmt.phase == Phase.Failed)
    assert(stmts.waitForStatus(stmt, Set(Phase.Completed)).isEmpty,
      "waitForStatus returns None on failed")
  }
}
