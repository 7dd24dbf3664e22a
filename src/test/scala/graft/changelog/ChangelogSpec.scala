package graft.changelog

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ChangelogSpec extends AnyFunSuite {

  private def raw(op: Int, vs: Any*): Option[RawRecord] =
    Some(RawRecord(Some(op), vs.toVector))

  test("ops decode wire codes 0-3 to +I/-U/+U/-D") {
    assert(Op.all.map(_.code) == Seq(0, 1, 2, 3))
    assert(Op.all.map(_.label) == Seq("+I", "-U", "+U", "-D"))
    assert(Op.fromCode(4).isEmpty)
  }

  test("update applies insert/update/delete semantics") {
    val t = new ResultTable(Seq("color", "n"))
    t.update(Seq(
      ChangelogRecord(Some(Op.Insert), Vector("brown", 1L)),
      ChangelogRecord(Some(Op.UpdateBefore), Vector("brown", 1L)),
      ChangelogRecord(Some(Op.UpdateAfter), Vector("brown", 2L)),
      ChangelogRecord(Some(Op.Insert), Vector("blue", 1L))))
    assert(t.rows.toSet == Set(Vector("brown", 2L), Vector("blue", 1L)))
  }

  test("append-only records (op=None) always append") {
    val t = new ResultTable(Seq("a"))
    t.update(Seq(ChangelogRecord(None, Vector(1)), ChangelogRecord(None, Vector(1))))
    assert(t.rows == Seq(Vector(1), Vector(1)))
  }

  test("retracting a missing row is tolerated and counted") {
    val t = new ResultTable(Seq("a"))
    t.update(Seq(ChangelogRecord(Some(Op.Delete), Vector("ghost"))))
    assert(t.size == 0)
    assert(t.missedRetractions == 1)
  }

  test("delete removes only the first value-equal row (multiset)") {
    val t = new ResultTable(Seq("a"))
    t.update(Seq(
      ChangelogRecord(Some(Op.Insert), Vector("x")),
      ChangelogRecord(Some(Op.Insert), Vector("x")),
      ChangelogRecord(Some(Op.Delete), Vector("x"))))
    assert(t.rows == Seq(Vector("x")))
  }

  test("consume validates arity against the schema") {
    val cl = new Changelog(Seq("a", "b"), Iterator(raw(0, 1)))
    val e = intercept[IllegalArgumentException](cl.consume())
    assert(e.getMessage.contains("2 columns but row has 1"))
  }

  test("consume rejects invalid op codes") {
    val cl = new Changelog(Seq("a"), Iterator(raw(7, 1)))
    intercept[IllegalArgumentException](cl.consume())
  }

  test("consume skips heartbeats without counting them toward the limit") {
    val cl = new Changelog(Seq("a"),
      Iterator(None, raw(0, 1), None, raw(0, 2), None))
    val got = cl.consume(2)
    assert(got.map(_.values) == Seq(Vector(1), Vector(2)))
    assert(cl.consume(1).isEmpty) // only heartbeat left
  }

  test("consume is incremental and history is append-only") {
    val cl = new Changelog(Seq("a"), Iterator(raw(0, 1), raw(0, 2), raw(0, 3)))
    assert(cl.consume(1).map(_.values) == Seq(Vector(1)))
    assert(cl.consume(5).map(_.values) == Seq(Vector(2), Vector(3)))
    assert(cl.history.size == 3)
    assert(cl.columns == Seq("op", "a"))
  }

  test("opsReceived tracks the distinct ops seen") {
    val cl = new Changelog(Seq("a"), Iterator(raw(0, 1), raw(1, 1), raw(2, 2)))
    cl.consume()
    assert(cl.opsReceived == Set(Op.Insert, Op.UpdateBefore, Op.UpdateAfter))
  }

  // The reference's documented contract (lib/flink.py:4-20): consuming in
  // chunks and updating incrementally is equivalent to one full collapse.
  test("property: incremental consume+update == collapse, any chunking") {
    val genRec: Gen[Option[RawRecord]] = Gen.frequency(
      1 -> Gen.const(None),
      6 -> (for {
        op <- Gen.oneOf(0, 1, 2, 3)
        v <- Gen.choose(0, 5)
      } yield Some(RawRecord(Some(op), Vector(v)))))
    val genCase = for {
      records <- Gen.listOf(genRec)
      chunks <- Gen.nonEmptyListOf(Gen.choose(1, 7))
    } yield (records, chunks)

    (0 until 300).foreach { i =>
      val (records, chunks) =
        genCase.pureApply(Gen.Parameters.default, Seed(42L + i))
      val full = new Changelog(Seq("v"), records.iterator)
      full.consume()
      val expected = full.collapse()

      val inc = new Changelog(Seq("v"), records.iterator)
      val table = new ResultTable(Seq("v"))
      var j = 0
      var done = false
      while (!done) {
        val got = inc.consume(chunks(j % chunks.size))
        if (got.isEmpty) done = true else table.update(got)
        j += 1
      }
      assert(table.toMultiset == expected.toMultiset,
        s"case $i: $records chunked $chunks")
      assert(table.missedRetractions == expected.missedRetractions)
    }
  }
}
