package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextFunctions._

/** Edge cases of the text building blocks, notably shingles() on documents
  * shorter than the n-gram width — without the size guard, sequence(1, 0)
  * yields the descending [1, 0] and slice(toks, 0, n) throws at runtime. */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def shingleSets(texts: String*): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(shingles(tokens($"text"), 3).as("sh"))
      .collect()
      .map(_.getSeq[String](0))
      .toSeq
  }

  test("shingles of docs shorter than n are empty, not a runtime error") {
    assert(shingleSets("one", "one two") == Seq(Seq.empty, Seq.empty))
  }

  test("shingles at exactly n tokens yield one shingle") {
    assert(shingleSets("a b c") == Seq(Seq("a b c")))
  }

  test("shingles are distinct sliding 3-grams") {
    assert(shingleSets("a b c d a b c d") ==
      Seq(Seq("a b c", "b c d", "c d a", "d a b")))
  }
}
