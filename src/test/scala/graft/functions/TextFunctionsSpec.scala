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

  private def hashSets(n: Int, texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(shingleHashes($"text", n).as("sh"))
      .collect()
      .map(_.getSeq[Long](0).toSet)
      .toSeq
  }

  test("shingle hashes: short docs are empty, size n yields one hash") {
    assert(hashSets(3, "one", "one two") == Seq(Set.empty, Set.empty))
    assert(hashSets(3, "a b c").head.size == 1)
  }

  test("shingle hashes match the string-shingle sets exactly (fixture)") {
    // equivalence on real data: per doc, |distinct hash set| == |distinct
    // string set|, and pairwise intersection sizes agree — i.e. the hash
    // is a faithful dictionary encoding of the string shingles (what d3's
    // df counts and shared counts actually consume)
    import spark.implicits._
    val docs = graft.sources.Tables
      .load(spark, SparkTestSession.sf0001, "documents")
      .select($"doc_id", $"text",
        shingles(tokens($"text"), 3).as("ss"),
        shingleHashes($"text", 3).as("hs"))
      .collect()
    val byId = docs.map(r =>
      (r.getLong(0), (r.getSeq[String](2).toSet, r.getSeq[Long](3).toSet)))
    byId.foreach { case (id, (ss, hs)) =>
      assert(ss.size == hs.size, s"doc $id distinct-shingle count differs")
    }
    // intersection sizes over a deterministic sample of pairs
    val sample = byId.sortBy(_._1).take(30)
    for ((i, (s1, h1)) <- sample; (j, (s2, h2)) <- sample if i < j) {
      assert((s1 & s2).size == (h1 & h2).size,
        s"intersection size differs for docs $i,$j")
    }
  }

  test("shingle hashes are order-sensitive and split-compatible") {
    // (a b c) != (c b a); consecutive spaces produce empty tokens exactly
    // like split(text, " ") — "a  b c" tokenizes to [a, "", b, c]
    val Seq(abc, cba) = hashSets(3, "a b c", "c b a")
    assert(abc != cba)
    val Seq(gap, flat) = hashSets(3, "a  b", "a b")
    assert(gap.size == 1 && flat.isEmpty) // [a,"",b]: one trigram window
  }
}
