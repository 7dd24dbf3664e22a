package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fidelity checks for the approximate similarity operators vs their exact
  * baselines. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("lsh pairs are a subset of exact pairs with decent recall") {
    val exact = Similarity.v2CosinePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.v3AnnLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "lsh verification must enforce the threshold")
    if (exact.nonEmpty) {
      val recall = exact.count(lsh.contains).toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall too low: exact=$exact lsh=$lsh")
    }
  }

  test("ivf top-k hits overlap brute-force top-k") {
    val exact = Similarity.v1AnnTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.v4AnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // IVF probes one cell: approximate by design; just require real overlap
    val overlap = exact.count(ivf.contains).toDouble / exact.size
    assert(overlap >= 0.2, s"ivf overlap $overlap suspiciously low")
  }

  test("brute-force top-k is k rows per query, ranked by cosine desc") {
    val rows = Similarity.v1AnnTopK(spark, dir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.QueryCount)
    byQuery.values.foreach { rs =>
      assert(rs.length == Similarity.K)
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
