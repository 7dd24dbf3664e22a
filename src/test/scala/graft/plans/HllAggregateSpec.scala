package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HllAggregate: register/estimator fidelity against a driver-side
  * recompute, partition invariance, and the cross-engine determinism
  * evidence the q23 oracle rests on. */
class HllAggregateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** Driver-side register build over the same md5 slices. */
  private def driverRegisters(values: Iterable[String]): Array[Byte] = {
    val regs = new Array[Byte](HllAggregate.M)
    values.foreach { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      def nib(j: Int): Int = (d(j / 2) >> (4 * (1 - j % 2))) & 0xf
      val idx = (nib(0) << 8) | (nib(1) << 4) | nib(2)
      var w = 0L
      (3 until 16).foreach(j => w = (w << 4) | nib(j))
      val rho =
        if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > (regs(idx) & 0xff)) regs(idx) = rho.toByte
    }
    regs
  }

  test("estimate equals the driver recompute per group, and is " +
      "repartition-invariant") {
    val s = spark
    import s.implicits._
    val li = graft.sources.Tables.load(s, dir, "lineitem")
      .select($"l_returnflag", $"l_partkey".cast("string").as("pk"))
    val got = li.groupBy($"l_returnflag")
      .agg(HllAggregate.hllDistinct($"pk").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byGroup = li.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    byGroup.foreach { case (g, rows) =>
      val exp = HllAggregate.estimate(driverRegisters(rows.map(_._2)))
      assert(got(g) == exp, s"group $g: ${got(g)} vs driver $exp")
      // sanity: the fixture cardinalities sit in the linear-counting
      // regime and the estimate lands within the HLL error envelope
      val exact = rows.map(_._2).distinct.length.toDouble
      assert(math.abs(got(g) - exact) / exact <= 0.05,
        s"group $g: est ${got(g)} vs exact $exact")
    }
    val again = li.repartition(7).groupBy($"l_returnflag")
      .agg(HllAggregate.hllDistinct($"pk").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got, "estimate changed under repartitioning")
  }

  test("a non-string child fails at analysis, not mid-job") {
    val s = spark
    import s.implicits._
    val li = graft.sources.Tables.load(s, dir, "lineitem")
    val ex = intercept[Exception] {
      li.groupBy($"l_returnflag")
        .agg(HllAggregate.hllDistinct($"l_partkey").as("est"))
        .collect()
    }
    assert(ex.getMessage.contains("hll_distinct_md5") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }

  test("duplicate rows are no-ops: registers max-merge") {
    val s = spark
    import s.implicits._
    val base = (1 to 500).map(_.toString).toDF("v")
    val dup = base.union(base).union(base)
    val a = base.agg(HllAggregate.hllDistinct($"v")).head().getLong(0)
    val b = dup.agg(HllAggregate.hllDistinct($"v")).head().getLong(0)
    assert(a == b, s"duplicates moved the estimate: $a vs $b")
  }

  test("the linear-counting domain is libm-stable: the rounded " +
      "m·ln(m/zeros) values match the pinned checksum the oracle was " +
      "verified against") {
    // floor(4096·ln(4096/z)+0.5) was compared bit-for-bit between this
    // JVM and DuckDB's glibc ln for EVERY z in [1, 4096] (raw ln differs
    // on 4 of 4096 arguments by 1 ulp; the rounding absorbs all four).
    // This checksum pins the JVM side so a platform/libm change that
    // could break the q23 oracle fails HERE, loudly, not in the driver
    // gate.
    var acc = 0L
    val m = HllAggregate.M
    (1 to m).foreach { z =>
      acc = acc * 1000003L +
        math.floor(m.toDouble * Math.log(m.toDouble / z) + 0.5).toLong
    }
    assert(acc == -5070876865277853599L,
      s"LC-domain checksum drifted: $acc — re-verify ln against DuckDB " +
        "before trusting the q23 oracle")
  }

  test("plan: the sketch partial-aggregates map-side (mergeable object " +
      "aggregate, no exact-distinct expand)") {
    val df = graft.operators.Relational.q23ApproxDistinct(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_hll_distinct_md5"),
      s"expected a partial (map-side) sketch stage:\n${plan.take(600)}")
    assert(!plan.toLowerCase.contains("expand"), plan.take(600))
  }
}
