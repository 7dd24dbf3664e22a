package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("bucketed join plans no exchange on the fact sides and matches the shuffled join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Bucketing.bucketedJoin(spark, dir)
    // at sf0.001 Spark would broadcast the small side (also exchange-free,
    // but that proves nothing about bucketing) — pin to sort-merge so the
    // assertion demonstrates bucket co-location
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (li, ord) = Bucketing.prepare(spark, dir)
      val joinOnly = spark.table(li)
        .join(spark.table(ord), $"l_orderkey" === $"o_orderkey")
      val plan = joinOnly.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    val shuffled = graft.sources.Tables.load(spark, dir, "lineitem")
      .join(graft.sources.Tables.load(spark, dir, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1.0) - $"l_discount").cast("decimal(18,2)"))
        .cast("double").as("revenue"))
    assert(df.collect().map(_.toSeq).toSet ==
      shuffled.collect().map(_.toSeq).toSet)
  }

  // the registry-level proof (r8 verdict item #3): q3/q10 over the
  // bucketed facts must (a) plan ZERO shuffle on the order key — the
  // pre-aggregate and the fact-fact join both ride the bucket layout —
  // and (b) return exactly the unbucketed answer (the driver's oracle
  // additionally hash-checks both against DuckDB at sf0.01)
  test("bucketed q3/q10 plan no orderkey exchange and match the unbucketed results") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // static plan: AQE re-wraps stages and hides exchanges from collect()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((bucketed, plain, label) <- Seq(
          (Bucketing.q3Bucketed(spark, dir),
            Relational.q3JoinAgg(spark, dir), "q3"),
          (Bucketing.q10Bucketed(spark, dir),
            Relational.q10StarJoin(spark, dir), "q10"))) {
        val shuffles = bucketed.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s
        }
        val onOrderkey = shuffles.filter(
          _.outputPartitioning.toString.toLowerCase.contains("orderkey"))
        assert(onOrderkey.isEmpty,
          s"$label bucketed must not shuffle on the order key:\n" +
            onOrderkey.map(_.outputPartitioning).mkString("\n"))
        // the layout may change the plan, never the answer
        assert(bucketed.collect().map(_.toSeq).toSeq ==
          plain.collect().map(_.toSeq).toSeq,
          s"$label bucketed diverged from the unbucketed result")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // one session measuring several scale rungs (graft.Scaling) must get
  // one bucketed layout PER source dir — a session-global table name
  // would silently serve the first rung's data to every later rung
  test("bucketed tables are per-source-dir within one session") {
    val dir2 = "/root/testdata/sf0.01"
    val a = Bucketing.q3Bucketed(spark, dir)
    val b = Bucketing.q3Bucketed(spark, dir2)
    val plainB = Relational.q3JoinAgg(spark, dir2)
    assert(b.collect().map(_.toSeq).toSeq ==
      plainB.collect().map(_.toSeq).toSeq,
      "second dir's bucketed q3 must reflect the second dir's data")
    assert(a.collect().map(_.toSeq).toSeq !=
      b.collect().map(_.toSeq).toSeq,
      "different source dirs cannot share one bucketed table")
  }
}
