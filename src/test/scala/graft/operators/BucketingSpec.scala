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
}
