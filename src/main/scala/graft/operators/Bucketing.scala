package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Bucketed co-located join: the 100 TB answer to the lineitem⋈orders
  * shuffle that q3/q10 pay on every run. Both fact tables are written
  * bucketed (and sorted) by the join key; Spark then plans a SortMergeJoin
  * with **zero Exchange** — each bucket pair joins locally. At cluster
  * scale this turns the per-query O(data) shuffle into a one-time write
  * cost amortized over every subsequent join on that key.
  *
  * BucketingSpec asserts the exchange-free plan and result equality with
  * the shuffled join.
  */
object Bucketing {

  /** Write lineitem and orders bucketed by order key into the session
    * warehouse (idempotent per session AND per source dir — the table
    * names embed a digest of `dir`, so one session measuring several
    * scale rungs, as `graft.Scaling` does, gets one bucketed layout per
    * rung instead of silently reusing the first rung's data). Returns
    * the table names. Bucket count matches local[32] parallelism here;
    * at cluster scale it would be sized to ~2× total cores (the write
    * is one-time, the exchange elimination pays on every subsequent
    * orderkey join). */
  def prepare(spark: SparkSession, dir: String,
              buckets: Int = 32): (String, String) = {
    val stamp = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    val li = s"graft_lineitem_bkt_$stamp"
    val ord = s"graft_orders_bkt_$stamp"
    if (!spark.catalog.tableExists(li)) {
      // the in-memory catalog forgets tables across JVMs but their files
      // survive in the warehouse dir — clear stale locations first
      val wh = java.nio.file.Paths.get(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      Seq(li, ord).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = wh.resolve(t)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete)
        }
      }
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(li)
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ord)
    }
    (li, ord)
  }

  /** Revenue per order over the bucketed tables — joins without any
    * Exchange on the fact sides. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (li, ord) = prepare(spark, dir)
    spark.table(li).join(spark.table(ord), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1.0) - $"l_discount").cast(DecimalType(18, 2)))
        .cast(DoubleType).as("revenue"))
      .orderBy($"o_custkey")
  }

  /** q3 over orderkey-bucketed lineitem/orders: the per-orderkey
    * pre-aggregate AND the fact-fact join run on the bucket layout with
    * ZERO Exchange on the order key — the 100 TB exchange-eliminator the
    * unbucketed q3's scaladoc names. Same join tree ([[Relational.q3Over]]),
    * same oracle hash; BucketingSpec asserts the orderkey-shuffle-free
    * plan. customer stays a plain parquet scan (its join is on custkey —
    * a different co-location decision). */
  def q3Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = prepare(spark, dir)
    Relational.q3Over(spark.table(li), spark.table(ord),
      Tables.load(spark, dir, "customer"))
  }

  /** q10 over orderkey-bucketed facts — see [[q3Bucketed]]; dims stay
    * broadcast parquet scans. */
  def q10Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = prepare(spark, dir)
    Relational.q10Over(spark.table(li), spark.table(ord),
      Tables.load(spark, dir, "customer"),
      Tables.load(spark, dir, "nation"),
      Tables.load(spark, dir, "region"))
  }
}
