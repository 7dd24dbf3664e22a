package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's three declared queries (`/root/reference/dashboard.py:
  * 83,100,118-132`), re-hosted on Catalyst and executed through the SQL-text
  * path — the same contract the reference ships to the remote Flink service
  * (`/root/reference/api/statements.py:73-76`): the engine receives SQL,
  * Catalyst parses/plans it.
  *
  * The Kafka `user` topic is re-targeted at a deterministic `user` view
  * derived from `customer` (FIXTURES.md §3): guid=c_name,
  * eyeColor=lower(c_mktsegment), age=20+c_custkey%50, balance a
  * `$`-prefixed decimal string — so `CAST(substring(balance FROM 2) AS
  * DOUBLE)` exercises the exact demo parsing path (S6/S7).
  * Query 1's RAND() jitter is nondeterministic by design → rows-only for
  * the driver; its bounds are asserted in DemoQueriesSpec.
  */
object DemoQueries {

  /** The user-shaped dynamic table (view) over the customer fixture. */
  def registerUserView(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(
        $"c_name".as("guid"),
        lower($"c_mktsegment").as("eyeColor"),
        (lit(20) + $"c_custkey" % 50).cast("int").as("age"),
        concat(lit("$"),
          $"c_acctbal".cast("decimal(12,2)").cast("string")).as("balance"))
      .createOrReplaceTempView("user")
  }

  /** The same view as a DuckDB CTE, for the oracle side. */
  val userCte: String =
    """WITH "user" AS (
      |  SELECT c_name AS guid,
      |         lower(c_mktsegment) AS "eyeColor",
      |         CAST(20 + c_custkey % 50 AS INT) AS age,
      |         '$' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS balance
      |  FROM customer)""".stripMargin

  /** Query 1 — user locations (reference dashboard.py:100): projection +
    * backtick-quoted identifier + RAND() jitter arithmetic. Seeded rand for
    * run-to-run stability within Spark; still engine-specific → rows-only. */
  def demo1UserLocations(spark: SparkSession, dir: String): DataFrame = {
    registerUserView(spark, dir)
    spark.sql(
      """SELECT `user`.guid,
        |  37.7 + (RAND(42) * (37.77 - 37.7)) AS latitude,
        |  -122.50 + (RAND(24) * (-122.39 - (-122.50))) AS longitude
        |FROM `user`""".stripMargin)
      .orderBy("guid")
  }

  /** Query 2 — eye colors (reference dashboard.py:83): streaming-updatable
    * group-count. */
  def demo2EyeColors(spark: SparkSession, dir: String): DataFrame = {
    registerUserView(spark, dir)
    spark.sql(
      """SELECT eyeColor, count(*) AS eye_color_count
        |FROM `user`
        |GROUP BY eyeColor
        |ORDER BY eyeColor""".stripMargin)
  }

  /** Query 3 — users per age group (reference dashboard.py:118-132): CTE +
    * substring/CAST + searched CASE + BETWEEN + grouped AVG. AVG is
    * decimal-summed (sum/count) for oracle exactness; count(*) participates
    * in the division but is NOT projected — the reference emits exactly
    * `age_group, avg_balance` (dashboard.py:128-131). */
  def demo3AgeGroups(spark: SparkSession, dir: String): DataFrame = {
    registerUserView(spark, dir)
    spark.sql(
      """WITH users_with_age_groups AS (
        |  SELECT CAST(substring(balance FROM 2) AS DOUBLE) AS balance_double,
        |    CASE
        |      WHEN age BETWEEN 20 AND 29 THEN '20s'
        |      WHEN age BETWEEN 30 AND 39 THEN '30s'
        |      WHEN age BETWEEN 40 AND 49 THEN '40s'
        |      WHEN age BETWEEN 50 AND 59 THEN '50s'
        |      ELSE 'other'
        |    END AS age_group
        |  FROM `user`)
        |SELECT age_group,
        |  CAST(SUM(CAST(balance_double AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    AS avg_balance
        |FROM users_with_age_groups
        |GROUP BY age_group
        |ORDER BY age_group""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "demo1_user_locations" -> demo1UserLocations _,
    "demo2_eye_colors" -> demo2EyeColors _,
    "demo3_age_groups" -> demo3AgeGroups _,
  )

  val oracleSql: Map[String, String] = Map(
    "demo2_eye_colors" ->
      s"""$userCte
         |SELECT "eyeColor", count(*) AS eye_color_count
         |FROM "user" GROUP BY "eyeColor" ORDER BY "eyeColor"""".stripMargin,
    "demo3_age_groups" ->
      s"""$userCte,
         |users_with_age_groups AS (
         |  SELECT CAST(substring(balance FROM 2) AS DOUBLE) AS balance_double,
         |    CASE
         |      WHEN age BETWEEN 20 AND 29 THEN '20s'
         |      WHEN age BETWEEN 30 AND 39 THEN '30s'
         |      WHEN age BETWEEN 40 AND 49 THEN '40s'
         |      WHEN age BETWEEN 50 AND 59 THEN '50s'
         |      ELSE 'other'
         |    END AS age_group
         |  FROM "user")
         |SELECT age_group,
         |  CAST(SUM(CAST(balance_double AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         |    AS avg_balance
         |FROM users_with_age_groups
         |GROUP BY age_group
         |ORDER BY age_group""".stripMargin,
  )
}
