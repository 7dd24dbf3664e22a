package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2A) expressed Spark-first over the
  * fixture tables: scan, project, filter, CASE WHEN, BETWEEN, substring/CAST,
  * CTE-shaped pipelines, hash aggregation, joins (broadcast/shuffle/semi/
  * anti), windows, set ops, distinct, rollup, sort/limit.
  *
  * The reference declares S1-S14 as Flink SQL text executed remotely
  * (`/root/reference/dashboard.py:83,100,118-132`); here each shape is a
  * declarative DataFrame plan so Catalyst does pushdown/pruning/partial-agg.
  *
  * Determinism rules (the driver hash-compares against a DuckDB oracle):
  *   - double sums are computed over DECIMAL(18,2) casts so the result does
  *     not depend on partition/summation order, then cast back to double;
  *   - averages are sum_decimal/count (double division of identical
  *     operands), never engine-native avg over doubles;
  *   - every query ends in a total ORDER BY matching the oracle's.
  *
  * Scale notes are per-query in the scaladoc.
  */
object Relational {

  /** Exact decimal view of a money/two-decimal double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-independent sum of a two-decimal double column, as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Q1 — pricing summary (TPC-H Q1 shape): filter + group-agg.
    * Exercises S2 projection, S10 hash agg, S11 count, S12 avg.
    * Scale: partial aggregation map-side; 6 groups → final agg is tiny.
    * Filter on l_shipdate is pushed to the parquet scan. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" < lit("2001-06-01"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount"))
          .cast(DoubleType).as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2 — filter + projection with pushdown (S2/S9 BETWEEN).
    * Scale: predicate + column pruning must reach the scan
    * (PushedFilters/ReadSchema in explain). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_discount".between(0.05, 0.07) && $"l_quantity" < 10)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Q3 — join + aggregation: revenue per market segment.
    * customer is SF-PROPORTIONAL (TPC-H SF×150k rows), so it gets NO
    * broadcast hint: at fixture scale AQE broadcasts it from measured
    * size; at 100 TB the same plan degrades gracefully to a shuffle
    * join instead of a forced driver OOM (only the fixed-cardinality
    * nation/region dims are hint-broadcast anywhere — q42/q43's "no
    * broadcast assumption" rule). lineitem⋈orders shuffles on the order
    * key (the natural co-partition key at 100 TB: bucket both by
    * orderkey to eliminate this exchange). */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame =
    q3Over(
      Tables.load(spark, dir, "lineitem"),
      Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "customer"))

  /** q3's join tree over caller-supplied fact frames — shared by the
    * parquet path above and [[Bucketing.q3Bucketed]], where lineitem and
    * orders arrive bucketed by order key and the whole orderkey stage
    * (pre-aggregate + fact-fact join) plans with ZERO Exchange
    * (BucketingSpec plan-asserts it; the oracle hash is identical). */
  private[operators] def q3Over(lineitem: DataFrame, orders: DataFrame,
                                customer: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val cust = customer.select($"c_custkey", $"c_mktsegment")
    val ord = orders.select($"o_orderkey", $"o_custkey")
    val li = lineitem.select($"l_orderkey", $"l_extendedprice", $"l_discount")
    // q10's aggregate pushdown: (revenue, item count) partial-sums per
    // orderkey, then per custkey, so each join carries aggregated grains
    // instead of raw lineitems — decimal sums and counts reassociate
    // exactly; the oracle aggregates after the joins and the hash match
    // proves the identity
    li.select($"l_orderkey",
        (dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount")).as("rev"))
      .groupBy($"l_orderkey")
      .agg(sum($"rev").as("rev"), count(lit(1)).as("n"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"rev").as("rev"), sum($"n").as("n"))
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum($"rev").cast(DoubleType).as("revenue"),
        sum($"n").as("n_items"))
      .orderBy($"c_mktsegment")
  }

  /** Q4 — searched CASE WHEN + BETWEEN buckets + grouped avg: the
    * age-groups demo query re-targeted at customer balances
    * (reference dashboard.py:118-132 — CTE, CASE WHEN ×4, BETWEEN,
    * GROUP BY, AVG). */
  def q4CaseWhenBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withBucket = Tables.load(spark, dir, "customer")
      .select($"c_acctbal",
        when($"c_acctbal".between(0, 2499.99), "0-2499")
          .when($"c_acctbal".between(2500, 4999.99), "2500-4999")
          .when($"c_acctbal".between(5000, 7499.99), "5000-7499")
          .when($"c_acctbal".between(7500, 9999.99), "7500-9999")
          .otherwise("other").as("balance_group"))
    withBucket
      .groupBy($"balance_group")
      .agg(
        count(lit(1)).as("n_customers"),
        (dsum($"c_acctbal") / count(lit(1))).as("avg_balance"))
      .orderBy($"balance_group")
  }

  /** Q5 — substring + CAST: the balance-parsing demo shape
    * (reference dashboard.py:120 `CAST(substring(balance FROM 2) AS
    * DOUBLE)`) re-targeted at c_name's numeric suffix. */
  def q5SubstringCast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_name",
        substring($"c_name", 10, Int.MaxValue).cast("bigint").as("parsed_key"),
        $"c_custkey")
      .filter($"parsed_key" === $"c_custkey")
      .orderBy($"c_custkey")
  }

  /** Q6 — the eye-colors demo query shape (reference dashboard.py:83:
    * group on a low-cardinality string, count(*)) on c_mktsegment. */
  def q6GroupCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("seg_count"))
      .orderBy($"c_mktsegment")
  }

  /** Q7 — top-k per group via ranking window: top 3 customers by balance
    * per nation. Scale: window partitions by n_nationkey — one shuffle,
    * no global sort; k is applied before any collect. */
  def q7TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.load(spark, dir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"c_nationkey", $"rk", $"c_custkey", $"c_acctbal")
      .orderBy($"c_nationkey", $"rk")
  }

  /** Q8 — semi/anti joins: customers with ≥1 order vs customers with none
    * (EXISTS / NOT EXISTS). Emitted as one union'd frame with a tag.
    * Scale: left_semi/left_anti never materialize the right payload. */
  def q8SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer").select($"c_custkey")
    val ord = Tables.load(spark, dir, "orders").select($"o_custkey")
    val withOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", lit("has_orders").as("tag"))
    val without = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", lit("no_orders").as("tag"))
    withOrders.unionAll(without).orderBy($"c_custkey")
  }

  /** Q9 — DISTINCT + set operations: segments present in customer
    * minus segments of customers with negative balance (EXCEPT),
    * plus INTERSECT of order priorities across order status. */
  def q9SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val allSegs = cust.select($"c_mktsegment".as("val"))
    val negSegs = cust.filter($"c_acctbal" < 0).select($"c_mktsegment".as("val"))
    val except = allSegs.except(negSegs).select($"val", lit("except").as("op"))
    val ord = Tables.load(spark, dir, "orders")
    val priF = ord.filter($"o_orderstatus" === "F").select($"o_orderpriority".as("val"))
    val priO = ord.filter($"o_orderstatus" === "O").select($"o_orderpriority".as("val"))
    val intersect = priF.intersect(priO).select($"val", lit("intersect").as("op"))
    except.unionAll(intersect).orderBy($"op", $"val")
  }

  /** Q10 — multi-way star join (TPC-H Q5 shape): revenue by nation.
    * region/nation are hint-broadcast (fixed 5/25 rows at ANY scale
    * factor); customer is SF-proportional and therefore NOT hinted —
    * AQE broadcasts it while it measures small and falls back to a
    * shuffle join at 100 TB instead of OOMing the driver (same rule as
    * q3). orders⋈lineitem shuffles on orderkey. */
  def q10StarJoin(spark: SparkSession, dir: String): DataFrame =
    q10Over(
      Tables.load(spark, dir, "lineitem"),
      Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "customer"),
      Tables.load(spark, dir, "nation"),
      Tables.load(spark, dir, "region"))

  /** q10's star join over caller-supplied frames — shared with
    * [[Bucketing.q10Bucketed]] (orderkey-bucketed facts ⇒ the fact-fact
    * stage plans exchange-free; see q3Over). */
  private[operators] def q10Over(li: DataFrame, ord: DataFrame,
      cust: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    // aggregate pushdown through the join tree: revenue partial-sums per
    // orderkey BEFORE the fact-fact join (the map-side combine collapses
    // ~rows-per-order lineitems ahead of the exchange, and the join then
    // carries order-grain rows), again per custkey before the customer
    // join — decimal sums are exactly reassociable, so the pushed-down
    // plan is value-identical to aggregating after all joins (the oracle
    // still does the latter; the hash match proves the identity)
    val perOrder = li
      .select($"l_orderkey",
        (dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount")).as("rev"))
      .groupBy($"l_orderkey").agg(sum($"rev").as("rev"))
    val perCust = perOrder
      .join(ord.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey").agg(sum($"rev").as("rev"))
    perCust
      .join(cust.select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(nation.select($"n_nationkey", $"n_name", $"n_regionkey")),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region.select($"r_regionkey", $"r_name")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"rev").cast(DoubleType).as("revenue"))
      .orderBy($"r_name", $"n_name")
  }

  /** Q11 — date/time bucketing: daily event counts + exact value sums.
    * Dates are emitted as strings so oracle comparison is
    * representation-stable across engines. */
  def q11DateAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  /** Q12 — ROLLUP with coalesced group keys (grouping-sets surface).
    * NULL subtotal markers are coalesced to 'ALL' so ordering and
    * hashing are stable across engines. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread=true (r12): ROLLUP's Expand (×3) + decimal partial agg fuse
    // into the scan stage — one-row-group input ran it single-task
    // (interleaved A/B: 0.58× spread; same shape as q27's 0.59×)
    Tables.load(spark, dir, "lineitem", spread = true)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  /** Q13 — HAVING + countDistinct: order priorities whose distinct
    * customer count exceeds a threshold. */
  def q13HavingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_cust"),
        count(lit(1)).as("n_orders"))
      .filter($"n_orders" > 10)
      .orderBy($"o_orderpriority")
  }

  /** Q14 — global sort + limit (top-k): 10 largest orders. Tie-broken on
    * the key so the result is total-ordered. Scale: Spark's
    * TakeOrderedAndProject computes per-partition top-k then merges —
    * no full global sort. */
  def q14TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** Q15 — analytic window functions: running revenue + lag per customer
    * over their order history. */
  def q15RunningWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.load(spark, dir, "orders")
      .filter($"o_custkey" < 50)
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"),
        $"o_totalprice",
        sum(dec($"o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"),
        lag($"o_orderkey", 1).over(w).as("prev_orderkey"),
        row_number().over(w).as("seq"))
      .orderBy($"o_custkey", $"seq")
  }

  /** Q16 — correlated-scalar shape: each order vs its customer's average
    * order value (join against a grouped subquery). */
  def q16GroupedSubquery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
    val custAvg = ord.groupBy($"o_custkey".as("k"))
      .agg((dsum($"o_totalprice") / count(lit(1))).as("cust_avg"))
    ord.join(custAvg, $"o_custkey" === $"k")
      .filter($"o_totalprice" > $"cust_avg" * 2)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"cust_avg")
      .orderBy($"o_orderkey")
  }

  /** Q17 — scalar function surface: string + exact math functions
    * (upper/lower/trim-class, concat, replace, length, abs/floor/ceil/
    * sqrt — all IEEE-exact or integral, so oracle-stable). */
  def q17ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select($"p_partkey",
        upper($"p_brand").as("brand_upper"),
        lower($"p_type").as("type_lower"),
        length($"p_name").as("name_len"),
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        regexp_replace($"p_name", " ", "_").as("name_snake"),
        abs($"p_size" - lit(25)).as("size_dist"),
        floor($"p_retailprice").cast("bigint").as("price_floor"),
        ceil($"p_retailprice").cast("bigint").as("price_ceil"),
        sqrt($"p_size".cast(DoubleType)).as("size_sqrt"))
      .orderBy($"p_partkey")
  }

  /** Q18 — tumbling time window (batch twin of the streaming windowed
    * aggregate): hourly event buckets via window(). The streaming version
    * (watermark + same window) is exercised in StreamingEventsSpec; this
    * batch twin is the oracle-checkable semantics anchor. */
  def q18TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** Q19 — as-of join (an operator Spark lacks natively), composed from
    * built-ins per the preference order: for each event, the most recent
    * prior 'signup' event of the same user via last_value(IGNORE NULLS)
    * over an unbounded-preceding window. One shuffle on user_id; no
    * range-join explosion. */
  def q19AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        last(when($"event_type" === "signup", $"event_id"), ignoreNulls = true)
          .over(w).as("prev_signup_event"))
      .orderBy($"event_id")
  }

  /** Q20 — semi-structured access: JSON field extraction from the string
    * props column + LIKE + IN predicates. */
  def q20JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .filter($"event_type".isin("purchase", "signup") &&
        $"props".like("%k%"))
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").cast("int").as("k_value"))
      .filter($"k_value" >= 50)
      .orderBy($"event_id")
  }

  /** Q21 — gap-based sessionization: split each user's event stream into
    * sessions separated by >30 min of silence (lag + cumulative session
    * counter — the batch twin of session_window in streaming). Gap math in
    * integer microseconds for oracle exactness. */
  def q21Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val gapUs = SessionGapUs
    Tables.load(spark, dir, "events")
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("duration_us"))
      .orderBy($"user_id", $"sess_id")
  }

  /** Q22 — skew-resistant aggregation via salting: events.user_id is
    * heavily skewed (~15 users over the whole table), so a direct groupBy
    * funnels everything into ~15 reducer tasks. Salt the key into 16
    * subkeys, partially aggregate, then merge — two cheap shuffles instead
    * of one skewed one. Decimal partials keep the final doubles exact, so
    * the result hash-matches the unsalted oracle. */
  def q22SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
      .groupBy($"user_id", $"salt")
      .agg(count(lit(1)).as("pn"), sum(dec($"value")).as("pv"))
      .groupBy($"user_id")
      .agg(sum($"pn").as("n_events"),
        sum($"pv").cast(DoubleType).as("sum_value"))
      .orderBy($"user_id")
  }

  /** Q23 — sketch-based distinct counting: HyperLogLog per group. At
    * 100 TB the sketch is the only viable path (fixed-size mergeable
    * state, map-side combinable); the exact count's expand-and-shuffle is
    * the scale-killer and deliberately does NOT appear in this query —
    * the relative-error bound vs exact is asserted spec-side
    * (RelationalSpec), where exactness belongs.
    *
    * ORACLE-EXACT as of r8 via [[graft.plans.HllAggregate]], the
    * md5-twin HLL (m = 4096, rsd ≈ 1.6% — tighter than the 2% this
    * query contracted through `approx_count_distinct(_, 0.02)` before):
    * DuckDB replays registers, the exact-integer Z sum, and the rounded
    * estimator from the raw column; see the aggregate's scaladoc for the
    * cross-engine determinism argument (incl. the exhaustively-verified
    * linear-counting domain). */
  def q23ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        graft.plans.HllAggregate.hllDistinct($"l_partkey".cast("string"))
          .as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  /** Q24 — pivot-style conditional aggregation: one pass over events,
    * per-user counts by event type via filtered aggregates (the map-side-
    * combinable form of PIVOT — a true PIVOT is this plus column renaming). */
  def q24ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        count(when($"event_type" === "purchase", 1)).as("n_purchase"),
        count(when($"event_type" === "error", 1)).as("n_error"),
        count(when($"event_type" === "click", 1)).as("n_click"),
        count(lit(1)).as("n_total"),
        sum(when($"event_type" === "purchase", dec($"value")))
          .cast(DoubleType).as("purchase_value"))
      .orderBy($"user_id")
  }

  /** Q25 — sequence/funnel detection (the MATCH_RECOGNIZE-shaped
    * capability): purchases preceded by a signup of the same user within
    * 1 hour, counted per day. Composed from the as-of machinery (q19):
    * last signup timestamp via IGNORE-NULLS window, then the time-bound
    * predicate — one shuffle on user_id. */
  def q25Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hourUs = 3600L * 1000000
    Tables.load(spark, dir, "events")
      .withColumn("last_signup_us",
        last(when($"event_type" === "signup", unix_micros($"ts")),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"last_signup_us".isNotNull &&
        unix_micros($"ts") - $"last_signup_us" <= hourUs)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"day")
  }

  /** Q26 — interval (range) join: per user, count ordered event pairs
    * within one hour of each other — the temporal-join family member the
    * as-of join (q19) doesn't cover (bounded-window pairing vs
    * latest-preceding lookup). The equi-key on user_id makes this a plain
    * hash/merge join with the range condition as a post-filter — never a
    * cartesian; at 100 TB the refinement is bucketing events by
    * (user, time-bucket) so candidate pairs co-locate exchange-free
    * (Bucketing.scala's shape). Time arithmetic in integer microseconds,
    * matching the oracle's epoch_us exactly. */
  def q26IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600L * 1000000
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id", unix_micros($"ts").as("us"))
    ev.as("a").join(ev.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"b.us" > $"a.us" && $"b.us" <= $"a.us" + hourUs)
      .groupBy($"a.user_id".as("user_id"))
      .agg(count(lit(1)).as("n_pairs_1h"))
      .orderBy($"user_id")
  }

  /** Q27 — CUBE grouping sets: counts and quantity sums for every
    * combination of (returnflag, linestatus) including both one-sided
    * subtotals and the grand total — the full grouping-set lattice where
    * q12's ROLLUP is only the prefix chain. Same physical shape as any
    * grouped agg (Expand + two-phase hash aggregate, 4× input rows for 2
    * cube columns — the multiplier is the cost knob at 100 TB); NULL
    * markers coalesced to 'ALL' for stable cross-engine ordering. */
  def q27Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread=true (r12): CUBE's Expand (×4) + decimal partial agg fuse
    // into the scan stage — one-row-group input ran it single-task
    // (interleaved A/B: 0.59× spread; also clears the r11 verdict's
    // q27 re-measure item — the cost was the unsplit Expand, not drift)
    Tables.load(spark, dir, "lineitem", spread = true)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  /** Q37 — GROUPING SETS (the general form behind q12's ROLLUP and q27's
    * CUBE): exactly the requested aggregation levels — (status),
    * (priority), and the grand total — in ONE pass (Catalyst plans an
    * Expand over the three sets with a single two-phase aggregate, not
    * three scans + union). Per-column grouping() flags disambiguate a
    * NULL group key from a super-aggregate row engine-portably, where a
    * combined grouping_id bit order would be an engine convention. */
  def q37GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").as("g_status"),
        grouping($"o_orderpriority").as("g_priority"),
        count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_total"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_status", $"g_priority", $"n", $"sum_total")
      .orderBy($"g_status", $"g_priority", $"status", $"priority")
  }

  /** Q28 — UNPIVOT (wide → long): per-user event-type counts computed as
    * a wide conditional aggregate (q24's shape), then unpivoted to
    * (user_id, metric, n) rows via the `stack` generator — the transform
    * that feeds metric stores and long-format consumers. stack is a
    * narrow generator (no shuffle beyond the aggregation's own); the
    * oracle expresses the identical desugaring as a UNION ALL. */
  def q28Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        count(when($"event_type" === "purchase", 1)).as("purchase"),
        count(when($"event_type" === "error", 1)).as("error"),
        count(when($"event_type" === "click", 1)).as("click"))
      .select($"user_id", expr(
        "stack(3, 'purchase', purchase, 'error', error, 'click', click) AS (metric, n)"))
      .orderBy($"user_id", $"metric")
  }

  /** Q29 — PIVOT (long → wide): per-user-bucket spend by event type as a
    * wide table, the inverse of q28's UNPIVOT. `pivot` with an explicit
    * value list compiles to the same conditional-aggregate plan as q24
    * (no extra pass to discover distinct keys — at 100 TB the implicit
    * form would need one); sums are DECIMAL(18,2) for order-independent
    * aggregation, cast to double only at the output edge. */
  def q29Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.load(spark, dir, "events")
      .select(($"user_id" % 10).as("user_bucket"), $"event_type",
        dec($"value").as("v"))
      .groupBy($"user_bucket")
      .pivot("event_type", types)
      .agg(sum($"v"))
      .select($"user_bucket" +:
        types.map(t => coalesce(col(t), lit(0)).cast(DoubleType).as(t)): _*)
      .orderBy($"user_bucket")
  }

  /** Q30 — window-frame suite: per-user event sequences with a bounded
    * moving sum (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), lag delta,
    * quartile bucket (ntile) and percent_rank — the analytic-frame
    * surface q15's running total doesn't cover. All frames are keyed by
    * user_id (parallel windows, no global sort until the final ORDER BY);
    * the moving sum aggregates DECIMAL(18,2); percent_rank is one IEEE
    * division of exact ints, so everything is oracle-exact. */
  def q30WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wv = Window.partitionBy($"user_id").orderBy($"value".asc, $"event_id".asc)
    Tables.load(spark, dir, "events")
      .filter($"user_id" < 40)
      .select($"user_id", $"event_id", $"value",
        sum(dec($"value")).over(w.rowsBetween(-3, Window.currentRow))
          .cast(DoubleType).as("moving_sum4"),
        lag($"value", 1).over(w).as("prev_value"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(wv).as("value_pct_rank"))
      .orderBy($"user_id", $"event_id")
  }

  /** Q31 — correlated subqueries: EXISTS, NOT EXISTS, and a correlated
    * scalar COUNT, written as SQL text (the surface a reference user
    * actually types). Catalyst de-correlates all three into joins — the
    * EXISTS becomes a left-semi, the NOT EXISTS a left-anti, and the
    * scalar subquery a left-outer aggregate join — so at 100 TB this is
    * three hash joins on o_custkey, not a per-customer probe loop
    * (plan-asserted in PlanAuditSpec: no subquery node survives). */
  def q31ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    // namespaced view names: registry queries must not clobber (or leak
    // into) session-global names like `customer` that a long-lived
    // Statements server or another fixture dir may own
    Tables.load(spark, dir, "customer").createOrReplaceTempView("q31_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q31_orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM q31_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderpriority = '1-URGENT') AS n_urgent
        |FROM q31_customer c
        |WHERE EXISTS (SELECT 1 FROM q31_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM q31_orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Q38 — null-aware NOT IN vs NOT EXISTS: SQL's classic three-valued-
    * logic trap, demonstrated as data. A NOT IN whose subquery contains
    * any NULL is UNKNOWN for every probe row (zero rows survive), while
    * the NOT EXISTS twin of the same predicate keeps everything — the
    * difference a migration from the reference's Flink SQL must preserve
    * exactly. Physically this is its own operator class: Spark plans the
    * nullable single-column NOT IN as a null-aware anti-join (a
    * broadcast join with null-key tracking), NOT a plain LeftAnti —
    * de-correlation alone cannot express the UNKNOWN semantics.
    *
    * Scale: all three variants aggregate to one row; the null-free
    * NOT IN decays to an ordinary anti-join on the (broadcast-sized)
    * filtered key set. */
  /** Bin width (µs) for q39 — equal to the interval length, so every
    * interval covers at most two bins. */
  val RangeBinUs: Long = 30L * 60 * 1000000

  /** Q21's session gap — shared with its oracle SQL so query and oracle
    * can never desynchronize on the constant. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Q39 — range join WITHOUT an equi-key, made scalable by binning: count
    * all events (any user) inside each incident's [t0, t0+30min) window.
    * The naive formulation is a nested-loop filter — O(|events|×|incidents|)
    * and a BroadcastNestedLoopJoin in the plan, the join shape that
    * cannot survive 100 TB. Binning restores hash-join physics (the
    * Databricks/Delta "range join optimization" recipe): events carry
    * their time bin (us DIV binWidth), each interval explodes into the
    * ≤2 bins it covers, the join runs as an EQUI-join on the bin, and the
    * range predicate verifies inside the join. A pair can only meet in
    * the event's own bin, so no dedupe step exists. RelationalSpec
    * asserts the plan has a hash/merge join and NO nested-loop join, and
    * that the result equals the naive formulation. */
  def q39RangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", unix_micros($"ts").as("us"))
    val incidents = ev.filter($"event_id" % 50 === 0)
      .select($"event_id".as("incident_id"), $"us".as("t0"),
        ($"us" + RangeBinUs).as("t1"))
      .withColumn("bin", explode(sequence(
        expr(s"t0 DIV $RangeBinUs"), expr(s"(t1 - 1) DIV $RangeBinUs"))))
    ev.withColumn("bin", expr(s"us DIV $RangeBinUs"))
      .join(incidents,
        Seq("bin")).where($"us" >= $"t0" && $"us" < $"t1")
      .groupBy($"incident_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"incident_id")
  }

  def q38NotInNulls(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("q38_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q38_orders")
    spark.sql(
      """SELECT 'not_in_null_free' AS variant, count(*) AS n
        |FROM q38_customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM q38_orders
        |                        WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT 'not_in_nullable' AS variant, count(*) AS n
        |FROM q38_customer
        |WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'F'
        |                          THEN o_custkey END FROM q38_orders)
        |UNION ALL
        |SELECT 'not_exists_twin' AS variant, count(*) AS n
        |FROM q38_customer c
        |WHERE NOT EXISTS (SELECT 1 FROM q38_orders o
        |                  WHERE CASE WHEN o.o_orderstatus = 'F'
        |                    THEN o.o_custkey END = c.c_custkey)
        |ORDER BY variant""".stripMargin)
  }

  /** Q32 — ordered string aggregation (LISTAGG/STRING_AGG): per nation,
    * the comma-joined names of its high-balance customers. Expressed as
    * `array_join(array_sort(collect_list(..)))` — the sort inside the
    * aggregate makes the result order-independent of partitioning, which
    * is what makes it oracle-exact (DuckDB: string_agg .. ORDER BY).
    *
    * Scale: collect_list materializes the group — correct only because
    * the group is bounded by the acctbal filter (a top-tier slice, not
    * the corpus). An unbounded-group listagg at 100 TB is a design error
    * upstream of the engine; cap with slice()/top-k first. */
  def q32ListAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .filter($"c_acctbal" >= 9000.0)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_top"),
        array_join(array_sort(collect_list($"c_name")), ",").as("names"))
      .orderBy($"c_nationkey")
  }

  /** Q33 — generator with ordinality (LATERAL VIEW posexplode): tokens of
    * the low-id documents with their positions — the long-format
    * tokenized form sequence models consume. posexplode is a narrow
    * generator: rows fan out in place with no shuffle (1-exchange plan =
    * just the final ORDER BY; asserted in PlanAuditSpec). */
  def q33PosExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
      .orderBy($"doc_id", $"pos")
  }

  /** Q34 — bag-semantics set operations (EXCEPT ALL / INTERSECT ALL):
    * q9 covers the DISTINCT set ops; these preserve multiplicity — the
    * difference that matters when the inputs are event streams, not keys.
    * The raw bag result is multiplicity-many identical rows, so the query
    * aggregates it to (value, n) — the EXCEPT ALL/INTERSECT ALL operators
    * still execute (Spark plans them as count-and-replicate aggregates:
    * two-phase, shuffle on the value — the scale-correct shape). */
  def q34BagSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
    val priF = ord.filter($"o_orderstatus" === "F")
      .select($"o_orderpriority".as("val"))
    val priO = ord.filter($"o_orderstatus" === "O")
      .select($"o_orderpriority".as("val"))
    val exceptAll = priF.exceptAll(priO)
      .groupBy($"val").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    val intersectAll = priF.intersectAll(priO)
      .groupBy($"val").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    exceptAll.unionAll(intersectAll)
      .select($"op", $"val", $"n")
      .orderBy($"op", $"val")
  }

  /** Morton bit-spread: distribute the low 16 bits of a long across the
    * even bit positions of a 32-bit lane (the classic magic-mask ladder).
    * Pure long arithmetic — stays in codegen, and the oracle mirrors the
    * identical shift/mask ladder so z-keys are engine-exact. */
  private def mortonSpread(c: Column): Column = {
    var x = c
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Q35 — Z-order layout audit: interleave 16-bit grid cells of
    * (o_custkey, order day) into a Morton key and report per-bucket
    * min/max spans of BOTH dimensions — the file-layout step behind
    * multi-column data skipping (Delta/Iceberg OPTIMIZE ZORDER BY): sort
    * by z-key and every file's footer min/max is tight on custkey AND
    * date simultaneously, so either predicate prunes ~√selectivity of
    * files, where a single-column sort prunes only its own column.
    *
    * The 10-bit bucket prefix (top 5 bits of each dimension) guarantees
    * every bucket spans ≤ 2¹¹ of the 2¹⁶ grid cells in each dimension —
    * a structural property of the curve, asserted per-row by the oracle
    * comparison here and per-partition after an actual repartitionByRange
    * write in the spec.
    *
    * Scale shape: grid normalization uses corpus min/max (a 1-row
    * broadcast); the z-key is pure per-row long arithmetic; the audit's
    * only exchange is the 1024-bucket aggregate. The layout write itself
    * (repartitionByRange(zkey) + sortWithinPartitions) adds one range
    * exchange — the same cost as any global sort, paid once at write
    * time. */
  /** Orders with their Morton z-key and grid cells — shared by q35's
    * audit and [[zOrderWrite]] so the key derivation cannot drift. */
  private def zKeyedOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        // NTZ → timestamp is identity under the UTC session timezone
        expr("unix_millis(cast(o_orderdate AS timestamp)) DIV 86400000")
          .as("dayn"))
    val st = o.agg(min($"o_custkey").as("minc"), max($"o_custkey").as("maxc"),
      min($"dayn").as("mind"), max($"dayn").as("maxd"))
    o.crossJoin(broadcast(st))
      // DIV, not `/`: Column./ is IEEE double division and its truncation
      // can disagree with exact integer division in the last cell; DIV
      // matches DuckDB's `//` bit-for-bit on longs
      .withColumn("xc",
        expr("(o_custkey - minc) * 65535 DIV greatest(maxc - minc, 1)"))
      .withColumn("xd",
        expr("(dayn - mind) * 65535 DIV greatest(maxd - mind, 1)"))
      .select($"o_orderkey", $"o_custkey", $"dayn",
        mortonSpread($"xc")
          .bitwiseOR(shiftleft(mortonSpread($"xd"), 1)).as("zkey"),
        $"xc", $"xd")
  }

  def q35ZOrderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zKeyedOrders(spark, dir)
      .withColumn("zbucket", shiftright($"zkey", 22))
      .groupBy($"zbucket")
      .agg(count(lit(1)).as("n_orders"),
        min($"xc").as("min_cust_cell"), max($"xc").as("max_cust_cell"),
        min($"xd").as("min_day_cell"), max($"xd").as("max_day_cell"))
      .orderBy($"zbucket")
  }

  /** The actual OPTIMIZE ZORDER write q35 audits: range-partition the
    * orders by z-key, sort within each partition, write one parquet file
    * per range — every file's min/max is then tight on custkey AND order
    * day SIMULTANEOUSLY, so a point predicate on EITHER column prunes
    * most files from its footer stats alone. Library function like p11
    * (it writes; returns per-file column spans for the caller to audit).
    * RelationalSpec proves the skipping quantitatively against a
    * randomly-partitioned write of the same rows. */
  def zOrderWrite(spark: SparkSession, dir: String, out: String,
                  nFiles: Int = 16): DataFrame = {
    import spark.implicits._
    zKeyedOrders(spark, dir)
      .repartitionByRange(nFiles, $"zkey")
      .sortWithinPartitions($"zkey")
      .select($"o_orderkey", $"o_custkey", $"dayn", $"zkey")
      .write.mode("overwrite").parquet(out)
    // per-file spans, read back the way a footer-stats pruner sees them
    spark.read.parquet(out)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        min($"o_custkey").as("min_cust"), max($"o_custkey").as("max_cust"),
        min($"dayn").as("min_day"), max($"dayn").as("max_day"))
  }

  /** Q36 — time-series resample + forward fill: bucket each user's
    * purchases into hours, materialize the FULL hourly calendar between
    * their first and last purchase (sequence + explode), left-join the
    * observations in, and carry the last observed hourly sum forward
    * through the gaps (last IGNORE NULLS over an unbounded-preceding
    * window) — the gap-filling resample every time-series feature
    * pipeline needs and SQL lacks as a primitive.
    *
    * Scale shape: the hourly pre-aggregation shrinks events to one row
    * per (user, active hour) BEFORE any calendar explode; the calendar
    * is per-user-span-bounded (explode factor = timeline hours, not
    * events); the join and the fill window both key on user_id — one
    * co-partitioned exchange, per-user state bounded by the timeline.
    * The emitted audit aggregates per user (1 row/user, not 1/hour).
    * Carried sums are re-quantized to cent-longs before summing (a double
    * sum over filled values would be reduction-order-dependent).
    *
    * AT SCALE, USE [[q48GapFillSparse]]: the dense calendar explode is
    * this query's honest weakness — a user active across years emits one
    * row per timeline HOUR whether or not anything happened, which is
    * why q36 is the suite's costliest query at the sf1 rung (~10 s vs
    * q48's 0.6 s for the oracle-identical answer). q36 is retained as
    * the oracle-friendly dense twin that pins the fill semantics; q48
    * computes the same per-user audit from observation-to-observation
    * gap arithmetic (lead − hr) without materializing a single filled
    * row. This O(users × span) growth is DECLARED in the scaling ladder
    * (`expected_superlinear` in Scaling/SCALING.json): the cost scales
    * with the time dimension independently of event count, so it is a
    * demo-tier form by complexity class, not a plan defect to retry
    * away. */
  def q36GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .withColumn("hr", expr("unix_micros(ts) DIV 3600000000"))
      .groupBy($"user_id", $"hr")
      .agg(dsum($"value").as("v"))
    val cal = hourly.groupBy($"user_id")
      .agg(min($"hr").as("h0"), max($"hr").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("hr"))
    val w = Window.partitionBy($"user_id").orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("filled", last($"v", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_hours"),
        count($"v").as("n_obs"),
        (count(lit(1)) - count($"v")).as("n_gaps"),
        (sum(when($"v".isNull, round($"filled" * 100).cast("long"))
          .otherwise(0L)).cast(DoubleType) / 100).as("gap_carried"))
      .orderBy($"user_id")
  }

  /** Q48 — SPARSE gap-fill: q36's scale tier, identical per-user answer,
    * no calendar. The dense path's explode factor is (active-hour span ×
    * users) — the suite's largest absolute cost at the sf1 rung (10.6 s)
    * and unbounded in the time dimension: a year-long 100 TB event table
    * pays 8 760 calendar rows per user however sparse its activity. But
    * everything q36 reports is a function of OBSERVED rows only: the
    * forward-filled value through a gap is constant (the last
    * observation), so each observed hour contributes
    * (next_hr − hr − 1) × round(v·100) carried cents via one lead()
    * over the same (user_id, hr) sort — rows = observed hours, the
    * calendar never materializes, and the integers (hence the emitted
    * doubles) are identical to the dense path's, so one oracle covers
    * both. q36 stays as the dense, oracle-friendly form (and the shape a
    * user needs when the filled SERIES itself is the output). */
  def q48GapFillSparse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .withColumn("hr", expr("unix_micros(ts) DIV 3600000000"))
      .groupBy($"user_id", $"hr")
      .agg(dsum($"value").as("v"))
    val w = Window.partitionBy($"user_id").orderBy($"hr")
    hourly
      .withColumn("gap",
        coalesce(lead($"hr", 1).over(w) - $"hr" - 1, lit(0L)))
      .groupBy($"user_id")
      .agg((max($"hr") - min($"hr") + 1).as("n_hours"),
        count(lit(1)).as("n_obs"),
        (max($"hr") - min($"hr") + 1 - count(lit(1))).as("n_gaps"),
        (sum($"gap" * round($"v" * 100).cast("long")).cast(DoubleType) / 100)
          .as("gap_carried"))
      .orderBy($"user_id")
  }

  /** Q40 — SCD2 historization (change-data-capture → temporal table): per
    * user, compress the event stream to state CHANGES (event_type ≠ its
    * predecessor), then stitch each change into a [valid_from, valid_to)
    * validity interval with lead(); the open interval is flagged
    * is_current. The standard warehouse move for turning an append-only
    * log into a point-in-time-queryable dimension (Kimball type-2), and
    * the batch twin of what a streaming pipeline would maintain with
    * keyed state.
    *
    * Scale shape: both windows and the change filter key on user_id —
    * ONE co-partitioned exchange feeds lag, filter, and lead (Catalyst
    * reuses the sort+partitioning; the filter between them is narrow);
    * per-user state is the sort buffer, never global. Timestamps are
    * emitted as epoch micros (the q21 rule: cross-engine timestamp
    * hashing is avoided; integers compare exactly). */
  def q40Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2Intervals(spark, dir)
      .orderBy($"user_id", $"valid_from_us", $"change_id")
  }

  /** The unordered SCD2 interval table q40 emits and q46 probes — one
    * co-partitioned exchange on user_id feeds lag, the change filter, and
    * lead (Catalyst reuses the sort+partitioning). */
  private def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
      .withColumn("valid_to_us", lead(unix_micros($"ts"), 1).over(w))
      .select($"user_id", $"event_id".as("change_id"),
        $"event_type".as("state"),
        unix_micros($"ts").as("valid_from_us"), $"valid_to_us",
        $"valid_to_us".isNull.cast("int").as("is_current"))
  }

  /** Number of equally spaced probe instants q46 evaluates. */
  val AsOfProbeCount = 7

  /** Q46 — temporal point-in-time (AS OF) lookup over the SCD2 dimension:
    * for each of [[AsOfProbeCount]] probe instants spanning the event
    * range, return every user's state valid AT that instant — Flink SQL's
    * `FOR SYSTEM_TIME AS OF` temporal join, the query shape the
    * reference's platform answers against a versioned dimension and the
    * operation q40's intervals exist to serve. A user whose first change
    * is after the probe has no row (the entity did not exist yet), and
    * the open interval matches every probe ≥ its valid_from — both
    * standard temporal-table semantics.
    *
    * Scale shape: the probe grid is derived from ONE tiny bounds
    * aggregate (2 longs) and stays ≤ [[AsOfProbeCount]] rows, so the
    * interval table streams through a broadcast nested-loop against a
    * 7-row build side — linear in intervals, no interval self-join, no
    * per-probe rescan. Probe times are integer microsecond arithmetic
    * (lo + k·span DIV 8), engine-exact. */
  def q46AsOfState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bounds = Tables.load(spark, dir, "events")
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
    val probes = bounds
      .select(explode(sequence(lit(1), lit(AsOfProbeCount))).as("probe_idx"),
        $"lo", $"hi")
      .select($"probe_idx",
        expr(s"lo + ((hi - lo) * probe_idx) DIV ${AsOfProbeCount + 1}")
          .as("t_us"))
    scd2Intervals(spark, dir)
      .join(broadcast(probes),
        $"t_us" >= $"valid_from_us" &&
          ($"valid_to_us".isNull || $"t_us" < $"valid_to_us"))
      .select($"probe_idx", $"t_us", $"user_id", $"state", $"valid_from_us")
      .orderBy($"probe_idx", $"user_id")
  }

  /** Q41 — time-RANGE window frame: per user, the trailing-hour running
    * count and sum of purchase values at each purchase (RANGE BETWEEN
    * 3600 PRECEDING AND CURRENT ROW over epoch seconds) — the VALUE-based
    * frame q30's ROWS frames cannot express: "last hour" is a time span,
    * not a row count, and peers at the same second share one frame by
    * definition on both engines. Values are cent-quantized longs before
    * the frame sum (the q36 rule — order-independent, engine-exact).
    *
    * Scale shape: one co-partitioned exchange on user_id feeds the sorted
    * range frame; per-user state is the frame buffer, bounded by the
    * densest hour, never the timeline. */
  def q41RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec")
      .rangeBetween(-3600, 0)
    Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        expr("unix_micros(ts) DIV 1000000").as("sec"),
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("n_hour", count(lit(1)).over(w))
      .select($"user_id", $"event_id", $"sec", $"n_hour",
        (sum($"cents").over(w).cast(DoubleType) / 100).as("hour_sum"))
      .orderBy($"user_id", $"sec", $"event_id")
  }

  /** Q42 — CDC MERGE (upsert-apply): fold a change feed into a keyed
    * snapshot in one pass — the operation every incremental warehouse
    * load runs (MERGE INTO in Delta/Iceberg terms; the reference's Flink
    * runtime maintains the same thing continuously as an updating
    * materialization, see SURVEY §2A S10). The change feed is `events`
    * keyed by user_id — the LATEST change per key wins (ts, event_id
    * tiebreak); the snapshot is `customer` restricted to c_custkey % 3
    * <> 0 so all three merge arms are exercised on every fixture scale:
    * matched+update (latest change is a normal event), matched+delete
    * (latest change is an 'error'), and not-matched+insert (a change key
    * outside the snapshot). A not-matched 'error' is a no-op, and an
    * untouched snapshot row passes through — the full MERGE matrix.
    *
    * Scale shape: the latest-per-key reduction is a max_by aggregate
    * (partial map-side, ONE shuffle on user_id — not a rank window, which
    * would sort every key's full history); the merge itself is a single
    * full-outer sort-merge join on the same key — co-partitioned with the
    * reduction, AQE-skew-splittable, no broadcast assumption on either
    * side (at 100 TB both snapshot and feed are large). Money stays in
    * cent-longs until emission (the q36 rule). */
  /** The latest-change-per-key reduction shared by q42 (merge) and q43
    * (direct diff): max_by aggregate, partial map-side, ONE shuffle on
    * user_id — not a rank window, which would sort every key's full
    * history.
    *
    * struct max = (us, eid, typ, cents) lexicographic — the trailing
    * fields only matter if a fixture ever duplicated (ts, event_id)
    * within a user; the oracle's row_number mirrors all four so a
    * pathological fixture fails deterministically, never flakily. */
  private[operators] def q42LatestChanges(spark: SparkSession,
                                          dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select($"user_id",
        struct(unix_micros($"ts").as("us"), $"event_id".as("eid"),
          $"event_type".as("typ"),
          round($"value" * 100).cast("long").as("cents")).as("ch"))
      .groupBy($"user_id")
      .agg(max($"ch").as("ch"))
      .select($"user_id", $"ch".getField("typ").as("ev_type"),
        $"ch".getField("cents").as("ev_cents"))
  }

  def q42MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val latest = q42LatestChanges(spark, dir)
    val target = Tables.load(spark, dir, "customer")
      .filter($"c_custkey" % 3 =!= 0)
      .select($"c_custkey", $"c_name", $"c_mktsegment",
        round($"c_acctbal" * 100).cast("long").as("cents"))
    target.join(latest, $"c_custkey" === $"user_id", "full_outer")
      .filter(coalesce($"ev_type", lit("")) =!= "error")
      .select(
        coalesce($"c_custkey", $"user_id").as("merge_key"),
        when($"c_custkey".isNull,
          concat(lit("cdc-"), $"user_id".cast("string")))
          .otherwise($"c_name").as("c_name"),
        when($"c_custkey".isNull, lit("NEW"))
          .otherwise($"c_mktsegment").as("c_mktsegment"),
        (coalesce($"ev_cents", $"cents").cast(DoubleType) / 100)
          .as("acctbal"),
        when($"c_custkey".isNull, lit("inserted"))
          .when($"ev_type".isNull, lit("kept"))
          .otherwise(lit("updated")).as("action"))
      .orderBy($"merge_key")
  }

  /** Q43 — snapshot DIFF → changelog: given two keyed snapshots of a
    * table, emit the exact change set between them in the engine's
    * changelog vocabulary — `+I` for new keys, `-D` for vanished keys, an
    * adjacent `-U`/`+U` pair (old values, new values) for changed rows,
    * nothing for identical rows. The inverse of q42's merge-apply (which
    * folds a changelog INTO a snapshot), and the batch form of what the
    * streaming changelog sink synthesizes per micro-batch: together they
    * round-trip snapshot ↔ changelog in both directions. Diffed here:
    * q42's target snapshot vs q42's merged output, so the emitted ops
    * mirror the merge's update/delete/insert arms by construction (a
    * spec cross-checks exactly that).
    *
    * Scale shape (restructured r13, guide §2.4 remove shuffles / §1.2
    * don't compute what you throw away): diff(before, merge(before,
    * latest)) is fully determined by `before ⋈ latest` — a before-only
    * key is by construction identical in both snapshots and diffs to
    * nothing, so materializing the merged snapshot just to re-shuffle
    * and re-compare it against its own input was waste. The r12 shape
    * chained TWO full-outer joins (snapshot shuffled at the merge,
    * merged snapshot re-shuffled at the diff, customer scanned twice: 5
    * exchanges, 3 scans); now ONE right-outer equi-join latest→snapshot
    * derives every op directly (3 exchanges, 2 scans — the snapshot
    * crosses the network once, and the latest side reuses its
    * aggregation partitioning). Branch-for-branch equivalence with the
    * old diff-of-merge, proven against the unchanged DuckDB oracle:
    * matched+'error' ⇒ the merge would drop the row ⇒ -D; unmatched
    * non-'error' ⇒ the merge would insert ⇒ +I; matched changed ⇒
    * -U/+U (a_name/a_seg always equal — both came from the same
    * customer row — so only the balance term can fire, but the full
    * comparison is kept verbatim, same null semantics); everything
    * else ⇒ no rows. The op fan-out stays a per-row array explode (≤2
    * structs) inside the join stage. No broadcast assumption: the
    * planner may broadcast the changelog side when it fits (the right
    * call at 100 TB — zero snapshot shuffle), and falls back to the
    * co-partitioned sort-merge join when it does not. */
  def q43SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val before = Tables.load(spark, dir, "customer")
      .filter($"c_custkey" % 3 =!= 0)
      .select($"c_custkey".as("bk"), $"c_name".as("a_name"),
        $"c_mktsegment".as("a_seg"),
        round($"c_acctbal" * 100).cast("long").as("a_cents"))
    val latest = q42LatestChanges(spark, dir)
    def rec(op: String, n: Column, s: Column, bal: Column): Column =
      struct(lit(op).as("op"), n.as("c_name"), s.as("c_mktsegment"),
        bal.as("acctbal"))
    val emptyT = "array<struct<op:string,c_name:string," +
      "c_mktsegment:string,acctbal:double>>"
    // value expressions byte-identical to the r12 diff-of-merge: a_bal
    // is the before leg's cents→double, b_* are exactly what q42's
    // projection would have produced for this row
    val aBal = $"a_cents".cast(DoubleType) / 100
    val bBal = coalesce($"ev_cents", $"a_cents").cast(DoubleType) / 100
    val bName = when($"bk".isNull,
      concat(lit("cdc-"), $"user_id".cast("string"))).otherwise($"a_name")
    val bSeg = when($"bk".isNull, lit("NEW")).otherwise($"a_seg")
    before.join(latest, $"bk" === $"user_id", "right_outer")
      .select(coalesce($"bk", $"user_id").as("merge_key"), explode(
        // latest-only 'error' rows are a no-op in BOTH snapshots: the
        // null-guarded inner when emits no rows for them, exactly as
        // they appeared in neither leg of the old full-outer diff
        when($"ev_type" === "error",
          when($"bk".isNotNull,
            array(rec("-D", $"a_name", $"a_seg", aBal)))
            .otherwise(lit(null).cast(emptyT)))
          .when($"bk".isNull, array(rec("+I", bName, bSeg, bBal)))
          .when($"a_name" =!= bName || $"a_seg" =!= bSeg || aBal =!= bBal,
            array(rec("-U", $"a_name", $"a_seg", aBal),
              rec("+U", bName, bSeg, bBal)))
          .otherwise(lit(null).cast(emptyT))).as("r")) // null array → no rows
      .select($"merge_key", $"r.op".as("op"), $"r.c_name",
        $"r.c_mktsegment", $"r.acctbal")
      // changelog adjacency convention (SURVEY L10): within a changed key
      // the retraction precedes the upsert — -U carries old values, then
      // +U the new ones; a replaying consumer must never see them inverted
      .orderBy($"merge_key",
        when($"op" === "-U", 1).when($"op" === "+U", 2).otherwise(0))
  }

  /** Q44 — incremental aggregate maintenance (IVM for GROUP BY): update a
    * materialized per-segment aggregate by applying q43's changelog as
    * signed group deltas — +I/+U add (+1 row, +cents), -D/-U subtract —
    * instead of re-aggregating the snapshot. The batch identity behind
    * every incrementally-maintained dashboard (and what the streaming
    * ChangelogStream sink maintains continuously): base agg ⊕ Δ(changelog)
    * ≡ agg(base ⊕ changelog). A -U/+U pair that moves a row ACROSS groups
    * (segment change) splits into a −delta in the old group and a +delta
    * in the new one; groups born in the changelog (the 'NEW' inserts)
    * appear via the full-outer delta join; groups whose count reaches
    * zero drop out. The ORACLE aggregates the merged snapshot directly,
    * so the hash match PROVES the maintenance identity, not just the
    * arithmetic.
    *
    * Scale shape: the delta side aggregates the CHANGELOG (small by
    * definition — that is the point of IVM), the base side aggregates
    * once; both partial map-side; one full-outer join on the group key
    * (segments here — broadcast-eligible under AQE, but not assumed).
    * Money stays in cent-longs until emission (q36 rule). */
  def q44IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val baseAgg = Tables.load(spark, dir, "customer")
      .filter($"c_custkey" % 3 =!= 0)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n0"),
        sum(round($"c_acctbal" * 100).cast("long")).as("c0"))
    val deltas = q43SnapshotDiff(spark, dir)
      .select($"c_mktsegment",
        when($"op".isin("+I", "+U"), 1L).otherwise(-1L).as("sgn"),
        round($"acctbal" * 100).cast("long").as("cents"))
      .groupBy($"c_mktsegment")
      .agg(sum($"sgn").as("dn"), sum($"sgn" * $"cents").as("dc"))
    baseAgg.join(deltas, Seq("c_mktsegment"), "full_outer")
      .select($"c_mktsegment",
        (coalesce($"n0", lit(0L)) + coalesce($"dn", lit(0L)))
          .as("n_customers"),
        (coalesce($"c0", lit(0L)) + coalesce($"dc", lit(0L))).as("cents"))
      .filter($"n_customers" > 0)
      .select($"c_mktsegment", $"n_customers",
        ($"cents".cast(DoubleType) / 100).as("total_acctbal"))
      .orderBy($"c_mktsegment")
  }

  /** Q45 — recursive CTE (WITH RECURSIVE, new in Spark 4): per-node
    * depth over the implicit binary tree parent(k) = k DIV 2 rooted at
    * c_custkey 1, rolled up to (depth, count, balance) — the iterative
    * closure the reference's SQL surface cannot express at all and
    * DuckDB runs natively (the same construct d6's oracle uses for
    * cluster closure; here the ENGINE side is recursive too). Depth is
    * logarithmic in the key space (≈17 at sf0.1), so the recursion is
    * bounded by construction — each iteration is one broadcast-joined
    * step of the frontier, Catalyst's UnionLoop.
    *
    * Scale note: a recursive CTE's work is (iterations × per-step join);
    * this shape keys the step on the parent equi-join, so each pass
    * shuffles only the frontier, never re-scans the accumulated result.
    * Money sums in cents (q36 rule). */
  def q45RecursiveDepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cache (r12): every UnionLoop iteration re-executes the step plan,
    // which re-scanned the parquet ~⌊log₂ keys⌋ times (once per depth
    // level); caching the recursion input pays one materialization per
    // run (Bench clearCache()s between runs) and each iteration reads
    // the in-memory relation instead. Narrowed to the two columns the
    // recursion touches (r13, guide §2.3 narrower types): the full-width
    // cache columnar-compressed every customer string per run while the
    // CTE reads only the key and the balance. Bench-neutral at sf0.1
    // (cmp 0.98× — 15 k rows compress in noise); the win term is cache
    // bytes, which at scale are dominated by the strings this drops.
    Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_acctbal").cache()
      .createOrReplaceTempView("customer_q45")
    spark.sql(s"""
      WITH RECURSIVE h (c_custkey, depth) AS (
        SELECT c_custkey, 0 FROM customer_q45 WHERE c_custkey = 1
        UNION ALL
        SELECT c.c_custkey, h.depth + 1
        FROM customer_q45 c JOIN h ON c.c_custkey DIV 2 = h.c_custkey
      )
      SELECT h.depth, count(*) AS n_nodes,
             CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_acctbal
      FROM h JOIN customer_q45 c ON h.c_custkey = c.c_custkey
      GROUP BY h.depth ORDER BY h.depth""")
  }

  /** Q47 — correlated LATERAL join (SQL:1999 lateral derived table,
    * Spark 4's DecorrelateInnerQuery surface): for every nation, the
    * top-2 customers by account balance, written as the per-row
    * dependent subquery a SQL user writes — not a hand-rolled window.
    * The POINT is the decorrelation: Catalyst rewrites the correlated
    * LIMIT subquery into one windowed rank over a single customer scan
    * (asserted in PlanAuditSpec), so the naive "re-execute the subquery
    * per outer row" semantics costs one shuffle at any scale — the
    * lateral surface with the q7 plan. Ties break on c_custkey; doubles
    * pass through unmodified (raw parquet values, engine-exact). */
  def q47LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "nation").createOrReplaceTempView("nation_q47")
    Tables.load(spark, dir, "customer")
      .createOrReplaceTempView("customer_q47")
    spark.sql("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation_q47 n,
      LATERAL (SELECT c_custkey, c_acctbal FROM customer_q47 c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_custkey""")
  }

  /** Q49 — NTILE decile table: per-nation customer-balance deciles
    * (bucket population + exact cents-quantized bucket bounds), the
    * equal-population histogram a mixture/quota designer reads before
    * writing threshold rules. NTILE is the one ranking window function
    * the registry had not exercised; assignment is the SQL-standard rule
    * (first n mod k buckets take the extra row) over the total order
    * (cents, c_custkey), so both engines tile identically.
    *
    * Scale shape: the window partitions by nation (dimension-bounded
    * fan-out, 25-way here) and each partition sorts once — exact
    * per-row decile tags fundamentally need the partition's full order.
    * At 100 TB-per-group scale the at-scale form is two-pass: p23's GK
    * sketch publishes approximate decile BOUNDARIES (mergeable, one
    * pass), then a map-side bucket assign tags rows — the trade (exact
    * tags vs rank-error ≤ εN) is the same one t6's scaladoc prices.
    * This query keeps the exact single-window form: it is the oracle
    * anchor the sketch path is audited against. */
  def q49NtileDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long").as("cents"))
    val nation = Tables.load(spark, dir, "nation")
      .select($"n_nationkey", $"n_name")
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"cents".asc, $"c_custkey".asc)
    cust.withColumn("decile", ntile(10).over(w))
      .groupBy($"c_nationkey", $"decile")
      .agg(count(lit(1)).as("n_cust"),
        (min($"cents").cast(DoubleType) / 100).as("lo_bal"),
        (max($"cents").cast(DoubleType) / 100).as("hi_bal"))
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"decile", $"n_cust", $"lo_bal", $"hi_bal")
      .orderBy($"n_name", $"decile")
  }

  /** Q50 — cumulative windowed COUNT DISTINCT via the first-seen
    * rewrite: distinct users per event type up to and including each
    * day. Spark (and SQL windows generally) cannot express
    * `count(DISTINCT x) OVER (... ROWS UNBOUNDED PRECEDING)`, and the
    * collect_set-over-window workaround shuffles every (user, event)
    * row into ONE unsplittable partition per type while holding the
    * growing set in memory. The rewrite is exact and distributed: a
    * user contributes to the running distinct count exactly on their
    * FIRST day (t12's first-occurrence pattern on the time axis) — so
    * min(day) per (type, user) [one map-side-combined shuffle],
    * first-seen counts per (type, day) [second map-side combine, output
    * ≤ types × days rows], then a running sum over that DIMENSION-SIZED
    * table (p3's bounded-window rule: the window never sees corpus-scale
    * rows). Emits per-day new-user and cumulative-distinct counts. */
  def q50CumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id",
        date_format($"ts", "yyyy-MM-dd").as("day"))
    // every ACTIVE (type, day) is an observation row — a day with events
    // but no new users keeps the running count flat rather than vanishing
    val activeDays = ev.groupBy($"event_type", $"day").agg(
      count(lit(1)).as("n_events"))
    val newCounts = ev.groupBy($"event_type", $"user_id")
      .agg(min($"day").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    activeDays.join(newCounts, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", $"n_events",
        coalesce($"n_new", lit(0L)).as("n_new_users"))
      .withColumn("cum_distinct_users", sum($"n_new_users").over(w))
      .orderBy($"event_type", $"day")
  }

  /** Q51 — statistical aggregate surface (stddev / correlation /
    * regression slope) with EXACT integer moments: the built-in
    * `stddev_samp`/`corr`/`regr_slope` accumulate doubles in partition
    * order, so their last ulps are partitioning-dependent and can never
    * hash-match a different engine. Instead every input quantizes to
    * cent longs (exact), the six raw moments (n, Σx, Σy, Σx², Σy², Σxy)
    * aggregate as DECIMAL(38,0) — order-independent, exact at any
    * partitioning, magnitudes bounded by n·(10⁷ cents)² ≈ 10²⁸ ≪ 10³⁸
    * even at billions of rows — and each published statistic is a SHORT
    * fixed composition of IEEE ops over those exact moments
    * (cast → subtract/multiply → divide → sqrt), identical in both
    * engines, rounded to 6 decimals (the v14 convention: a 1-ulp
    * decimal→double cast difference is ~10⁻¹⁶ relative and cannot move
    * the 6th decimal off a boundary except with vanishing probability —
    * the HLL large-range argument).
    *
    * Scale shape: one map-side-combined groupBy carrying six numbers per
    * group across the shuffle — the textbook moment-sketch; the window-
    * free plan is the same at 60k rows and 100 TB. */
  def q51StatsAggregates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_returnflag",
        round($"l_quantity" * 100).cast("long").as("x"),
        round($"l_extendedprice" * 100).cast("long").as("y"))
    // per-row products stay in long range (price ≤ 10^7 cents → y² ≤
    // 10^14 < 2^63); the SUMS are where 2^53/2^63 die, hence decimal
    val m = li.groupBy($"l_returnflag").agg(
      count(lit(1)).cast(d38).as("n"),
      sum($"x".cast(d38)).as("sx"),
      sum($"y".cast(d38)).as("sy"),
      sum(($"x" * $"x").cast(d38)).as("sxx"),
      sum(($"y" * $"y").cast(d38)).as("syy"),
      sum(($"x" * $"y").cast(d38)).as("sxy"))
    def dbl(c: Column): Column = c.cast(DoubleType)
    val varXNum = dbl($"n" * $"sxx" - $"sx" * $"sx")
    val varYNum = dbl($"n" * $"syy" - $"sy" * $"sy")
    val covNum = dbl($"n" * $"sxy" - $"sx" * $"sy")
    val sampDen = dbl($"n" * ($"n" - lit(1).cast(d38)))
    m.select($"l_returnflag",
        $"n".cast("long").as("n_rows"),
        round(dbl($"sx") / dbl($"n"), 6).as("mean_qty_cents"),
        round(sqrt(varXNum / sampDen), 6).as("stddev_qty_cents"),
        round(sqrt(varYNum / sampDen), 6).as("stddev_price_cents"),
        round(covNum / sqrt(varXNum * varYNum), 6).as("corr_qty_price"),
        round(covNum / varXNum, 6).as("slope_price_per_qty"))
      .orderBy($"l_returnflag")
  }

  /** All relational queries, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_stats_aggregates" -> q51StatsAggregates _,
    "q50_cumulative_distinct" -> q50CumulativeDistinct _,
    "q49_ntile_deciles" -> q49NtileDeciles _,
    "q47_lateral_topk" -> q47LateralTopk _,
    "q46_asof_state" -> q46AsOfState _,
    "q45_recursive_depth" -> q45RecursiveDepth _,
    "q44_incremental_agg" -> q44IncrementalAgg _,
    "q43_snapshot_diff" -> q43SnapshotDiff _,
    "q42_merge_upsert" -> q42MergeUpsert _,
    "q41_range_frame" -> q41RangeFrame _,
    "q40_scd2" -> q40Scd2 _,
    "q38_not_in_nulls" -> q38NotInNulls _,
    "q39_range_join_binned" -> q39RangeJoinBinned _,
    "q37_grouping_sets" -> q37GroupingSets _,
    "q36_gap_fill" -> q36GapFill _,
    "q48_gap_fill_sparse" -> q48GapFillSparse _,
    "q35_zorder_layout" -> q35ZOrderLayout _,
    "q34_bag_set_ops" -> q34BagSetOps _,
    "q29_pivot" -> q29Pivot _,
    "q30_window_frames" -> q30WindowFrames _,
    "q31_exists_subquery" -> q31ExistsSubquery _,
    "q32_listagg" -> q32ListAgg _,
    "q33_posexplode" -> q33PosExplode _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_filter_project" -> q2FilterProject _,
    "q3_join_agg" -> q3JoinAgg _,
    "q3_join_agg_bucketed" -> (Bucketing.q3Bucketed _),
    "q10_star_join_bucketed" -> (Bucketing.q10Bucketed _),
    "q4_casewhen_buckets" -> q4CaseWhenBuckets _,
    "q5_substring_cast" -> q5SubstringCast _,
    "q6_group_count" -> q6GroupCount _,
    "q7_topk_per_group" -> q7TopKPerGroup _,
    "q8_semi_anti" -> q8SemiAnti _,
    "q9_set_ops" -> q9SetOps _,
    "q10_star_join" -> q10StarJoin _,
    "q11_date_agg" -> q11DateAgg _,
    "q12_rollup" -> q12Rollup _,
    "q13_having_distinct" -> q13HavingDistinct _,
    "q14_topk" -> q14TopK _,
    "q15_running_window" -> q15RunningWindow _,
    "q16_grouped_subquery" -> q16GroupedSubquery _,
    "q17_scalar_functions" -> q17ScalarFunctions _,
    "q18_tumbling_window" -> q18TumblingWindow _,
    "q19_asof_join" -> q19AsOfJoin _,
    "q20_json_extract" -> q20JsonExtract _,
    "q21_sessionize" -> q21Sessionize _,
    "q22_salted_agg" -> q22SaltedAgg _,
    "q23_approx_distinct" -> q23ApproxDistinct _,
    "q24_conditional_agg" -> q24ConditionalAgg _,
    "q25_funnel" -> q25Funnel _,
    "q26_interval_join" -> q26IntervalJoin _,
    "q27_cube" -> q27Cube _,
    "q28_unpivot" -> q28Unpivot _,
  )

  /** Shared by q36 (dense calendar) and q48 (sparse lead-based): both
    * emit the identical per-user gap-fill aggregate, so one oracle —
    * written in the dense form, the oracle-friendly one — covers both. */
  private val gapFillOracle: String =
    """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
      |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |s AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1),
      |cal AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM s),
      |f AS (SELECT cal.user_id, cal.hr, h.v,
      |        last_value(h.v IGNORE NULLS) OVER (
      |          PARTITION BY cal.user_id ORDER BY cal.hr
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |      FROM cal LEFT JOIN h ON cal.user_id = h.user_id AND cal.hr = h.hr)
      |SELECT user_id, count(*) AS n_hours, count(v) AS n_obs,
      |  count(*) - count(v) AS n_gaps,
      |  CAST(sum(CASE WHEN v IS NULL
      |    THEN CAST(round(filled * 100) AS BIGINT) ELSE 0 END) AS DOUBLE)
      |    / 100 AS gap_carried
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared oracle CTEs for the q42/q43 pair: `m` is the merged snapshot
    * (q42's answer, unordered); q43 diffs q42's target against it. */
  private val mergeCtes: String =
    """WITH latest AS (
      |  SELECT user_id, event_type AS ev_type,
      |         CAST(round(value * 100) AS BIGINT) AS ev_cents
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC, event_type DESC,
      |            CAST(round(value * 100) AS BIGINT) DESC) AS rn
      |        FROM events) t
      |  WHERE rn = 1),
      |tgt AS (SELECT c_custkey, c_name, c_mktsegment,
      |          CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |        FROM customer WHERE c_custkey % 3 <> 0),
      |m AS (
      |  SELECT COALESCE(t.c_custkey, l.user_id) AS merge_key,
      |    CASE WHEN t.c_custkey IS NULL
      |         THEN 'cdc-' || CAST(l.user_id AS VARCHAR)
      |         ELSE t.c_name END AS c_name,
      |    CASE WHEN t.c_custkey IS NULL THEN 'NEW'
      |         ELSE t.c_mktsegment END AS c_mktsegment,
      |    CAST(COALESCE(l.ev_cents, t.cents) AS DOUBLE) / 100 AS acctbal,
      |    CASE WHEN t.c_custkey IS NULL THEN 'inserted'
      |         WHEN l.user_id IS NULL THEN 'kept'
      |         ELSE 'updated' END AS action
      |  FROM tgt t FULL OUTER JOIN latest l ON t.c_custkey = l.user_id
      |  WHERE COALESCE(l.ev_type, '') <> 'error')""".stripMargin

  /** DuckDB oracle SQL per query (column names and ORDER BY must match). */
  val oracleSql: Map[String, String] = Map(
    // q51: DuckDB's sum(BIGINT) is HUGEINT (int128, exact) — the same
    // order-independent exact moments as the Spark side's DECIMAL(38,0);
    // the double compositions are structurally identical ops in both
    "q51_stats_aggregates" ->
      """WITH b AS (SELECT l_returnflag,
        |             CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |      FROM b GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty_cents,
        |  round(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |    / CAST(n*(n-1) AS DOUBLE)), 6) AS stddev_qty_cents,
        |  round(sqrt(CAST(n*syy - sy*sy AS DOUBLE)
        |    / CAST(n*(n-1) AS DOUBLE)), 6) AS stddev_price_cents,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE)
        |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |         * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS corr_qty_price,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE)
        |    / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_price_per_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q50_cumulative_distinct" ->
      """WITH e AS (SELECT event_type, user_id,
        |             strftime(ts, '%Y-%m-%d') AS day
        |           FROM events),
        |ad AS (SELECT event_type, day, count(*) AS n_events
        |       FROM e GROUP BY 1, 2),
        |fd AS (SELECT event_type, user_id, min(day) AS day
        |       FROM e GROUP BY 1, 2),
        |d AS (SELECT event_type, day, count(*) AS n_new
        |      FROM fd GROUP BY 1, 2)
        |SELECT ad.event_type, ad.day, ad.n_events,
        |       COALESCE(d.n_new, 0) AS n_new_users,
        |       CAST(sum(COALESCE(d.n_new, 0)) OVER (
        |         PARTITION BY ad.event_type ORDER BY ad.day)
        |         AS BIGINT) AS cum_distinct_users
        |FROM ad LEFT JOIN d ON ad.event_type = d.event_type
        |  AND ad.day = d.day
        |ORDER BY ad.event_type, ad.day""".stripMargin,
    "q49_ntile_deciles" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer),
        |d AS (SELECT c_nationkey, cents,
        |        ntile(10) OVER (PARTITION BY c_nationkey
        |          ORDER BY cents ASC, c_custkey ASC) AS decile
        |      FROM c)
        |SELECT n.n_name, CAST(d.decile AS INT) AS decile,
        |       count(*) AS n_cust,
        |       CAST(min(cents) AS DOUBLE) / 100 AS lo_bal,
        |       CAST(max(cents) AS DOUBLE) / 100 AS hi_bal
        |FROM d JOIN nation n ON d.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    "q46_asof_state" ->
      s"""WITH o AS (SELECT user_id, event_id, ts, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev
        |      FROM events),
        |ch AS (SELECT user_id, event_id, ts, event_type FROM o
        |       WHERE prev IS NULL OR prev <> event_type),
        |iv AS (SELECT user_id, event_type AS state,
        |         epoch_us(ts) AS valid_from_us,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS valid_to_us
        |       FROM ch),
        |b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |      FROM events),
        |pr AS (SELECT CAST(unnest(generate_series(1, $AsOfProbeCount))
        |           AS INT) AS probe_idx, lo, hi FROM b),
        |p AS (SELECT probe_idx,
        |        lo + ((hi - lo) * probe_idx) // ${AsOfProbeCount + 1} AS t_us
        |      FROM pr)
        |SELECT p.probe_idx, p.t_us, iv.user_id, iv.state, iv.valid_from_us
        |FROM p JOIN iv ON p.t_us >= iv.valid_from_us
        |  AND (iv.valid_to_us IS NULL OR p.t_us < iv.valid_to_us)
        |ORDER BY probe_idx, user_id""".stripMargin,
    "q45_recursive_depth" ->
      """WITH RECURSIVE h (c_custkey, depth) AS (
        |  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, h.depth + 1
        |  FROM customer c JOIN h ON c.c_custkey // 2 = h.c_custkey
        |)
        |SELECT h.depth, count(*) AS n_nodes,
        |  CAST(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS DOUBLE) / 100 AS total_acctbal
        |FROM h JOIN customer c ON h.c_custkey = c.c_custkey
        |GROUP BY h.depth ORDER BY h.depth""".stripMargin,
    // the DIRECT re-aggregation of the merged snapshot — hash-matching it
    // proves the incremental-maintenance identity, not just the numbers
    "q44_incremental_agg" ->
      s"""$mergeCtes
        |SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(sum(CAST(round(acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS DOUBLE) / 100 AS total_acctbal
        |FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q42_merge_upsert" ->
      s"""$mergeCtes
        |SELECT merge_key, c_name, c_mktsegment, acctbal, action
        |FROM m ORDER BY merge_key""".stripMargin,
    "q43_snapshot_diff" ->
      s"""$mergeCtes,
        |a AS (SELECT c_custkey AS merge_key, c_name, c_mktsegment,
        |        CAST(cents AS DOUBLE) / 100 AS acctbal
        |      FROM tgt)
        |SELECT * FROM (
        |SELECT m.merge_key, '+I' AS op, m.c_name, m.c_mktsegment, m.acctbal
        |FROM m LEFT JOIN a ON m.merge_key = a.merge_key
        |WHERE a.merge_key IS NULL
        |UNION ALL
        |SELECT a.merge_key, '-D' AS op, a.c_name, a.c_mktsegment, a.acctbal
        |FROM a LEFT JOIN m ON a.merge_key = m.merge_key
        |WHERE m.merge_key IS NULL
        |UNION ALL
        |SELECT a.merge_key, '-U' AS op, a.c_name, a.c_mktsegment, a.acctbal
        |FROM a JOIN m ON a.merge_key = m.merge_key
        |WHERE a.c_name <> m.c_name OR a.c_mktsegment <> m.c_mktsegment
        |   OR a.acctbal <> m.acctbal
        |UNION ALL
        |SELECT m.merge_key, '+U' AS op, m.c_name, m.c_mktsegment, m.acctbal
        |FROM a JOIN m ON a.merge_key = m.merge_key
        |WHERE a.c_name <> m.c_name OR a.c_mktsegment <> m.c_mktsegment
        |   OR a.acctbal <> m.acctbal
        |) u ORDER BY merge_key,
        |  CASE op WHEN '-U' THEN 1 WHEN '+U' THEN 2 ELSE 0 END""".stripMargin,
    "q41_range_frame" ->
      """WITH p AS (SELECT user_id, event_id,
        |        epoch_us(ts) // 1000000 AS sec,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id, sec,
        |  CAST(count(*) OVER w AS BIGINT) AS n_hour,
        |  CAST(CAST(sum(cents) OVER w AS BIGINT) AS DOUBLE) / 100 AS hour_sum
        |FROM p
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, sec, event_id""".stripMargin,
    "q40_scd2" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev
        |      FROM events),
        |ch AS (SELECT user_id, event_id, ts, event_type FROM o
        |       WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_id AS change_id, event_type AS state,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to_us,
        |  CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) IS NULL AS INT) AS is_current
        |FROM ch ORDER BY user_id, valid_from_us, change_id""".stripMargin,
    "q39_range_join_binned" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |iv AS (SELECT event_id AS incident_id, us AS t0, us + $RangeBinUs AS t1
        |       FROM e WHERE event_id % 50 = 0)
        |SELECT incident_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM iv JOIN e ON e.us >= iv.t0 AND e.us < iv.t1
        |GROUP BY incident_id ORDER BY incident_id""".stripMargin,
    "q38_not_in_nulls" ->
      """SELECT 'not_in_null_free' AS variant, count(*) AS n FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT 'not_in_nullable' AS variant, count(*) AS n FROM customer
        |WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'F'
        |                          THEN o_custkey END FROM orders)
        |UNION ALL
        |SELECT 'not_exists_twin' AS variant, count(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE CASE WHEN o.o_orderstatus = 'F'
        |                    THEN o.o_custkey END = c.c_custkey)
        |ORDER BY variant""".stripMargin,
    "q37_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q36_gap_fill" -> gapFillOracle,
    // q48 computes the identical per-user answer without the calendar
    "q48_gap_fill_sparse" -> gapFillOracle,
    "q35_zorder_layout" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |             epoch_ms(o_orderdate) // 86400000 AS dayn FROM orders),
        |st AS (SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
        |              min(dayn) AS mind, max(dayn) AS maxd FROM o),
        |g AS (SELECT o_orderkey,
        |        (o_custkey - minc) * 65535 // greatest(maxc - minc, 1) AS xc,
        |        (dayn - mind) * 65535 // greatest(maxd - mind, 1) AS xd
        |      FROM o, st),
        |s1 AS (SELECT *, (xc | (xc << 8)) & 16711935 AS ac,
        |               (xd | (xd << 8)) & 16711935 AS ad FROM g),
        |s2 AS (SELECT *, (ac | (ac << 4)) & 252645135 AS bc,
        |               (ad | (ad << 4)) & 252645135 AS bd FROM s1),
        |s3 AS (SELECT *, (bc | (bc << 2)) & 858993459 AS cc,
        |               (bd | (bd << 2)) & 858993459 AS cd FROM s2),
        |s4 AS (SELECT *, (cc | (cc << 1)) & 1431655765 AS dc,
        |               (cd | (cd << 1)) & 1431655765 AS dd FROM s3),
        |z AS (SELECT o_orderkey, xc, xd, (dc | (dd << 1)) AS zkey FROM s4)
        |SELECT zkey >> 22 AS zbucket, count(*) AS n_orders,
        |  min(xc) AS min_cust_cell, max(xc) AS max_cust_cell,
        |  min(xd) AS min_day_cell, max(xd) AS max_day_cell
        |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin,
    "q34_bag_set_ops" ->
      """SELECT 'except_all' AS op, val, count(*) AS n FROM (
        |  SELECT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY val
        |UNION ALL
        |SELECT 'intersect_all' AS op, val, count(*) AS n FROM (
        |  SELECT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY val
        |ORDER BY op, val""".stripMargin,
    "q31_exists_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderpriority = '1-URGENT') AS n_urgent
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q32_listagg" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_top,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer WHERE c_acctbal >= 9000.0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q33_posexplode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token
        |FROM t, unnest(generate_series(1, len(w))) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q29_pivot" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").map { t =>
        s"""CAST(COALESCE(sum(CASE WHEN event_type = '$t'
           |    THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS $t"""
          .stripMargin
      }.mkString(",\n  ")
      s"""SELECT user_id % 10 AS user_bucket,
         |  $cols
         |FROM events GROUP BY user_id % 10 ORDER BY user_bucket""".stripMargin
    },
    "q30_window_frames" ->
      """SELECT user_id, event_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum4,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_value,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS INT) AS quartile,
        |  percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id)
        |    AS value_pct_rank
        |FROM events WHERE user_id < 40
        |ORDER BY user_id, event_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // the bucketed run must hash-match the same oracle as the unbucketed
    // one — the layout changes the plan (zero orderkey Exchange), never
    // the answer
    "q3_join_agg_bucketed" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q10_star_join_bucketed" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q4_casewhen_buckets" ->
      """WITH bucketed AS (
        |  SELECT c_acctbal,
        |    CASE WHEN c_acctbal BETWEEN 0 AND 2499.99 THEN '0-2499'
        |         WHEN c_acctbal BETWEEN 2500 AND 4999.99 THEN '2500-4999'
        |         WHEN c_acctbal BETWEEN 5000 AND 7499.99 THEN '5000-7499'
        |         WHEN c_acctbal BETWEEN 7500 AND 9999.99 THEN '7500-9999'
        |         ELSE 'other' END AS balance_group
        |  FROM customer)
        |SELECT balance_group, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_balance
        |FROM bucketed
        |GROUP BY balance_group
        |ORDER BY balance_group""".stripMargin,
    "q5_substring_cast" ->
      """SELECT c_name, CAST(substring(c_name FROM 10) AS BIGINT) AS parsed_key, c_custkey
        |FROM customer
        |WHERE CAST(substring(c_name FROM 10) AS BIGINT) = c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q6_group_count" ->
      """SELECT c_mktsegment, COUNT(*) AS seg_count
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q7_topk_per_group" ->
      """SELECT c_nationkey, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        |  FROM customer) t
        |WHERE rk <= 3
        |ORDER BY c_nationkey, rk""".stripMargin,
    "q8_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q9_set_ops" ->
      """SELECT * FROM (
        |  SELECT val, 'except' AS op FROM (
        |    SELECT DISTINCT c_mktsegment AS val FROM customer
        |    EXCEPT
        |    SELECT DISTINCT c_mktsegment AS val FROM customer WHERE c_acctbal < 0)
        |  UNION ALL
        |  SELECT val, 'intersect' AS op FROM (
        |    SELECT DISTINCT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'F'
        |    INTERSECT
        |    SELECT DISTINCT o_orderpriority AS val FROM orders WHERE o_orderstatus = 'O'))
        |ORDER BY op, val""".stripMargin,
    "q10_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q11_date_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q12_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q13_having_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |HAVING COUNT(*) > 10
        |ORDER BY o_orderpriority""".stripMargin,
    "q14_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q15_running_window" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS seq
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, seq""".stripMargin,
    "q16_grouped_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM orders
        |JOIN (SELECT o_custkey AS k,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS cust_avg
        |      FROM orders GROUP BY o_custkey) s
        |ON o_custkey = k
        |WHERE o_totalprice > cust_avg * 2
        |ORDER BY o_orderkey""".stripMargin,
    "q17_scalar_functions" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  lower(p_type) AS type_lower,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  CAST(abs(p_size - 25) AS INT) AS size_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q18_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q19_asof_join" ->
      """SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_signup_event
        |FROM events ORDER BY event_id""".stripMargin,
    "q20_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_value
        |FROM events
        |WHERE event_type IN ('purchase', 'signup') AND props LIKE '%k%'
        |  AND CAST(json_extract_string(props, '$.k') AS INT) >= 50
        |ORDER BY event_id""".stripMargin,
    "q21_sessionize" ->
      s"""WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM t),
        |g AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM s)
        |SELECT user_id, sess_id, COUNT(*) AS n_events,
        |  MAX(us) - MIN(us) AS duration_us
        |FROM g GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    "q22_salted_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q23_approx_distinct" -> {
      // Replays HllAggregate (see its scaladoc for the determinism
      // argument): register index/rank from the same md5 hex slices, Z
      // accumulated exactly in DECIMAL(38,0), the SAME raw-numerator
      // literal, and the rounded linear-counting branch (exhaustively
      // bit-verified across glibc/JVM over its whole zeros∈[1,4096]
      // domain).
      def d(i: Int) = s"(instr('0123456789abcdef', substring(hx, $i, 1)) - 1)"
      val idx = s"((${d(1)} * 16 + ${d(2)}) * 16 + ${d(3)})"
      val w = (4 to 16).map(d).reduce((acc, x) => s"($acc * 16 + $x)")
      val m = graft.plans.HllAggregate.M
      val num = graft.plans.HllAggregate.Num.toString
      s"""WITH v AS (SELECT DISTINCT l_returnflag,
         |             md5(CAST(l_partkey AS VARCHAR)) AS hx
         |           FROM lineitem WHERE l_partkey IS NOT NULL),
         |h AS (SELECT l_returnflag, $idx AS idx, $w AS w FROM v),
         |r AS (SELECT l_returnflag, idx,
         |        max(CASE WHEN w = 0 THEN 53
         |                 ELSE 53 - length(bin(w)) END) AS rho
         |      FROM h GROUP BY 1, 2),
         |grid AS (SELECT g.l_returnflag, gs.idx
         |         FROM (SELECT DISTINCT l_returnflag FROM lineitem) g
         |         CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1}))
         |                       AS idx) gs),
         |mm AS (SELECT grid.l_returnflag, grid.idx,
         |         coalesce(r.rho, 0) AS rho
         |       FROM grid LEFT JOIN r
         |         ON r.l_returnflag = grid.l_returnflag
         |        AND r.idx = grid.idx),
         |agg AS (SELECT l_returnflag,
         |          sum(CAST(power(2, 53 - rho) AS DECIMAL(38,0))) AS zs,
         |          count(*) FILTER (WHERE rho = 0) AS zeros
         |        FROM mm GROUP BY 1),
         |est AS (SELECT l_returnflag, zeros,
         |          $num / CAST(zs AS DOUBLE) AS raw
         |        FROM agg),
         |n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
         |      FROM lineitem GROUP BY 1)
         |SELECT n.l_returnflag, n.n_rows,
         |  CAST(CASE WHEN est.raw <= 2.5 * $m AND est.zeros > 0
         |       THEN floor($m.0 * ln($m.0 / est.zeros) + 0.5)
         |       ELSE floor(est.raw + 0.5) END AS BIGINT) AS approx_parts
         |FROM n JOIN est USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    },
    "q25_funnel" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_us
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) AS n_conversions,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM t
        |WHERE event_type = 'purchase' AND last_signup_us IS NOT NULL
        |  AND epoch_us(ts) - last_signup_us <= 3600000000
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q24_conditional_agg" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) AS n_total,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q26_interval_join" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events)
        |SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs_1h
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.us > a.us AND b.us <= a.us + 3600000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q27_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q28_unpivot" ->
      """WITH w AS (SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'click') AS click
        |FROM events GROUP BY user_id)
        |SELECT user_id, metric, n FROM (
        |  SELECT user_id, 'purchase' AS metric, purchase AS n FROM w
        |  UNION ALL
        |  SELECT user_id, 'error' AS metric, error AS n FROM w
        |  UNION ALL
        |  SELECT user_id, 'click' AS metric, click AS n FROM w)
        |ORDER BY user_id, metric""".stripMargin,
  )
}
