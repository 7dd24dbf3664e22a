package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("q35: every z-bucket confines BOTH dimensions to ≤ 2^11 of 2^16 cells") {
    // structural property of the Morton curve: a 10-bit zkey prefix fixes
    // the top 5 bits of each dimension, so min/max within a bucket can
    // differ by at most 2^11 - 1 grid cells — this is WHY a z-sorted file
    // layout skips on either predicate column, and it must hold for every
    // bucket, not on average
    val rows = Relational.q35ZOrderLayout(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 1024)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(3) - r.getLong(2) <= 2047L, s"bucket $b cust span")
      assert(r.getLong(5) - r.getLong(4) <= 2047L, s"bucket $b day span")
    }
    val total = rows.map(_.getLong(1)).sum
    val n = graft.sources.Tables.load(spark, dir, "orders").count()
    assert(total == n, "every order lands in exactly one bucket")
  }

  test("zOrderWrite: z-clustered files skip on BOTH columns; random files don't") {
    import org.apache.spark.sql.functions._
    val zdir = java.nio.file.Files.createTempDirectory("graft-z").toFile.getPath
    val spans = Relational.zOrderWrite(spark, dir, zdir, nFiles = 16)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(spans.length >= 8, s"expected ~16 files, got ${spans.length}")
    // random-layout contrast: same rows, hash-partitioned
    val rdir = java.nio.file.Files.createTempDirectory("graft-r").toFile.getPath
    graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_millis(cast(o_orderdate AS timestamp)) DIV 86400000").as("dayn"))
      .repartition(16)
      .write.mode("overwrite").parquet(rdir)
    val rSpans = spark.read.parquet(rdir)
      .groupBy(input_file_name())
      .agg(min(col("o_custkey")), max(col("o_custkey")),
        min(col("dayn")), max(col("dayn")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // probe several point predicates on EACH dimension: the fraction of
    // files whose [min,max] admits the point (= files a footer-stats
    // pruner must read) must be far smaller for the z layout
    val probesC = spans.map(_._1).sorted.grouped(spans.length / 4 + 1).map(_.head).toSeq
    val probesD = spans.map(_._3).sorted.grouped(spans.length / 4 + 1).map(_.head).toSeq
    def hitFrac(sp: Array[(Long, Long, Long, Long)], c: Long, byDay: Boolean): Double =
      sp.count(s => if (byDay) s._3 <= c && c <= s._4
                    else s._1 <= c && c <= s._2).toDouble / sp.length
    val zC = probesC.map(hitFrac(spans, _, byDay = false)).sum / probesC.size
    val zD = probesD.map(hitFrac(spans, _, byDay = true)).sum / probesD.size
    val rC = probesC.map(hitFrac(rSpans, _, byDay = false)).sum / probesC.size
    val rD = probesD.map(hitFrac(rSpans, _, byDay = true)).sum / probesD.size
    info(f"files read per point predicate: z cust=$zC%.2f day=$zD%.2f | " +
      f"random cust=$rC%.2f day=$rD%.2f")
    // with only ~30 rows per fixture file the random spans don't quite
    // cover the full range — but they must still admit most probes
    assert(rC > 0.6 && rD > 0.6,
      "random layout should force reading most files (sanity check)")
    assert(zC <= rC / 2 && zD <= rD / 2,
      f"z layout must halve file reads on BOTH columns: $zC%.2f/$zD%.2f")
  }

  test("approx_count_distinct is within its 2% error bound of exact") {
    import org.apache.spark.sql.functions._
    // the exact countDistinct lives HERE, not in the registry query: its
    // expand-and-shuffle is exactly what the sketch exists to avoid
    val exact = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    Relational.q23ApproxDistinct(spark, dir).collect().foreach { r =>
      val approx = r.getLong(2).toDouble
      val e = exact(r.getString(0))
      assert(math.abs(approx - e) / e <= 0.05,
        s"approx $approx vs exact $e for ${r.getString(0)}")
    }
  }

  test("q23 plan: no exact-distinct expand survives in the registry query") {
    val plan = Relational.q23ApproxDistinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("expand"),
      s"exact countDistinct expand leaked back into q23:\n$plan")
  }

  test("demo1 jitter stays inside the declared lat/lon box") {
    DemoQueries.demo1UserLocations(spark, dir).collect().foreach { r =>
      val lat = r.getDouble(1)
      val lon = r.getDouble(2)
      assert(lat >= 37.7 && lat <= 37.77, s"lat $lat out of range")
      assert(lon >= -122.50 && lon <= -122.39, s"lon $lon out of range")
    }
  }

  test("property: $-balance strings round-trip substring+CAST exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val gen = Gen.chooseNum(-999999L, 999999L)
    val cents = (0 until 200).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(7L + i))).distinct
    val df = cents.map(c => BigDecimal(c, 2)).toDF("bal")
      .select($"bal",
        concat(lit("$"), $"bal".cast("string")).as("s"))
      .select($"bal",
        substring($"s", 2, Int.MaxValue).cast("double").as("rt"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDecimal(0).doubleValue,
        s"round-trip mismatch for ${r.getDecimal(0)}")
    }
  }

  test("salted aggregation equals the direct groupBy") {
    import org.apache.spark.sql.functions._
    val salted = Relational.q22SaltedAgg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = graft.sources.Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("q39: binned range join equals the naive form; plan has no nested loop") {
    import org.apache.spark.sql.functions._
    val binned = Relational.q39RangeJoinBinned(spark, dir)
    val got = binned.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive ground truth: the pure range filter the binning replaces
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val naive = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("incident_id"), col("us").as("t0"))
      .join(ev, col("us") >= col("t0") &&
        col("us") < col("t0") + Relational.RangeBinUs)
      .groupBy("incident_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == naive,
      s"binned (${got.size}) != naive (${naive.size})")
    // the whole point: binning turns the non-equi join into hash-join
    // physics — no nested-loop/cartesian operator may appear
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"nested-loop join survived binning:\n${plan.take(800)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bin:\n${plan.take(800)}")
    // and the naive form really would be a nested loop — the contrast
    val naivePlan = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("incident_id"), col("us").as("t0"))
      .join(ev, col("us") >= col("t0") &&
        col("us") < col("t0") + Relational.RangeBinUs)
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }

  test("q41: trailing-hour range frame matches a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val purchases = graft.sources.Tables
      .load(spark, SparkTestSession.sf0001, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "unix_micros(ts) DIV 1000000 AS sec",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = purchases.groupBy(_._1)
    val got = Relational.q41RangeFrame(spark, SparkTestSession.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.size == purchases.length)
    purchases.foreach { case (u, eid, sec, _) =>
      val frame = byUser(u).filter(p => p._3 >= sec - 3600 && p._3 <= sec)
      val (n, s) = got((u, eid))
      assert(n == frame.length, s"user $u event $eid n_hour")
      assert(s == frame.map(_._4).sum.toDouble / 100,
        s"user $u event $eid hour_sum")
    }
  }

  test("q42: merge applies the full MERGE matrix against a driver recompute") {
    val dir = SparkTestSession.sf0001
    val got = Relational.q42MergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getString(4)))
    // driver-side recompute from the raw fixtures
    val events = graft.sources.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val latest = events.groupBy(_._1).view
      .mapValues(_.maxBy(e => (e._2, e._3))).toMap
    val target = graft.sources.Tables.load(spark, dir, "customer")
      .selectExpr("c_custkey", "c_name", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .filter(_._1 % 3 != 0)
    val tgtKeys = target.map(_._1).toSet
    val expected = (target.flatMap { case (k, name, seg, cents) =>
      latest.get(k) match {
        case Some((_, _, _, "error", _)) => None // matched delete
        case Some((_, _, _, _, ev)) =>
          Some((k, name, seg, ev.toDouble / 100, "updated"))
        case None => Some((k, name, seg, cents.toDouble / 100, "kept"))
      }
    } ++ latest.collect {
      case (k, (_, _, _, typ, ev)) if !tgtKeys.contains(k) && typ != "error" =>
        (k, s"cdc-$k", "NEW", ev.toDouble / 100, "inserted")
    }).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // every merge arm must actually fire on the fixture
    val arms = got.map(_._5).toSet
    assert(arms == Set("kept", "updated", "inserted"),
      s"fixture must exercise all arms, saw $arms")
    assert(tgtKeys.exists(k => latest.get(k).exists(_._4 == "error")),
      "fixture must exercise the matched-delete arm")
  }

  test("q43: snapshot diff emits exactly the merge's effective changes") {
    val dir = SparkTestSession.sf0001
    val diff = Relational.q43SnapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4)))
    val merged = Relational.q42MergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    val before = graft.sources.Tables.load(spark, dir, "customer")
      .selectExpr("c_custkey",
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)/100 AS bal")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 % 3 != 0).toMap
    // +I keys are exactly the merge's inserts
    assert(diff.filter(_._2 == "+I").map(_._1).toSet ==
      merged.filter(_._3 == "inserted").map(_._1).toSet)
    // -D keys are exactly the target keys the merge dropped
    assert(diff.filter(_._2 == "-D").map(_._1).toSet ==
      before.keySet.diff(merged.map(_._1).toSet))
    // -U/+U come in pairs carrying old then new values; their keys are
    // the updates whose balance actually changed
    val retracts = diff.filter(_._2 == "-U").map(d => d._1 -> d._5).toMap
    val upserts = diff.filter(_._2 == "+U").map(d => d._1 -> d._5).toMap
    assert(retracts.keySet == upserts.keySet)
    val changedUpdates = merged
      .filter(m => m._3 == "updated" && before(m._1) != m._2)
      .map(m => m._1 -> m._2).toMap
    assert(upserts == changedUpdates)
    retracts.foreach { case (k, bal) => assert(bal == before(k)) }
    // identical rows emit nothing: kept keys never appear in the diff
    val keptKeys = merged.filter(_._3 == "kept").map(_._1).toSet
    assert(diff.map(_._1).toSet.intersect(keptKeys).isEmpty)
    assert(diff.nonEmpty)
  }

  test("q40: SCD2 intervals tile each user's timeline with alternating states") {
    val rows = Relational.q40Scd2(spark, SparkTestSession.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1, s"user $user open intervals")
      assert(sorted.last._4.isEmpty && sorted.last._5 == 1)
      sorted.init.foreach(iv => assert(iv._5 == 0))
      // intervals tile: each valid_to is the next valid_from; no state
      // repeats across a boundary (changes were compressed)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $user gap: ${a._4} -> ${b._3}")
          assert(a._2 != b._2, s"user $user uncompressed state ${a._2}")
        case _ =>
      }
    }
  }

  test("q46: AS OF lookup returns exactly the interval covering each probe") {
    val dir = SparkTestSession.sf0001
    val got = Relational.q46AsOfState(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    // at most one state per (probe, user) — the defining temporal-table
    // property (intervals tile, so coverage implies uniqueness)
    val dupes = got.groupBy(t => (t._1, t._3)).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"ambiguous AS OF rows: ${dupes.keys}")
    // driver recompute from the q40 intervals: for each probe instant,
    // the covering interval per user (none if the user starts later)
    val ivs = Relational.q40Scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    val probeTimes = got.map(t => (t._1, t._2)).distinct.toMap
    // probes where no user matched would be missing from probeTimes; the
    // grid is dense inside [min,max] so every probe index must appear
    assert(probeTimes.keySet == (1 to Relational.AsOfProbeCount).toSet)
    val expected = (for {
      (pIdx, t) <- probeTimes.toSeq
      (user, state, from, _) <- ivs
        .filter(iv => t >= iv._3 && t < iv._4)
        .groupBy(_._1).values.map(_.head) // tiling => unique
    } yield (pIdx, t, user, state, from)).toSet
    assert(got.toSet == expected,
      "AS OF result diverges from the driver interval scan")
  }

  test("q48 sparse gap-fill equals dense q36 row-for-row, and its plan " +
      "never materializes the calendar") {
    val dense = Relational.q36GapFill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val sparse = Relational.q48GapFillSparse(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(sparse == dense,
      s"sparse gap-fill diverges (${sparse.size} vs ${dense.size} rows)")
    // at least one user must actually have gaps or the equality is vacuous
    assert(dense.exists(_._4 > 0), "fixture has no gap to carry through")
    // the scale claim IS the absent calendar: no sequence/explode anywhere
    val plan = Relational.q48GapFillSparse(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("explode") &&
      !plan.toLowerCase.contains("sequence"),
      s"sparse path materialized a calendar:\n$plan")
  }

  test("q49: ntile deciles partition every nation with SQL-standard " +
      "sizing (larger buckets first, spread ≤ 1) and ordered bounds") {
    val rows = Relational.q49NtileDeciles(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val total = graft.sources.Tables.load(spark, dir, "customer").count()
    assert(rows.map(_._3).sum == total, "every customer tiles exactly once")
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      val sorted = rs.sortBy(_._2)
      // deciles are dense from 1 (ntile emits min(n, 10) buckets)
      assert(sorted.map(_._2) == (1 to sorted.size),
        s"$nation: buckets not dense: ${sorted.map(_._2)}")
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$nation: bucket sizes spread > 1: $sizes")
      assert(sizes == sizes.sortBy(-_),
        s"$nation: extra rows must land in the FIRST buckets: $sizes")
      // balance bounds never interleave across deciles
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._4,
          s"$nation: decile ${a._2} hi ${a._5} > decile ${b._2} lo ${b._4}")
        case _ =>
      }
    }
  }

  test("q50: first-seen rewrite equals the naive per-prefix distinct " +
      "count; the corpus-scale work happens before the window") {
    val got = Relational.q50CumulativeDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    // naive driver recompute: for each ACTIVE (type, day), |distinct
    // users with any event of that type on a day ≤ this day| — the
    // definition the rewrite must reproduce
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select("event_type", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        fmt.format(r.getTimestamp(2).toInstant)))
    val expected = ev.groupBy(e => (e._1, e._3)).toSeq.map {
      case ((typ, day), es) =>
        val cum = ev.collect {
          case (t, u, d) if t == typ && d <= day => u
        }.distinct.size.toLong
        val newUsers = ev.groupBy(e => (e._1, e._2)).collect {
          case ((t, _), us) if t == typ && us.map(_._3).min == day => 1L
        }.sum
        (typ, day, es.size.toLong, newUsers, cum)
    }.sortBy(e => (e._1, e._2)).toSeq
    assert(got == expected, "rewrite diverges from the naive definition")
    // cumulative counts are non-decreasing and step exactly by n_new
    got.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.foldLeft(0L) { (prev, r) =>
        assert(r._5 == prev + r._4,
          s"${r._1} ${r._2}: cum ${r._5} != $prev + new ${r._4}")
        r._5
      }
    }
    // scale shape: the Window's child aggregates FIRST — no window
    // function ever sees per-event rows (the rewrite's whole point)
    val plan = Relational.q50CumulativeDistinct(spark, dir)
      .queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, "expected a window over the per-day table")
    assert(plan.substring(winIdx).contains("HashAggregate"),
      s"window must sit ABOVE the aggregates in the plan tree:\n$plan")
  }

  test("q51: exact-moment statistics agree with Spark's built-in " +
    "stddev/corr/regr_slope within double noise, at any partitioning") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val got = Relational.q51StatsAggregates(s, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(5), r.getDouble(6)))
      .toMap
    // the built-ins accumulate doubles (order-dependent last ulps — the
    // reason q51 exists); they still agree to ~1e-9 relative, so they
    // pin the FORMULAS while the oracle pins exactness
    val ref = graft.sources.Tables.load(s, dir, "lineitem")
      .select($"l_returnflag",
        (round($"l_quantity" * 100)).as("x"),
        (round($"l_extendedprice" * 100)).as("y"))
      .groupBy($"l_returnflag")
      .agg(stddev_samp($"x").as("sd"), corr($"x", $"y").as("c"),
        regr_slope($"y", $"x").as("sl"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (sd, c, sl)) =>
      val (rsd, rc, rsl) = ref(k)
      assert(math.abs(sd - rsd) <= 1e-6 * math.abs(rsd) + 1e-9, s"$k stddev")
      assert(math.abs(c - rc) <= 1e-6, s"$k corr: $c vs $rc")
      assert(math.abs(sl - rsl) <= 1e-6 * math.abs(rsl) + 1e-9, s"$k slope")
    }
    // partitioning-invariance: the whole point of the decimal moments —
    // a different shuffle layout merges partials in a different order
    // and must still yield the SAME bits (double accumulators would
    // drift in the last ulps)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val wide = Relational.q51StatsAggregates(s, dir).collect().map(_.toSeq).toSeq
    try {
      s.conf.set("spark.sql.shuffle.partitions", "3")
      val narrow = Relational.q51StatsAggregates(s, dir)
        .collect().map(_.toSeq).toSeq
      assert(narrow == wide,
        "moment statistics must be bit-identical under any partitioning")
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
