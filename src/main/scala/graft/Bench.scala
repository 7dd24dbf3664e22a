package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the given scale factor and
  * prints one JSON line. Results are fully materialized through the `noop`
  * sink — `.count()` would let Catalyst prune projections and under-measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()

    // JVM/codegen warmup outside the measured window: exercise scan,
    // broadcast join, aggregation, and sort codegen paths once so the
    // first measured query doesn't absorb JIT cost
    def warmup(): Unit = {
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).count()
        .orderBy(col("r_name"))
        .write.format("noop").mode("overwrite").save()
    }
    warmup()

    // Session recycling: a 130-query run accumulates per-session state a
    // clearCache+gc cannot return — generated codegen classes pin the
    // session classloader, block-manager/broadcast bookkeeping grows —
    // and late-alphabet queries measure 2× their isolated cost (q45
    // measured 5.6 s at position ~95, 2.8 s isolated; same protocol).
    // A fresh session every [[RecycleEvery]] queries bounds that debt at
    // a fixed ~4 s restart+rewarmup cost per recycle, paid OUTSIDE the
    // timed window. Same root cause and remedy as Scaling's fresh-session
    // retry pass. Cadence MEASURED in r12 (back-to-back full runs, same
    // host phase): 25 → 85.3 s total, 8 → 71.4 s, 4 → 77.7 s — the r9
    // default of 25 still leaked ~16 % session debt into the timed
    // numbers (median per-query 0.88× at cadence 8, late-position
    // p-family hit hardest), while 4 over-recycles and loses the
    // cross-query JIT warmth the untimed warmup doesn't cover. 8 is the
    // tested optimum and agrees with the isolated SPARK_GRAFT_ONLY
    // protocol NOTES declares canonical. SPARK_GRAFT_RECYCLE overrides
    // for cadence experiments.
    // toIntOption + loud fallback (ADVICE r12): a typo'd value must not
    // crash the whole run with a bare NumberFormatException — match the
    // SPARK_GRAFT_ONLY unknown-name behavior instead.
    val RecycleEvery = sys.env.get("SPARK_GRAFT_RECYCLE") match {
      case Some(v) => v.toIntOption.filter(_ > 0).getOrElse {
        System.err.println(
          s"[bench] WARNING: invalid SPARK_GRAFT_RECYCLE '$v', using 8")
        8
      }
      case None => 8
    }

    // min-of-N runs per query (N=3), report the fastest: first-touch
    // costs (file listing, codegen compilation, GC debt from the previous
    // query) and same-host load drift are environment noise, not operator
    // cost — NOTES documents ±15 % same-code drift between full runs, so
    // the canonical per-query number is the minimum and ALL run times are
    // published (`runs`) so a reader can see the spread instead of
    // guessing at it. A failed query reports null (not its
    // time-to-failure) and is excluded from the total — a broken query
    // must not make the benchmark look faster.
    //
    // Bench-state isolation: operators cache intermediates (d3 shingles,
    // d4/d5 signatures, v4 embeddings/centroids) and a shared session
    // accumulates them until LRU eviction thrashes unrelated queries —
    // the round-2 q12/v5 regressions. clearCache() before EVERY timed run
    // makes each measurement cold w.r.t. operator caches (each run pays
    // its own caching cost — the honest per-operator number) while JIT
    // warmth still carries across, which min-of-2 is for.
    // SPARK_GRAFT_ONLY=q20_json_extract,d6_dedup_clusters benches a subset
    // (local A/B iteration); unset runs the full registry. Unknown names
    // warn loudly — a typo would otherwise bench nothing and print a
    // meaningless total=0.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: unknown query '$n' in SPARK_GRAFT_ONLY")))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % RecycleEvery == 0) {
        spark.stop()
        spark = newSession()
        warmup()
      }
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        // clearCache misses localCheckpoint blocks (freed only when their
        // RDD is GC'd via the ContextCleaner): iterative queries (d6, v4)
        // leave dozens of pinned block sets behind, and late-alphabet
        // queries otherwise measure under accumulated memory pressure
        System.gc()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      (name, if (times.forall(_.isDefined)) Some(times.flatten.min) else None,
        times)
    }
    def jd(d: Double): String = SparkEntry.jsonDouble(d)
    val qs = results.map {
      case (k, Some(v), _) => "\"" + k + "\":" + jd(v)
      case (k, None, _) => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // full per-run times: the min is the canonical number, the spread is
    // the evidence it rests on (regression triage reads this, not the min)
    val runs = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(_.map(jd).getOrElse("null"))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // twin-vs-production tagging (SparkEntry.oracleTwins): md5-twin rows
    // deliberately run the slower oracle-replayable family so DuckDB can
    // rebuild their sketches from the raw corpus — their cost is
    // instrumentation, not engine; the split totals keep any
    // bench-vs-baseline comparison honest about which is which
    val twinSet = SparkEntry.oracleTwins
    val families = results.map { case (k, _, _) =>
      val fam = if (twinSet(k)) "md5-twin" else "production"
      "\"" + k + "\":\"" + fam + "\""
    }.mkString("{", ",", "}")
    val twinTotal = results.collect {
      case (k, Some(v), _) if twinSet(k) => v }.sum
    val prodTotal = total - twinTotal
    // recycle cadence recorded in both artifacts (ADVICE r12): cadence is
    // the one measurement-protocol knob that changed across rounds, so
    // every bench artifact must be self-describing about which it used
    val full =
      s"""{"metric":"total","value":${jd(total)},"unit":"sec","runs_per_query":3,"recycle_every":$RecycleEvery,"production_total":${jd(prodTotal)},"md5_twin_total":${jd(twinTotal)},"queries":$qs,"families":$families,"runs":$runs,"failed":$failed,"sf":"$sfDir"}"""
    // The driver parses the FINAL stdout line into BENCH_r{N}.parsed, but
    // it captures only a ~2 KB stdout TAIL: the 4.5 KB full per-query dict
    // as the last line arrives head-truncated and unparseable (r7 verdict
    // item #2 — BENCH_r07.parsed null). So the FULL dict prints first and
    // is persisted to bench.json (the canonical artifact), and the COMPACT
    // summary (<2 KB: total, failures, 10 slowest, queries_file) is the
    // literal final stdout line — it both fits the tail window and parses.
    // build.sbt routes forked run output straight to stdout and suppresses
    // sbt's trailing [success] line so nothing follows it.
    // A SPARK_GRAFT_ONLY subset run is local A/B iteration, not the
    // artifact — it must never clobber the full-registry bench.json.
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
        (full + "\n").getBytes("UTF-8"))
    val slowest = results.collect { case (k, Some(v), _) => (k, v) }
      .sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + jd(v) }
      .mkString("{", ",", "}")
    // subset runs never write bench.json — pointing at it would attribute
    // a previous full run's numbers to this subset
    val qf = if (only.isEmpty) "\"bench.json\"" else "null"
    println(full)
    println(s"""{"metric":"total","value":${jd(total)},"unit":"sec","n":${results.size},"runs_per_query":3,"recycle_every":$RecycleEvery,"production_total":${jd(prodTotal)},"md5_twin_total":${jd(twinTotal)},"failed":$failed,"slowest":$slowest,"queries_file":$qf,"sf":"$sfDir"}""")
    // the forked JVM's stdout must flush before sbt tears the pipe down
    System.out.flush()
    spark.stop()
  }
}
