package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scale-trend probe: runs every registry query at a ladder of scale
  * factors (default sf0.001 → sf0.01 → sf0.1, each 10× the data of the
  * last) and writes a machine-readable `SCALING.json` — per-query times at
  * each rung, the time ratio across the largest 10× step, and an explicit
  * `superlinear` list of queries whose ratio exceeds the data ratio. A
  * query whose time grows faster than its input cannot survive the
  * 100 TB target, so the flag list is the artifact a scale review reads
  * first (ScalingArtifactSpec asserts it stays empty).
  *
  * Measurement protocol matches Bench: noop-sink materialization,
  * min-of-2 with a cold operator-cache per run (clearCache), shared JIT
  * warmth via an untimed warmup query.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    // default ladder: the three fixture rungs, plus SynthScale's
    // replicated sf0.3 as a 4th rung when it has been generated
    // (`runMain graft.SynthScale`) — the largest step then becomes
    // 0.1→0.3 and the flag threshold adjusts via the measured ratio
    // synthesized rungs are appended in size order as they exist:
    // sf0.3 (3 copies of sf0.1) and sf1 (10 copies) — the largest
    // present becomes the flag step, with its threshold measured from
    // lineitem counts as always
    val synths = Seq("/tmp/graft-sf0.3", "/tmp/graft-sf1")
      .filter(d => Files.exists(Paths.get(d, "lineitem.parquet")))
    val fixtures = "/root/testdata/sf0.001,/root/testdata/sf0.01," +
      "/root/testdata/sf0.1"
    val defaultDirs = (fixtures +: synths).mkString(",")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SCALING_DIRS", defaultDirs)
      .split(",").toSeq
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "SCALING.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-scaling")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = newSession()

    // time ratio allowed across the LAST (largest) data step before a
    // query is flagged: exactly-linear matches the step's data growth;
    // fixed per-query overheads push real ratios well below it, so
    // crossing it means superlinear work. Measured from the corpus
    // itself (lineitem row counts of the last two rungs) so a non-10×
    // synthesized rung gets the right threshold; env overrides.
    val dataRatio = sys.env.get("SPARK_GRAFT_SCALING_DATA_RATIO")
      .map(_.toDouble).getOrElse {
        val Seq(prev, last) = dirs.takeRight(2).map(d =>
          spark.read.parquet(s"$d/lineitem.parquet").count().toDouble)
        math.max(1.0, last / prev)
      }

    def warmup(): Unit = {
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"${dirs.head}/nation.parquet")
      val r = spark.read.parquet(s"${dirs.head}/region.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).count().orderBy(col("r_name"))
        .write.format("noop").mode("overwrite").save()
    }
    warmup()

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Option[Double] = {
      val ts = (1 to 2).flatMap { _ =>
        spark.catalog.clearCache()
        System.gc() // release localCheckpoint blocks too (see Bench)
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[scaling] failed on $dir: ${e.getMessage}")
          None
        }
      }
      if (ts.size == 2) Some(ts.min) else None
    }

    // local-iteration filter (driver/recipe runs pass no env)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = dirs.map(d => time(fn, d))
      // ratio over the LAST (largest) 10× step — the one that predicts the
      // next scale-up; smaller rungs are dominated by fixed overhead
      val ratio = (times.takeRight(2) match {
        case Seq(Some(a), Some(b)) if a > 0 => Some(b / a)
        case _ => None
      })
      System.err.println(s"[scaling] $name: " +
        times.map(_.map(t => f"$t%.2f").getOrElse("fail")).mkString(" -> ") +
        ratio.map(r => f" (ratio $r%.2f)").getOrElse(""))
      (name, times, ratio)
    }
    // A ratio measured 100+ queries into a shared JVM can be inflated by
    // accumulated state (GC debt, code-cache bloat, OS cache churn) that
    // is NOT the query's own scaling — measured: m9 flagged at 3.56 in a
    // full 131-query run, 1.14 isolated. A flag the artifact publishes
    // must be REPRODUCIBLE in isolation, so flagged queries re-measure in
    // a fresh SparkSession (fresh context, block manager, empty caches)
    // over the last two rungs, and only a surviving ratio flags. The
    // retried list stays in the artifact so the first-pass inflation is
    // visible, not papered over.
    // Queries whose DOCUMENTED complexity is superlinear: v2 is the exact
    // all-pairs cosine baseline (N²/2 by definition — it exists to verify
    // d4/v3/v8's approximate paths) and v21 is its blocked scale tier —
    // same exact pair set, the quadratic confined to primitive-loop FLOPs
    // and prunable by tile geometry only on clustered corpora (this
    // fixture's bulk is measured-isotropic, so its exponent stays 2; see
    // v21's scaladoc). q36 is the DENSE gap-fill: its calendar explode
    // materializes one row per (user × timeline-hour) regardless of
    // activity — O(users × span), not O(events) — so its cost grows with
    // the time dimension independently of input size (a year-long corpus
    // pays 8 760 rows/user however sparse). On THIS ladder span is fixed
    // and the measured ratio stays sub-data-ratio (2.96 at r7's sf1
    // rung), but the declaration records the complexity class, not the
    // fixture's luck: q48_gap_fill_sparse is the oracle-identical at-scale
    // path (observed-rows-only, 0.4 s where q36 pays 10 s). The
    // DECLARATION is published unconditionally — r5's artifact intersected
    // it with the flagged set and the honest "v2 is quadratic" record
    // vanished whenever fixed overheads kept its measured ratio under the
    // flag line. ScalingArtifactSpec pins this set so it cannot silently
    // grow.
    val expectedSuperlinear = Set("v2_cosine_pairs",
      "v21_cosine_pairs_blocked", "q36_gap_fill")
    // Retry WELL below the flag line: a published ratio in the
    // suspicious band (>2.0 at a 3.33× step) must carry isolated-session
    // evidence even when it does not flag — r5 shipped m9 at 3.01 with
    // `retried` empty while NOTES.md knew the isolated number was 1.14,
    // and r6 left six queries in the 2.0–2.5 band (q8 2.40 … t7 2.14)
    // with no isolated numbers. The empty-`superlinear` claim is only as
    // strong as its residuals, so everything above 2.0 re-measures in a
    // fresh session and publishes `first_pass_ratio`. Declared-
    // superlinear queries skip the retry (their ratio is the documented
    // complexity, not an artifact to launder).
    val retryThreshold = math.min(
      sys.env.get("SPARK_GRAFT_SCALING_RETRY_RATIO").map(_.toDouble)
        .getOrElse(2.0), dataRatio)
    val firstFlag = rows.collect {
      case (n, _, Some(r)) if r > retryThreshold && !expectedSuperlinear(n) => n
    }
    val retried: Map[String, (Double, Double)] =
      if (firstFlag.isEmpty) Map.empty
      else {
        spark.stop()
        spark = newSession()
        warmup()
        firstFlag.map { n =>
          val fn = SparkEntry.queries(n)
          val Seq(a, b) = dirs.takeRight(2).map(d => time(fn, d))
          val pair = (a.getOrElse(Double.NaN), b.getOrElse(Double.NaN))
          System.err.println(f"[scaling] retry $n: ${pair._1}%.2f -> " +
            f"${pair._2}%.2f (ratio ${pair._2 / pair._1}%.2f)")
          n -> pair
        }.toMap
      }
    val finalRatio: Map[String, Option[Double]] = rows.map {
      case (n, _, r0) =>
        n -> retried.get(n).map { case (a, b) =>
          if (a > 0 && !b.isNaN) b / a else Double.NaN
        }.orElse(r0)
    }.toMap
    // a retry that cannot RUN is a failure, not a ratio — it must land in
    // `failed` (loud), never be absorbed by the expected-superlinear
    // exemption
    val retryFailed = retried.collect {
      case (n, (a, b)) if a.isNaN || b.isNaN => n
    }.toSet
    val allFlagged = rows.collect {
      case (n, _, _) if !retryFailed(n) &&
        finalRatio(n).exists(_ > dataRatio) => n
    }
    val superlinear = allFlagged.filterNot(expectedSuperlinear)
    // a query that cannot produce a ratio (failed at any rung) must be
    // LOUD, not silently absent from the superlinear list — failing at the
    // largest scale factor is the worst possible scale verdict
    val failed = (rows.collect {
      case (n, times, _) if times.exists(_.isEmpty) => n
    } ++ retryFailed).distinct
    def jd(d: Double): String = SparkEntry.jsonDouble(d)
    val qjson = rows.map { case (n, times, ratio) =>
      // retried queries report their isolated last-two-rung times so the
      // times array and the ratio describe the same measurement
      val shown = retried.get(n) match {
        case Some((a, b)) => times.dropRight(2) ++
          Seq(Some(a).filterNot(_.isNaN), Some(b).filterNot(_.isNaN))
        case None => times
      }
      val ts = shown.map(_.map(jd).getOrElse("null")).mkString("[", ",", "]")
      val r = finalRatio(n).filterNot(_.isNaN).map(jd).getOrElse("null")
      val first = retried.get(n)
        .flatMap(_ => ratio.map(r0 => s""","first_pass_ratio":${jd(r0)}"""))
        .getOrElse("")
      // md5-twin rows run the oracle-replayable family, not the production
      // one (SparkEntry.oracleTwins) — tagged so a scale reviewer knows
      // which cost is engine and which is oracle instrumentation
      val fam = if (SparkEntry.oracleTwins(n)) ""","family":"md5-twin"""" else ""
      s""""$n":{"times":$ts,"ratio":$r$first$fam}"""
    }.mkString("{", ",", "}")
    val dj = dirs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sj = superlinear.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rj = retried.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // the declared set, published UNCONDITIONALLY (see its definition)
    val ej = expectedSuperlinear.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"dirs":$dj,"data_ratio_per_step":${jd(dataRatio)},"queries":$qjson,"superlinear":$sj,"expected_superlinear":$ej,"failed":$fj,"retried":$rj}"""
    Files.writeString(Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
