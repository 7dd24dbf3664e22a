package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler (not part of the deliverable surface).
  * Pass query names as args to time just those (min-of-2, cold caches),
  * or no args for the full stage breakdown. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._
    import graft.sources.Tables

    def timed(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def time(name: String)(f: => Unit): Unit =
      println(f"[profile] $name%-30s ${timed(f)}%.3f s")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(Tables.load(spark, sfDir, "documents").groupBy($"lang").count())

    if (args.nonEmpty) {
      val registry = SparkEntry.queries
      args.foreach { q =>
        val runs = (1 to 2).map(_ => timed(noop(registry(q)(spark, sfDir))))
        println(f"[profile] $q%-30s min ${runs.min}%.3f s  runs ${runs.map(t => f"$t%.3f").mkString(" ")}")
      }
      spark.stop()
      return
    }

    for (_ <- 1 to 2) {
      time("scan+explode+hash") {
        noop(Tables.load(spark, sfDir, "documents")
          .select($"doc_id", explode(shingles(tokens($"text"), 3)).as("s"))
          .select($"doc_id", xxhash64($"s").as("h")))
      }
      time("scan only") {
        noop(Tables.load(spark, sfDir, "documents").select($"doc_id", $"text"))
      }
      time("native shingle hashes") {
        noop(Tables.load(spark, sfDir, "documents")
          .select($"doc_id", explode(shingleHashes($"text", 3)).as("h")))
      }
      time("full d3 (registry)") {
        noop(SparkEntry.queries("d3_jaccard_pairs")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
