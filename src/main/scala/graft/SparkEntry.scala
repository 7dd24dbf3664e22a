package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Dedup, DemoQueries, Pipeline, Relational, Similarity, TextAnalysis}
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-domain query maps (graft.operators) into one registry.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ DemoQueries.queries ++
      Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ DemoQueries.oracleSql ++ Pipeline.oracleSql ++
      Multimodal.oracleSql

  /** Registry rows that deliberately run the slower ORACLE-REPLAYABLE
    * family of an operator instead of its production family, so the DuckDB
    * oracle can rebuild the exact same sketch/signature from the raw corpus
    * (md5-based hash families replayed as md5 SQL twins). The production
    * families (xxhash/codegen'd paths) remain the library defaults — these
    * rows price oracle exactness into the bench, and a bench-vs-baseline
    * judgment must not read that instrumentation tax as engine cost.
    * Bench/Scaling tag these rows `md5-twin` in their artifacts. */
  val oracleTwins: Set[String] = Set(
    "d4_minhash_lsh", "d5_simhash", "d14_span_removal",
    "p14_bloom_contamination", "p18_cms_topk", "q23_approx_distinct")

  /** Locale-safe JSON double (Bench + Scaling artifacts must parse on
    * comma-decimal locales too). */
  private[graft] def jsonDouble(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", d)
}
