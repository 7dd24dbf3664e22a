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

  /** Locale-safe JSON double (Bench + Scaling artifacts must parse on
    * comma-decimal locales too). */
  private[graft] def jsonDouble(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", d)
}
