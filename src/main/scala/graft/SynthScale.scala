package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Synthesize a larger scale rung by replicating a fixture directory with
  * disjoint key ranges — the 4th SCALING rung (sf0.3 from sf0.1) the
  * 3-point fixture ladder cannot provide. Each copy k offsets every key
  * and foreign-key column by k·3·10⁸ (a multiple of 3, so doc_id-derived
  * rotations like the media synth's `id % 3` keep their distribution),
  * leaving dimension tables (region/nation — fixed across TPC-H scale
  * factors) unreplicated. Foreign keys offset together, so every join
  * stays within its copy and per-key cardinalities match the source —
  * the workload is "3× more of the same", which is exactly what a scale
  * step should be.
  *
  * Cross-copy DISJOINTNESS matters as much as the offsets: naive
  * replication makes every document an exact clone of its 2 siblings,
  * which inflates pairwise families superlinearly (each clone group
  * contributes C(copies,2) dedup pairs; SemDeDup cells triple and their
  * within-cell pair work grows 9×) and simultaneously DEFLATES the
  * shingle index (mid-frequency shingles cross the df cap and vanish) —
  * the rung would measure a different workload, not a bigger one. So
  * each copy k>0 is made structure-preservingly distinct:
  *  - documents: every token gets a `c{k}_` prefix (zero-width-boundary
  *    regex — token count, boundaries, and within-copy relationships are
  *    EXACTLY preserved; cross-copy n-gram overlap becomes zero);
  *    n_chars re-derived from the rewritten text.
  *  - embeddings: vectors circular-shift by k·D/copies positions — an
  *    exact rotation (within-copy dots, norms, distances, and label
  *    geometry untouched; cross-copy cosines decorrelate to noise).
  *
  * Usage: `runMain graft.SynthScale [srcDir] [outDir] [copies]`;
  * defaults sf0.1 → /tmp/graft-sf0.3 × 3. `graft.Scaling` picks the
  * output up automatically as its largest rung when present. */
object SynthScale {

  /** Key offset per copy: multiple of 3 (media-kind rotation), far above
    * any fixture key (sf0.1 max doc_id ≈ 5·10⁵). */
  val CopyOffset = 300000000L

  /** Key and foreign-key columns to offset, per table; absent tables copy
    * unchanged. */
  val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )

  def synthesize(spark: SparkSession, src: String, out: String,
                 copies: Int): Unit = {
    Tables.all.foreach { t =>
      val base = Tables.load(spark, src, t)
      val keys = KeyCols.getOrElse(t, Seq.empty)
      val df =
        if (keys.isEmpty) base.coalesce(1)
        else (0 until copies).map { k =>
          val offset = keys.foldLeft(base)((d, c) =>
            d.withColumn(c, col(c) + lit(k * CopyOffset)))
          distinguish(offset, t, k, copies)
        }.reduce(_.unionAll(_)).coalesce(copies)
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  /** Make copy k>0 cross-copy disjoint without touching within-copy
    * structure (see scaladoc). Copy 0 is the source verbatim. */
  private def distinguish(df: org.apache.spark.sql.DataFrame, table: String,
                          k: Int, copies: Int) =
    if (k == 0) df
    else table match {
      case "documents" =>
        // zero-width boundary match: every token (including empty tokens
        // from consecutive spaces) gains the same prefix, so split(' ')
        // yields the same token COUNT at every position
        df.withColumn("text",
            regexp_replace(col("text"), "^|(?<= )", s"c${k}_"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        // exact rotation: circular shift by k/copies of the dimensions
        df.withColumn("embedding", expr(
          s"concat(slice(embedding, size(embedding) * $k DIV $copies + 1, " +
            s"size(embedding)), " +
            s"slice(embedding, 1, size(embedding) * $k DIV $copies))"))
      case _ => df
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf0.3"
    val copies = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-synth-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, src, out, copies)
    println(s"""{"synth":"$out","copies":$copies,"src":"$src"}""")
    spark.stop()
  }
}
