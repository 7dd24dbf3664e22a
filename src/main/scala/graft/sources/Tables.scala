package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (see TESTDATA.md / FIXTURES.md): one parquet file per
  * table under a scale-factor directory.
  *
  * Plays the role of the catalog/database the reference resolves per
  * statement (`/root/reference/config.template.ini:41-44`,
  * `/root/reference/api/statements.py:27-31`): `registerAll` makes every
  * fixture table resolvable by name from SQL, the way the remote Flink
  * catalog resolved `` `user` `` for the demo queries.
  *
  * Scale note: these are plain parquet scans — at cluster scale the same
  * names would be backed by a partitioned/bucketed catalog table; all query
  * code below only depends on the name → DataFrame mapping, so swapping the
  * resolution layer does not touch operators.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // memoized per (session, path): re-reading re-lists files and re-reads
  // footers; with 40+ registry queries per Verify/Bench run that overhead
  // repeats for nothing (plans are immutable, reuse is safe)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"), _ =>
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet"))

  /** events.parquet has shipped `ts` in two physical shapes across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as raw INT64 via
    * `spark.sql.legacy.parquet.nanosAsLong` and truncate to micros, the
    * same truncation DuckDB applies) and plain TIMESTAMP(MICROS) without
    * UTC adjustment (which Spark reads as TIMESTAMP_NTZ). Normalize BOTH to
    * session-zone TimestampType so downstream code (watermarks, unix_micros,
    * range frames) sees one type; the NTZ→LTZ cast is numerically identity
    * because every session in this engine pins spark.sql.session.timeZone
    * to UTC — the same convention DuckDB's epoch_us applies to naive
    * timestamps, which is what keeps the oracle comparable. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS), isAdjustedToUTC=false
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  /** Register every fixture table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Cheap content stamp for a table under `dir`: fold (name, length,
    * mtime) over every file below the table path — a recursive walk of
    * the parquet dir only, never the data. Keys every cache that must
    * not survive a regenerated fixture (the synth rungs under /tmp are
    * rebuilt mid-session). */
  private[graft] def tableStamp(dir: String, table: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().foldLeft(f.lastModified()) {
        (acc, c) => acc * 1000003L + walk(c)
      }
      else f.getName.hashCode.toLong * 31L + f.length() * 1000003L +
        f.lastModified()
    val root = new java.io.File(dir, s"$table.parquet")
    if (root.exists()) walk(root) else 0L
  }

  private val countMemoMap =
    new scala.collection.concurrent.TrieMap[(String, String, Long), Long]

  /** Row-count memo keyed on (canonical path, table, content stamp) —
    * ONE definition for every adaptive mechanism that sizes itself from
    * a corpus count (v3's band width, d5's band arity), so their
    * staleness semantics cannot diverge. The count job runs once per
    * (dir, table) per content generation instead of inside every timed
    * invocation. */
  private[graft] def countMemo(spark: SparkSession, dir: String,
                               table: String): Long =
    countMemoMap.getOrElseUpdate(
      (new java.io.File(dir).getCanonicalPath, table, tableStamp(dir, table)),
      load(spark, dir, table).count())
}
