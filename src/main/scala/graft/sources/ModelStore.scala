package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Load-or-build store for persisted model tables — the fit/apply split.
  *
  * A fitted model (IVF centroids, PQ codebooks) is built ONCE, written to
  * a parquet model table, and every later invocation CONSUMES the
  * persisted table instead of re-fitting. That is the production shape at
  * 100 TB: models are fit on a schedule (or once per corpus snapshot) and
  * applied corpus-wide by every downstream query; re-fitting per query
  * would re-scan the corpus for work whose output is a driver-sized
  * artifact that never changes between fits. Doubles round-trip parquet
  * bit-exactly, so apply-over-the-loaded-model is the SAME computation as
  * apply-over-the-fresh-fit (asserted in SimilaritySpec).
  *
  * Keying + atomicity follow `Multimodal.mediaParquet` (the pattern the
  * round-4 review settled): the key hashes the canonical fixture path,
  * the source file's mtime + size, and the model name — which must embed
  * every fit hyperparameter — so a regenerated fixture or a changed fit
  * recipe gets a fresh entry instead of silently serving a stale model.
  * Builds write to a unique temp dir and atomically rename into place;
  * concurrent JVMs race benignly (the loser adopts the winner's output).
  */
object ModelStore {

  /** Bump to invalidate every persisted model (format/layout changes). */
  private val StoreVersion = "v2"

  /** The store directory an entry resolves to — a pure function of
    * (fixture dir, source content stamp, model name), exposed so the
    * oracle harness can hand the SAME persisted parquet to DuckDB (the
    * d15 posting-index precedent: the artifact is part of the contract,
    * so the oracle consumes it rather than trusting the engine's read).
    * Keyed on [[Tables.tableStamp]] — the recursive (name, length,
    * mtime)-fold over every file under the table path — NOT the flat
    * top-level mtime/size, so a regenerated fixture whose directory
    * happens to preserve both still invalidates every model derived
    * from it (countMemo's staleness semantics, unified). */
  def path(dir: String, srcFile: String, name: String): java.io.File = {
    val table = srcFile.stripSuffix(".parquet")
    val stamp = new java.io.File(dir).getCanonicalPath +
      "|" + Tables.tableStamp(dir, table) + "|" + name +
      "|" + StoreVersion
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(stamp.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    new java.io.File(sys.props("java.io.tmpdir"), s"graft-model-$key")
  }

  /** Returns the persisted model table for (fixture `dir`, `name`),
    * building it via `build` on first use. `srcFile` is the fixture file
    * the model derives from (its content stamp keys the entry). */
  def table(spark: SparkSession, dir: String, srcFile: String, name: String)
           (build: => DataFrame): DataFrame = synchronized {
    val out = path(dir, srcFile, name)
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      val tmp = new java.io.File(out.getParentFile,
        out.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      build.write.mode("overwrite").parquet(tmp.getPath)
      // mutate shared state ONLY via the rename; never delete `out` here
      // (a check-then-delete could tear down a concurrent winner's output
      // between its rename and its read)
      if (!tmp.renameTo(out)) {
        if (new java.io.File(out, "_SUCCESS").exists()) {
          rm(tmp) // concurrent JVM won the race: adopt its output
        } else {
          return spark.read.parquet(tmp.getPath)
        }
      }
    }
    spark.read.parquet(out.getPath)
  }
}
