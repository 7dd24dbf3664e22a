package graft.operators

/** Cross-engine harness dump for the d5 TRIPLE banding arms: writes the
  * forced-arity-3 Spark output and the cutoff-1 oracle SQL so the local
  * DuckDB gate can compare them at fixture scale (where the registry's
  * real cutoff keeps triples dormant). Test-scoped tool, not shipped.
  * Paths are overridable (-Dgraft.d5.sfdir / -Dgraft.d5.outdir or the
  * GRAFT_D5_SFDIR / GRAFT_D5_OUTDIR env vars) so the harness runs on any
  * machine layout; the defaults match the driver's fixture tree. */
object D5TripleDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.props.get("graft.d5.sfdir")
      .orElse(sys.env.get("GRAFT_D5_SFDIR"))
      .getOrElse("/root/testdata/sf0.01")
    val outDir = sys.props.get("graft.d5.outdir")
      .orElse(sys.env.get("GRAFT_D5_OUTDIR"))
      .getOrElse("/tmp")
    val s = graft.SparkTestSession.spark
    Dedup.d5SimHashMd5(s, sfDir, forcedArity = Some(3))
      .write.mode("overwrite").parquet(s"$outDir/d5_trip_spark")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/d5_oracle_trip.sql"),
      Dedup.d5Md5OracleSql(1L).getBytes("UTF-8"))
    println("DUMPED")
  }
}
