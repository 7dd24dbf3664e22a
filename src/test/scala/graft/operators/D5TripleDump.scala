package graft.operators

/** Cross-engine harness dump for the d5 TRIPLE banding arms: writes the
  * forced-arity-3 Spark output and the cutoff-1 oracle SQL so the local
  * DuckDB gate can compare them at fixture scale (where the registry's
  * real cutoff keeps triples dormant). Test-scoped tool, not shipped. */
object D5TripleDump {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestSession.spark
    Dedup.d5SimHashMd5(s, "/root/testdata/sf0.01", forcedArity = Some(3))
      .write.mode("overwrite").parquet("/tmp/d5_trip_spark")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/d5_oracle_trip.sql"),
      Dedup.d5Md5OracleSql(1L).getBytes("UTF-8"))
    println("DUMPED")
  }
}
