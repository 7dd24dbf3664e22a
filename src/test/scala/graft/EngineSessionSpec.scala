package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSessionSpec extends AnyFunSuite {

  test("custom expressions are callable from SQL text") {
    // Extensions only bind on a fresh session; reuse via newSession keeps
    // the shared test JVM but re-applies the registry.
    val spark = EngineSession.create(cores = 4, appName = "graft-ext-test")
    try {
      val dot = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sim = spark.sql(
        "SELECT simhash64(array('a','b','c')) AS s").head().getLong(0)
      assert(sim != 0L)
      val mh = spark.sql(
        "SELECT minhash_sig(array('a b c','b c d'), 8) AS m")
        .head().getSeq[Long](0)
      assert(mh.length == 8 && mh.forall(_ >= 0))
      val sh = spark.sql(
        "SELECT shingle_hashes('a b c d', 3) AS h").head().getSeq[Long](0)
      assert(sh.length == 2, "two 3-gram shingles of a 4-token doc")
    } finally ()
  }

  test("file-backed user stream feeds the demo aggregate") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val dirPath = java.nio.file.Files.createTempDirectory("userstream")
    val f = dirPath.resolve("batch1.json")
    java.nio.file.Files.writeString(f,
      """{"guid":"u1","eyeColor":"brown","age":41,"balance":"$10.00"}
        |{"guid":"u2","eyeColor":"blue","age":25,"balance":"$20.00"}
        |{"guid":"u3","eyeColor":"brown","age":52,"balance":"$30.00"}
        |""".stripMargin)
    val stream = graft.sources.UserStream.file(spark, dirPath.toString)
    assert(stream.isStreaming)
    val agg = stream.groupBy(col("eyeColor"))
      .agg(count(lit(1)).as("eye_color_count"))
    val handle = graft.streaming.ChangelogStream.updating(
      agg, "userstream-test", Seq("eyeColor"))
    try {
      handle.processAllAvailable()
      val table = handle.changelog().consume()
      assert(table.map(_.values).toSet ==
        Set(Vector("brown", 2L), Vector("blue", 1L)))
    } finally handle.stop()
  }
}
