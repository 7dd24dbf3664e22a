package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fit/apply persistence contract (SURVEY §8 "Model store"): a model is
  * fit ONCE per corpus snapshot, a regenerated corpus invalidates rather
  * than silently serving the stale model, and the persisted table is the
  * bit-exact fit. */
class ModelStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-modelstore").toFile
    d
  }

  private def writeSrc(dir: java.io.File, rows: Seq[Long]): Unit = {
    import spark.implicits._
    rows.toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "src.parquet").getPath)
  }

  test("same corpus snapshot is a HIT (the fit runs once); a corpus " +
      "change INVALIDATES the stored model instead of silently reusing it") {
    import spark.implicits._
    val dir = freshDir()
    try {
      writeSrc(dir, Seq(1L, 2L, 3L))
      var fits = 0
      def fit() = { fits += 1; Seq((1L, "modelA")).toDF("k", "v") }
      val m1 = ModelStore.table(spark, dir.getPath, "src.parquet", "spec-m")(fit())
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(m1 == Seq((1L, "modelA")) && fits == 1)
      // second invocation, unchanged corpus: MUST be served from the store
      val m2 = ModelStore.table(spark, dir.getPath, "src.parquet", "spec-m")(fit())
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(m2 == m1)
      assert(fits == 1, "an unchanged corpus snapshot must not re-fit")
      // regenerate the corpus (different content → different size/mtime):
      // the stale model must NOT be served — the build re-runs
      writeSrc(dir, Seq(10L, 20L, 30L, 40L, 50L))
      def fit2() = { fits += 1; Seq((1L, "modelB")).toDF("k", "v") }
      val m3 = ModelStore.table(spark, dir.getPath, "src.parquet", "spec-m")(fit2())
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(fits == 2, "a regenerated corpus must invalidate the model")
      assert(m3 == Seq((1L, "modelB")),
        "the invalidated key must serve the NEW fit, not the stale model")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("the model name keys the fit recipe: different hyperparameters are " +
      "different models; doubles round-trip the store bit-exactly") {
    import spark.implicits._
    val dir = freshDir()
    try {
      writeSrc(dir, Seq(1L))
      // awkward doubles: subnormal-adjacent, repeating-binary, negative 0
      val vals = Seq(0.1, 1.0 / 3.0, -0.0, 4.9e-324, math.Pi * 1e15)
      val a = ModelStore.table(spark, dir.getPath, "src.parquet", "spec-k8") {
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      }.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      val b = ModelStore.table(spark, dir.getPath, "src.parquet", "spec-k16") {
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v * 2) }.toDF("i", "v")
      }.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(a.map(_._2).zip(vals).forall { case (x, y) =>
        java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y)
      }, "persisted doubles must round-trip bit-exactly")
      assert(b.map(_._2).toSeq == vals.map(_ * 2),
        "a different model name must carry its own fit, not k8's")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
