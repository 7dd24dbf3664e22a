package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("media table schema: opaque binary + typed metadata") {
    val m = Multimodal.mediaTable(spark, dir)
    val f = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("kind") == "string" && f("width") == "int")
    assert(m.count() == 500)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val m = Multimodal.mediaTable(spark, dir)
    val a = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(m.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id)
      assert(x.features.toSeq == y.features.toSeq,
        "features must not depend on partitioning/batch boundaries")
      assert(x.features.length == Multimodal.FeatureDim)
    }
  }

  test("frame sampling preserves payload bytes across frames") {
    val m = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.sampleFrames(m, 4).collect()
    val orig = m.collect().map(r => r.media_id -> r.payload).toMap
    frames.foreach { fr =>
      assert(fr.n_frames == 4)
      assert(fr.frames.map(_.length).sum == orig(fr.media_id).length)
    }
  }

  test("resize rewrites metadata only") {
    val m = Multimodal.mediaTable(spark, dir)
    val r = Multimodal.resize(m, 64, 32).collect()
    assert(r.forall(x => x.width == 64 && x.height == 32))
  }

  test("catalog query prunes the payload column from the scan") {
    val plan = Multimodal.queries("m3_media_catalog")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"),
      s"metadata-only query must not read payload:\n$plan")
  }
}
