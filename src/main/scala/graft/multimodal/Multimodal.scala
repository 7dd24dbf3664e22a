package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A multimodal asset: opaque binary payload + typed metadata. The payload
  * is BinaryType — Spark treats it as bytes; only the decode stage (a
  * batched partition-level function) interprets it. */
case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    format: String,
    width: Int,
    height: Int,
    duration_ms: Long)

case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

case class MediaFrames(
    media_id: Long,
    kind: String,
    n_frames: Int,
    frames: Array[Array[Byte]])

/** Multimodal-column operators (SURVEY.md §2C): treat image/audio/video as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as *batched partition-level* functions over
  * `Dataset[MediaRecord]` — the Scala equivalent of the arrow-batched
  * mapInPandas shape: one JVM call per batch, not per row, so a real codec
  * would amortize model/codec init across the batch.
  *
  * ⚠ STUBBED DECODE: no image/audio codec libraries exist in this
  * environment, so `decodeStub` produces a *deterministic fake* feature
  * vector seeded from the payload bytes. The Spark-side plumbing — schema,
  * encoders, batching, partitioning — is real and tested; swap `decodeStub`
  * for a real decoder to productionize.
  *
  * Scale: all stages are narrow (mapPartitions, no shuffle); payload bytes
  * stay on the executor that read them. At 100 TB the media table would be
  * size-partitioned parquet with payloads in their own column chunk so
  * metadata-only queries never read the bytes (column pruning).
  */
object Multimodal {

  val FeatureDim = 32
  val BatchSize = 64

  /** Synthesize the media fixture from `documents`: payload = utf-8 text
    * bytes (opaque stand-in), kind/format/dims derived deterministically
    * from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        $"text".cast("binary").as("payload"),
        element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
          ($"doc_id" % 3 + 1).cast("int")).as("format"),
        (($"doc_id" % 8) * 160 + 320).cast("int").as("width"),
        (($"doc_id" % 8) * 90 + 180).cast("int").as("height"),
        ($"n_chars" * 10).as("duration_ms"))
      .as[MediaRecord]
  }

  /** STUB: deterministic fake "decode + embed". A real implementation
    * would decode `payload` (JPEG/WAV/H264) and run a feature extractor;
    * here the features are a seeded PRNG stream from the payload hash so
    * results are stable across runs/partitionings. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val rng = new scala.util.Random(crc.getValue)
    Array.fill(dim)(rng.nextFloat() * 2f - 1f)
  }

  /** Feature extraction over batches: the per-batch grouping is where a
    * real codec/model would be initialized once and reused. */
  def extractFeatures(media: Dataset[MediaRecord],
                      dim: Int = FeatureDim,
                      batchSize: Int = BatchSize): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-scoped init would go here (codec/model handle)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            decodeStub(m.payload, dim))
        }
      }
    }
  }

  /** STUB frame sampling: a real implementation would seek keyframes; the
    * fake slices the payload into `n` contiguous chunks (deterministic,
    * preserves bytes) so downstream shape/partitioning is exercised. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int = 4): Dataset[MediaFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val len = m.payload.length
        val frames = (0 until math.min(n, math.max(len, 1))).map { i =>
          val from = (len.toLong * i / n).toInt
          val until = (len.toLong * (i + 1) / n).toInt
          java.util.Arrays.copyOfRange(m.payload, from, math.max(until, from))
        }.toArray
        MediaFrames(m.media_id, m.kind, frames.length, frames)
      }
    }
  }

  /** STUB resize: real impl decodes + rescales pixels; fake rewrites the
    * typed metadata (the part a catalog query would predicate on) and
    * passes the payload through. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(width = w, height = h))
  }

  /** Rows-only driver queries (binary payloads and stubbed decode are not
    * SQL-oracle territory; MultimodalSpec covers determinism + shape). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_features" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      extractFeatures(mediaTable(s, d))
        .select($"media_id", $"kind", $"n_bytes",
          size($"features").as("feature_dim"))
        .orderBy($"media_id")
    }),
    "m2_frame_sample" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      sampleFrames(mediaTable(s, d))
        .select($"media_id", $"kind", $"n_frames",
          aggregate(transform($"frames", f => length(f)),
            lit(0), (acc, v) => acc + v).as("total_frame_bytes"))
        .orderBy($"media_id")
    }),
    "m3_media_catalog" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // metadata-only scan: never touches payload (column pruning)
      mediaTable(s, d).toDF()
        .groupBy($"kind", $"format")
        .agg(count(lit(1)).as("n"),
          sum($"duration_ms").as("total_ms"),
          max($"width").as("max_w"))
        .orderBy($"kind", $"format")
    }),
  )
}
