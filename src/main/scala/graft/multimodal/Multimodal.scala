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
  * frame-sample / resize run as *batched partition-level* functions over
  * `Dataset[MediaRecord]` — the Scala equivalent of the arrow-batched
  * mapInPandas shape: one JVM call per batch, not per row, so codec/model
  * init amortizes across the batch.
  *
  * The decode is REAL in every modality, raw and compressed: binary PPM
  * (P6) + JPEG/PNG images (JDK `javax.imageio`), PCM-16 WAV + IMA ADPCM
  * audio (the standard 4-bit lossy codec, hand-rolled from the published
  * tables, WAVE tag 0x11), concatenated-PPM + MJPEG-in-AVI video (real
  * RIFF container, JPEG frames) — no external libraries. Only long-GOP /
  * entropy-coded codecs (H264/MP3) remain environment-blocked; the
  * operator contract (bytes in, pixels/samples out) is identical either
  * way. Features, resize, and frame sampling all operate on the decoded
  * representation.
  *
  * Scale: all stages are narrow (mapPartitions, no shuffle); payload bytes
  * stay on the executor that read them. At 100 TB the media table would be
  * size-partitioned parquet with payloads in their own column chunk so
  * metadata-only queries never read the bytes (column pruning — asserted
  * in MultimodalSpec).
  */
object Multimodal {

  val FeatureDim = 32
  val BatchSize = 64
  val VideoFrames = 4
  val AudioRate = 8000

  /** Synthesize the media fixture from `documents`: REAL encoded payloads
    * (PPM/WAV/PPM-sequence) with contents derived deterministically from
    * doc_id, so every decode-side assertion can be recomputed driver-side. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)]
      .map { case (id, _) => synthesize(id) }
  }

  /** Deterministic media synth for one id (also used by specs). Every
    * modality rotates through a raw AND a compressed format — images
    * ppm / jpeg / png, audio wav / adpcm, video ppm-seq / mjpeg-avi — so
    * the real compressed-codec paths are exercised by every media query,
    * not just their own specs. */
  def synthesize(id: Long): MediaRecord = (id % 3) match {
    case 0 => // image: one frame, format ppm | jpeg | png by id
      val format = ((id / 3) % 3) match {
        case 0 => "ppm"
        case 1 => "jpeg"
        case _ => "png"
      }
      // every fifth image is a PLANTED near-duplicate of the previous
      // image id: same texture, +8 brightness, (almost always) a
      // different encoding format from the rotation — ground truth for
      // m7's perceptual-hash dedup. The texture range tops out at ~210
      // so the shift never clamps (a clamp would flip gradient bits).
      val dupOf = if ((id / 3) % 5 == 2 && id >= 3) Some(id - 3) else None
      val src = dupOf.getOrElse(id)
      val w = 16 + (src % 8).toInt * 4
      val h = 9 + (src % 8).toInt * 2
      val base = texturePixels(src, w, h)
      val px = dupOf.fold(base)(_ =>
        base.map(b => ((b & 0xff) + 8).toByte))
      MediaRecord(id, "image", Codec.encodeImage(format, w, h, px),
        format, w, h, 0L)
    case 1 => // audio: rotates raw PCM-16 WAV | IMA ADPCM (4-bit lossy)
      // every fifth audio clip is a PLANTED duplicate of the previous
      // audio id: the same three-partial tone at 0.9× gain — ground truth
      // for m8's fingerprint dedup. The wav/adpcm rotation keys off id/3
      // parity, and id vs id−3 always flip it, so every planted pair is
      // CROSS-FORMAT (lossless vs 4-bit lossy) by construction.
      val dupOf = if ((id / 3) % 5 == 2 && id >= 3) Some(id - 3) else None
      val src = dupOf.getOrElse(id)
      val n = 400 + (src % 100).toInt * 8
      // three sinusoid partials at integer cycles per 256-sample frame
      // (frames tile the clip, so every frame carries the same spectrum);
      // multiplicative-hash frequencies from disjoint low/mid/high thirds
      // of the 127-bin band — distinct by construction within a clip, and
      // unrelated clips collide on all three with p ≈ 1/62k. Each partial
      // also carries an id-derived PHASE: two clips that DO collide on
      // the whole frequency triple still decorrelate (per-partial corr =
      // cos Δφ; all three near 0 together with p ≈ 3e-3), so a hash
      // collision cannot masquerade as a verified duplicate — residual
      // false-pair probability ≈ 5e-8/pair, ≪ 1 even at 10⁶ clips.
      // Amplitudes 6000/4000/2500 keep each partial far above the ADPCM
      // noise floor (SNR ≥ 25 dB) and the sum within 16-bit range.
      val f1 = 2 + ((src * 0x9E3779B97F4A7C15L >>> 40) % 39).toInt
      val f2 = 41 + ((src * 0xC2B2AE3D27D4EB4FL >>> 40) % 40).toInt
      val f3 = 81 + ((src * 0x165667B19E3779F9L >>> 40) % 40).toInt
      def phase(salt: Long): Double =
        2 * math.Pi * ((src * salt >>> 48) & 0xff) / 256.0
      val (p1, p2, p3) =
        (phase(0xFF51AFD7ED558CCDL), phase(0xC4CEB9FE1A85EC53L),
          phase(0x2545F4914F6CDD1DL))
      val gain = if (dupOf.isDefined) 0.9 else 1.0
      val samples = Array.tabulate(n) { i =>
        val t = 2 * math.Pi * i / 256.0
        ((math.sin(t * f1 + p1) * 6000 + math.sin(t * f2 + p2) * 4000 +
          math.sin(t * f3 + p3) * 2500) * gain).toShort
      }
      val format = if ((id / 3) % 2 == 0) "wav" else "adpcm"
      val payload =
        if (format == "wav") Codec.encodeWav(samples, AudioRate)
        else Codec.encodeAdpcmWav(samples, AudioRate)
      MediaRecord(id, "audio", payload, format, 0, 0, n * 1000L / AudioRate)
    case _ => // video: rotates concatenated-PPM | MJPEG-in-AVI container
      // every fifth video is a PLANTED duplicate of the previous video
      // id: the SAME frames transcoded into the OTHER container
      // (lossless ppms ↔ lossy mjpeg — the real-world "same video,
      // different encode" dup) — ground truth for m9's perceptual video
      // dedup. Geometry, frames, and the scene-cut rule all follow the
      // SOURCE id (m6's spec resolves expectations via videoDupSource).
      val dupOf = videoDupSource(id)
      val src = dupOf.getOrElse(id)
      val w = 16 + (src % 4).toInt * 4
      val h = 8 + (src % 4).toInt * 2
      // half the source videos (src % 6 == 2) carry a REAL scene cut at
      // the midpoint: later frames switch from the drifting texture to a
      // static uniform flash (within-scene per-pixel drift ≤ ~10 of 255
      // vs cross-cut ≈ 120) — ground truth for m6's boundary
      // detection. The format rotation keys off (src/3)/2 so cut
      // carriers land in BOTH containers.
      val frames = (0 until VideoFrames).map { f =>
        if (src % 6 == 2 && f >= VideoFrames / 2) flashPixels(w, h)
        else texturePixels(src, w, h, f)
      }
      val baseFormat = if (((src / 3) / 2) % 2 == 0) "ppms" else "mjpeg"
      val format = dupOf.fold(baseFormat)(_ =>
        if (baseFormat == "ppms") "mjpeg" else "ppms")
      MediaRecord(id, "video", Codec.encodeVideo(format, w, h, frames),
        format, w, h, VideoFrames * 40L)
  }

  /** Planted-duplicate source for video ids: every fifth video re-encodes
    * the previous video id's frames in the other container. Shared by the
    * synth, the m6 spec (cut expectations follow the source), and the m9
    * spec (ground truth). */
  private[multimodal] def videoDupSource(id: Long): Option[Long] =
    if (id % 3 == 2 && (id / 3) % 5 == 2 && id >= 3) Some(id - 3) else None

  /** Image/video texture: the sum of two id-parameterized triangle waves —
    * smooth (constant-slope segments, so perceptual gradient bits are
    * stable under brightness shifts and codec loss, unlike per-pixel
    * noise) yet diverse (four frequency parameters from a 29⁴ space, so
    * distinct ids virtually never share a gradient field — and when two
    * ids DO collide, their pixels really are near-identical, i.e. a true
    * duplicate, not a hash artifact). Range [60, 210]: headroom for the
    * dup plant's +8 shift. Video frames use the same texture with a
    * per-frame PHASE DRIFT (smooth motion: per-pixel |Δ| ≤ ~10 between
    * adjacent frames, far under m6's cut threshold, while the id-keyed
    * gradient field keeps unrelated videos dHash-distinct for m9 — the
    * old mod-256 ramp had id-independent gradients, so every video
    * looked perceptually identical to every other). */
  private def texturePixels(id: Long, w: Int, h: Int,
                            frame: Int = 0): Array[Byte] = {
    def tri(t: Long, p: Int): Int = {
      val m = (((t % p) + p) % p).toInt
      if (m < p / 2) m else p - m
    }
    val ax = 2 + (id * 7 % 29).toInt; val ay = 2 + (id * 13 % 29).toInt
    val bx = 2 + (id * 19 % 29).toInt; val by = 2 + (id * 23 % 29).toInt
    val ph = (id % 251).toInt + frame * 7
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 60 + tri(x.toLong * ax + y.toLong * ay + ph, 120) +
          tri(x.toLong * bx - y.toLong * by + 2L * ph, 120) / 2
        val i = (y * w + x) * 3
        px(i) = v.toByte // v ≤ 150, so +20/+40/+8-dup all stay below 255
        px(i + 1) = (v + 20).toByte
        px(i + 2) = (v + 40).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** The post-cut scene: a static uniform bright flash (245). Constant
    * frames are the dHash-stable high-contrast scene: the luminance jump
    * vs the [80,170] texture is ~120 of 255 (m6's cut signal, well over
    * the threshold), while every dHash cell mean is EQUAL, so the hash is
    * exactly 0 under any codec — JPEG encodes a constant frame without
    * ringing (a checkerboard here put every dHash gradient on a
    * knife-edge and the mjpeg leg's hash bits flipped arbitrarily,
    * breaking m9's transcode-dup recall for cut carriers). */
  private def flashPixels(w: Int, h: Int): Array[Byte] =
    Array.fill(w * h * 3)(245.toByte)

  /** The media table materialized as parquet — payloads live in their own
    * column chunk, so metadata-only queries prune them at the SCAN (the
    * 100 TB storage layout; asserted in MultimodalSpec). Written once per
    * fixture per JVM; queries read this, not the in-memory synth.
    *
    * Cache keying: canonical fixture path PLUS a content stamp (mtime +
    * size of the source documents parquet), md5'd — a regenerated fixture
    * at the same path gets a fresh cache entry instead of silently
    * serving stale media, and distinct fixture dirs cannot collide the
    * way a raw String.hashCode could. Cross-process safety: the table is
    * written to a unique temp dir and atomically renamed into place; a
    * concurrent JVM that wins the race simply has its output adopted. */
  def mediaParquet(spark: SparkSession, dir: String): DataFrame =
    mediaParquet(spark, dir, spread = false)

  /** `spread = true` opts the read into the scale-adaptive input spread
    * ([[spreadMedia]]) — ONLY for queries whose scan stage round-trips
    * full codecs per row (m4: interleaved A/B 0.32×). Everything else
    * measured neutral-to-worse (m7 0.97×, m9 0.93×, m1 1.18×, m5 1.42×,
    * m3 2.53×): the typed `.as[MediaRecord]` boundary defeats column
    * pruning through the repartition, so a blanket spread shuffles
    * payload bytes even for metadata-only queries. */
  def mediaParquet(spark: SparkSession, dir: String,
                   spread: Boolean): DataFrame = synchronized {
    val src = new java.io.File(dir, "documents.parquet")
    // v10: synth version participates in the stamp — a synth-logic change
    // (jpeg/png formats in v2, video scene cuts in v4, image textures +
    // planted near-dups in v5, adpcm/mjpeg rotation in v6, three-partial
    // tones + planted audio dups in v7, id-derived partial phases in v8,
    // drifting-texture video frames + planted transcode dups in v9,
    // flash post-cut scene in v10)
    // must invalidate older caches
    val stamp = new java.io.File(dir).getCanonicalPath +
      "|" + src.lastModified + "|" + src.length + "|v10"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(stamp.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft-media-$key")
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      val tmp = new java.io.File(out.getParentFile,
        out.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      mediaTable(spark, dir).write.mode("overwrite").parquet(tmp.getPath)
      // shared state is only ever MUTATED by the atomic rename-into-place;
      // nothing here deletes `out` (a check-then-delete could tear down a
      // concurrent winner's completed output between its rename and read)
      if (!tmp.renameTo(out)) {
        if (new java.io.File(out, "_SUCCESS").exists()) {
          rm(tmp) // a concurrent JVM won the race: adopt its output
        } else {
          // stale debris occupies the target and cannot be cleared safely:
          // serve this JVM's own complete copy (tmpdir-resident, bounded
          // to the pathological case) rather than touch shared state
          return spreadMedia(spark, tmp, spread)
        }
      }
    }
    spreadMedia(spark, out, spread)
  }

  /** Scale-adaptive spread of the media scan (guide §2.5 input skew, same
    * rule as [[graft.sources.Tables]]): payloads are tiny relative to
    * their decode cost, and `openCostInBytes` packing would otherwise
    * collapse the cache's small files into one or two scan tasks — every
    * decode-heavy m-query then runs its codec loop on a single core. The
    * one round-robin exchange moves the payload bytes once (§8: decide on
    * cheap rows, move heavy bytes once — here the heavy COMPUTE rides the
    * spread); a no-op whenever the layout already yields >= core-count
    * scan partitions. */
  private def spreadMedia(spark: SparkSession, path: java.io.File,
                          spread: Boolean): DataFrame = {
    val df = spark.read.parquet(path.getPath)
    if (!spread) return df
    val bytes =
      Option(path.listFiles()).map(_.map(_.length()).sum).getOrElse(0L)
    graft.sources.Tables.spreadNarrow(spark, bytes, df)
  }

  /** Decode + featurize one record (real decode; deterministic int math,
    * one sqrt). Padded/truncated to `dim`. */
  private[multimodal] def decodeFeatures(m: MediaRecord, dim: Int): Array[Float] = {
    def lum(rgb: Array[Byte], i: Int): Int = {
      val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff; val b = rgb(i + 2) & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }
    val fs: Array[Float] = m.kind match {
      case "image" =>
        val f = Codec.decodeImage(m.format, m.payload)
        val n = f.width * f.height
        var (sr, sg, sb, sl) = (0L, 0L, 0L, 0L)
        var (mn, mx) = (255, 0)
        val hist = new Array[Int](8)
        var i = 0
        while (i < n * 3) {
          sr += f.rgb(i) & 0xff; sg += f.rgb(i + 1) & 0xff; sb += f.rgb(i + 2) & 0xff
          val l = lum(f.rgb, i)
          sl += l; if (l < mn) mn = l; if (l > mx) mx = l
          hist(l / 32) += 1
          i += 3
        }
        Array[Float](f.width.toFloat, f.height.toFloat,
          sr.toFloat / n, sg.toFloat / n, sb.toFloat / n,
          sl.toFloat / n, mn.toFloat, mx.toFloat) ++ hist.map(_.toFloat / n)
      case "audio" =>
        val a = Codec.decodeWav(m.payload)
        val n = a.samples.length
        var sq = 0L; var peak = 0; var zc = 0; var sa = 0L
        var i = 0
        while (i < n) {
          val s = a.samples(i).toInt
          sq += s.toLong * s; sa += math.abs(s)
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) zc += 1
          i += 1
        }
        Array[Float](a.sampleRate.toFloat, n.toFloat,
          math.sqrt(sq.toDouble / n).toFloat,
          peak.toFloat, zc.toFloat / n, sa.toFloat / n)
      case _ =>
        val frames = Codec.decodeVideo(m.format, m.payload)
        val perFrame = frames.map { f =>
          var sl = 0L; var i = 0
          val n = f.width * f.height
          while (i < n * 3) { sl += lum(f.rgb, i); i += 3 }
          sl.toFloat / n
        }
        Array[Float](frames.length.toFloat, frames.head.width.toFloat,
          frames.head.height.toFloat) ++ perFrame
    }
    java.util.Arrays.copyOf(fs, dim)
  }

  /** Feature extraction over batches: decodes the payload for real and
    * emits per-kind signal statistics (pixel means/histogram, RMS/peak/
    * zero-crossings, per-frame luminance). The per-batch grouping is where
    * a heavier codec/model would be initialized once and reused. */
  def extractFeatures(media: Dataset[MediaRecord],
                      dim: Int = FeatureDim,
                      batchSize: Int = BatchSize): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-scoped init would go here (codec/model handle)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            decodeFeatures(m, dim))
        }
      }
    }
  }

  /** Frame sampling on the decoded representation: video yields its real
    * frames (each re-encoded standalone PPM, up to n), an image is its own
    * single frame, audio splits into n standalone WAV chunks. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int = VideoFrames): Dataset[MediaFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val frames: Array[Array[Byte]] = m.kind match {
          case "image" => Array(m.payload)
          case "video" if m.format == "mjpeg" =>
            // container-level extraction: each '00dc' chunk already IS a
            // standalone JPEG — no pixel codec runs at all
            Codec.aviJpegChunks(m.payload).take(n).toArray
          case "video" =>
            Codec.decodePpmSeq(m.payload).take(n)
              .map(f => Codec.encodePpm(f.width, f.height, f.rgb)).toArray
          case _ =>
            val a = Codec.decodeWav(m.payload)
            val per = math.max(1, (a.samples.length + n - 1) / n)
            a.samples.grouped(per).take(n)
              .map(chunk => Codec.encodeWav(chunk, a.sampleRate)).toArray
        }
        MediaFrames(m.media_id, m.kind, frames.length, frames)
      }
    }
  }

  /** Real resize: nearest-neighbor resample of the decoded pixels,
    * re-encoded (every video frame individually); audio passes through.
    * Narrow map work — bytes never shuffle. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        m.kind match {
          case "image" =>
            val f = Codec.decodeImage(m.format, m.payload)
            m.copy(payload = Codec.encodeImage(m.format, w, h,
              Codec.resizeNearest(f.width, f.height, f.rgb, w, h)),
              width = w, height = h)
          case "video" =>
            val frames = Codec.decodeVideo(m.format, m.payload)
            m.copy(payload = Codec.encodeVideo(m.format, w, h,
              frames.map(f => Codec.resizeNearest(f.width, f.height, f.rgb, w, h))),
              width = w, height = h)
          case _ => m
        }
      }
    }
  }

  /** Max Hamming distance (of 64 dHash bits) for an m7 near-dup pair.
    * At 6, detection sits fully inside the 8-band pigeonhole guarantee
    * (≤ 7 dirty bits always leave a clean band), so recall is structural;
    * the fixture's planted dups land at ≤ 6 (mostly 0–2, jpeg legs up to
    * 6) while unrelated texture near-collisions start at 7. */
  val PHashMaxDist = 6

  /** Difference hash (dHash): area-resample the decoded image to a 9×8
    * luminance grid (MEAN over each cell region, not a point sample —
    * codec noise averages out over the ~tens of pixels per cell, where a
    * point sample inherits it 1:1) and emit one bit per horizontal
    * gradient sign — 64 bits, invariant to resolution and global
    * brightness shifts. Shared by the m7 query and the spec's driver
    * recompute. */
  private[multimodal] def dHash(width: Int, height: Int,
                                rgb: Array[Byte]): Long = {
    val cell = new Array[Long](9 * 8)
    val cnt = new Array[Long](9 * 8)
    var y = 0
    while (y < height) {
      val gy = math.min(7, y * 8 / height)
      var x = 0
      while (x < width) {
        val gx = math.min(8, x * 9 / width)
        val i = (y * width + x) * 3
        cell(gy * 9 + gx) += ((rgb(i) & 0xff) * 299 +
          (rgb(i + 1) & 0xff) * 587 + (rgb(i + 2) & 0xff) * 114) / 1000
        cnt(gy * 9 + gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // compare mean luminances as exact cross-multiplied integers
        val l = cell(gy * 9 + gx) * cnt(gy * 9 + gx + 1)
        val r = cell(gy * 9 + gx + 1) * cnt(gy * 9 + gx)
        if (r > l) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Mean-|Δluminance| cut threshold (of 255) for m6: with the v9
    * drifting-texture synth, within-scene diffs top out at ~14 (phase
    * drift of 7 per triangle wave) and texture→flash cross-cut diffs sit
    * around ~120 — the threshold rests mid-corridor; real footage would
    * tune this. */
  val SceneCutLum = 76

  /** m8 fingerprint frame size (samples), per-frame peak count, and the
    * minimum normalized cross-correlation for a confirmed pair. */
  val FpFrame = 256
  val FpPeaks = 3
  val FpMinCorr = 0.9

  /** Constellation fingerprint (Wang, ISMIR 2003 — the Shazam landmark
    * scheme, reduced to stationary clips): tile the clip into
    * [[FpFrame]]-sample frames, FFT each (Dsp.scala), keep the
    * [[FpPeaks]] strongest positive-frequency bins, and pack the sorted
    * bin tuple into one long — the clip's distinct frame hashes. A full
    * landmark scheme pairs peaks across anchor windows for time-shift
    * robustness; the per-frame peak SET is the degenerate form for
    * whole-clip dedup. Shared by the m8 query and the spec's driver
    * recompute. */
  private[multimodal] def audioFingerprint(samples: Array[Short]): Array[Long] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var off = 0
    while (off + FpFrame <= samples.length) {
      val re = new Array[Double](FpFrame)
      val im = new Array[Double](FpFrame)
      var i = 0
      while (i < FpFrame) { re(i) = samples(off + i).toDouble; i += 1 }
      Dsp.fft(re, im)
      // top-FpPeaks bins by magnitude over 1..half−1 (skip DC)
      val mag = Array.tabulate(FpFrame / 2)(k =>
        if (k == 0) -1.0 else re(k) * re(k) + im(k) * im(k))
      val top = mag.zipWithIndex.sortBy { case (m, k) => (-m, k) }
        .take(FpPeaks).map(_._2).sorted
      out += top.foldLeft(0L)((acc, b) => acc * FpFrame + b)
      off += FpFrame
    }
    out.toArray
  }

  /** Gain-invariant m8 verification: normalized cross-correlation at lag
    * 0 over the overlapping prefix — 1.0 for a pure gain change, ≈ 0 for
    * unrelated tone triples, and codec loss only dents it by the noise
    * ratio. */
  private[multimodal] def xcorr(a: Array[Short], b: Array[Short]): Double = {
    val n = math.min(a.length, b.length)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    if (saa == 0 || sbb == 0) 0.0 else sab / math.sqrt(saa * sbb)
  }

  /** The band-PAIR decomposition of a 64-bit perceptual hash as an
    * exploded struct(band, bucket) column — the ONE banding rule m7 and
    * m9 share (a change must hit both or their guarantees silently
    * diverge). Keys are the C(8,2)=28 ordered pairs of 8-bit bands with
    * a 16-bit concatenated bucket. Pigeonhole: Hamming ≤ [[PHashMaxDist]]
    * = 6 dirty bits dirty at most 6 of the 8 bands, leaving ≥ 2 clean
    * bands — so some band-PAIR is clean and the true pair collides;
    * the guarantee is exactly the single-band one at the SAME distance
    * bound (6 = 8−2). What changes is saturation: single 8-bit bands
    * have 256 buckets, so occupancy — and the quadratic collision term
    * Σ occ² — grows as N/256 (measured: m9's isolated sf1 ratio crept
    * to ~3.3 as texture buckets reached ~260 videos each); 16-bit
    * buckets defer that to N/65536, 256× further out, for 3.5× more
    * exploded key rows — linear cost buying off a quadratic one. */
  private def bandBuckets(hash: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    explode(array((for {
      b1 <- 0 until 8
      b2 <- b1 + 1 until 8
    } yield struct(lit(b1 * 8 + b2).as("band"),
      (shiftright(hash, b1 * 8).bitwiseAND(lit(0xffL)) * 256 +
        shiftright(hash, b2 * 8).bitwiseAND(lit(0xffL))).as("bucket"))): _*))

  /** The persisted perceptual-hash tables — hash-once/dedup-many is the
    * production shape at 100 TB (perceptual hashes are computed at ingest
    * and every dedup pass consumes the hash INDEX, never re-decoding the
    * corpus), and the d15 posting-index precedent makes the artifact part
    * of the oracle contract: DuckDB replays banding, the candidate join,
    * and the Hamming verification from the SAME persisted parquet the
    * engine applies, so everything downstream of the decode is
    * hash-exact-checked; only the codec (not SQL territory) is taken as
    * given, and THAT has planted-ground-truth + driver-recompute specs
    * in MultimodalSpec. */
  private[multimodal] def m7SigTable(s: SparkSession, d: String): DataFrame =
    graft.sources.ModelStore.table(s, d, "documents.parquet", "m7-dhash") {
      import s.implicits._
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "image")
        .mapPartitions(_.map { m =>
          val f = Codec.decodeImage(m.format, m.payload)
          (m.media_id, dHash(f.width, f.height, f.rgb))
        })
        .toDF("media_id", "sig")
    }

  private[multimodal] def m9SigTable(s: SparkSession, d: String): DataFrame =
    graft.sources.ModelStore.table(s, d, "documents.parquet", "m9-dhash") {
      import s.implicits._
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "video")
        .mapPartitions(_.map { m =>
          val fs = Codec.decodeVideo(m.format, m.payload)
          (m.media_id, fs.map(f => dHash(f.width, f.height, f.rgb)).toArray)
        })
        .toDF("media_id", "sig")
    }

  /** m8's persisted artifacts: the constellation-fingerprint INDEX (the
    * hash-once shape, like m7/m9) and the decoded-waveform cache the
    * verification stage reuses (decode-once: audio PCM is the same order
    * of bytes as the encoded payload — unlike video frames — so caching
    * the decode is a sane ingest artifact, and the oracle can replay the
    * cross-correlation from the exact samples the engine correlates). */
  private[multimodal] def m8FpTable(s: SparkSession, d: String): DataFrame =
    graft.sources.ModelStore.table(s, d, "documents.parquet", "m8-fingerprints") {
      import s.implicits._
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "audio")
        .mapPartitions(_.flatMap { m =>
          audioFingerprint(Codec.decodeWav(m.payload).samples)
            .map(h => (m.media_id, h))
        })
        .toDF("media_id", "h")
    }

  private[multimodal] def m8SamplesTable(s: SparkSession, d: String): DataFrame =
    graft.sources.ModelStore.table(s, d, "documents.parquet", "m8-samples") {
      import s.implicits._
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "audio")
        .mapPartitions(_.map(m => (m.media_id, Codec.decodeWav(m.payload).samples)))
        .toDF("media_id", "samples")
    }

  /** Driver queries. m7/m8/m9 are oracle-exact downstream of the
    * persisted hash/waveform tables; the remaining decode rows stay
    * rows-only (binary payloads are not SQL-oracle territory;
    * MultimodalSpec covers decode fidelity + shape). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m9_video_phash" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // perceptual video dedup: per-frame dHash over the REAL decoded
      // frames → clip signature of VideoFrames longs (narrow map work,
      // persisted once — see m9SigTable), candidates from m7's band
      // shape applied per (frame_idx, band) — a transcoded dup collides
      // on nearly every band, unrelated textures differ — verified by
      // TOTAL signature Hamming ≤ VideoFrames·PHashMaxDist.
      //
      // The frame-band join term, split (r8's one scale watch item: sf1
      // last-step ratio 3.17 vs 3.33 data growth — linear with no
      // headroom): the candidate join now carries ONLY (media_id, fidx,
      // band, bucket) — 20 bytes/row — where it previously dragged the
      // whole VideoFrames-long signature array on every exploded row
      // (frames × 28 copies per video through the exchange) and
      // recomputed the full-signature Hamming per COLLISION ROW before
      // the distinct (a transcoded dup collides on ~every (frame, band),
      // so each true pair paid the aggregate hundreds of times).
      // Signatures re-attach AFTER the pair-level distinct via two
      // id-equi-joins against the one-row-per-video sig table (the m8
      // cands→waveform shape), so the Hamming verification runs exactly
      // once per candidate pair. Pixels still never leave the decode
      // stage.
      val sigs = m9SigTable(s, d)
      val banded = sigs.select($"media_id",
          posexplode($"sig").as(Seq("fidx", "fh")))
        // degenerate frames (constant luminance → dHash exactly 0: fades,
        // black/white flashes, test cards) carry no discriminative signal
        // and CONCENTRATE: every such frame in the corpus lands in one
        // bucket, turning the band join quadratic (the d3 stop-shingle
        // problem in hash space — half this fixture's videos share the
        // flash scene). They are dropped as CANDIDATE KEYS only; the full
        // signature still verifies, so degenerate frames count toward
        // the Hamming budget. Recall consequence: the m7 pigeonhole now
        // applies per NON-degenerate frame — a pair is guaranteed found
        // iff some non-degenerate frame has ≤ 6 dirty bits (true for
        // transcode dups, whose per-frame JPEG damage is ≤ ~6 — the m7
        // bound); a pair whose entire Hamming budget concentrates on its
        // texture frames while only degenerate frames match exactly is
        // NOT guaranteed — the price of the stop-key rule
        .filter($"fh" =!= 0L)
        .select($"media_id", $"fidx", bandBuckets($"fh").as("bb"))
        .select($"media_id", $"fidx", $"bb.band", $"bb.bucket")
      val pairs = banded.as("a").join(banded.as("b"),
          $"a.fidx" === $"b.fidx" && $"a.band" === $"b.band" &&
            $"a.bucket" === $"b.bucket" && $"a.media_id" < $"b.media_id")
        .select($"a.media_id".as("id1"), $"b.media_id".as("id2"))
        .distinct()
      pairs
        .join(sigs.select($"media_id".as("id1"), $"sig".as("sig1")), "id1")
        .join(sigs.select($"media_id".as("id2"), $"sig".as("sig2")), "id2")
        .select($"id1", $"id2",
          aggregate(zip_with($"sig1", $"sig2",
              (x, y) => bit_count(x.bitwiseXOR(y))),
            lit(0), (acc, x) => acc + x).as("hamming"))
        .filter($"hamming" <= VideoFrames * PHashMaxDist)
        .orderBy($"id1", $"id2")
    }),
    "m8_audio_fingerprint" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // audio dedup by spectral-peak constellation: decode → per-frame
      // top-3 peak-bin hash (narrow map work; the d-family shape with an
      // FFT as the hash function — persisted once, see m8FpTable), clips
      // sharing any frame hash become candidates via an equi-join on the
      // 8-byte hash — payloads never ride the join — then gain-invariant
      // normalized cross-correlation over the two decoded waveforms
      // confirms (the planted 0.9×-gain wav↔adpcm dups score ≥ ~0.99;
      // unrelated clips decorrelate even on a full frequency-triple hash
      // collision, because every partial carries an id-derived phase —
      // see the synth comment). Only (id, hash) shuffles for candidate
      // generation; waveforms (the persisted decode cache, m8SamplesTable)
      // re-attach by bounded shuffled-hash joins for exactly the
      // candidate pairs.
      val hashes = m8FpTable(s, d)
      val cands = hashes.as("a").join(hashes.as("b"),
          $"a.h" === $"b.h" && $"a.media_id" < $"b.media_id")
        .groupBy($"a.media_id".as("id1"), $"b.media_id".as("id2"))
        .agg(count(lit(1)).as("n_shared"))
      val waves = m8SamplesTable(s, d)
      cands.hint("shuffle_hash")
        .join(waves.select($"media_id".as("id1"), $"samples".as("p1")),
          "id1")
        .hint("shuffle_hash")
        .join(waves.select($"media_id".as("id2"), $"samples".as("p2")),
          "id2")
        .select($"id1", $"id2", $"n_shared", $"p1", $"p2")
        .as[(Long, Long, Long, Array[Short], Array[Short])]
        .mapPartitions(_.map { case (id1, id2, ns, p1, p2) =>
          (id1, id2, ns, math.round(xcorr(p1, p2) * 10000) / 10000.0)
        })
        .toDF("id1", "id2", "n_shared", "corr")
        .filter($"corr" >= FpMinCorr)
        .orderBy($"id1", $"id2")
    }),
    "m7_image_phash" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // perceptual-hash image dedup: decode → 64-bit dHash (narrow map
      // work, payload read only for image rows, persisted once — see
      // m7SigTable), then candidates from band-PAIR bucket collisions
      // (see bandBuckets: Hamming ≤ 6 leaves ≥ 2 of 8 bands clean, so a
      // clean 16-bit band-pair exists — the same guarantee as single
      // bands at this distance, saturating 256× later), verified by
      // exact Hamming ≤ PHashMaxDist. The pixels never shuffle: only
      // (id, 8-byte hash) leaves the decode.
      val sigs = m7SigTable(s, d)
      val banded = sigs.select($"media_id", $"sig",
          bandBuckets($"sig").as("bb"))
        .select($"media_id", $"sig", $"bb.band", $"bb.bucket")
      banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
            $"a.media_id" < $"b.media_id")
        .select($"a.media_id".as("id1"), $"b.media_id".as("id2"),
          bit_count($"a.sig".bitwiseXOR($"b.sig")).as("hamming"))
        .distinct()
        .filter($"hamming" <= PHashMaxDist)
        .orderBy($"id1", $"id2")
    }),
    "m6_scene_detect" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // scene-change detection on the decoded frames: per adjacent frame
      // pair, the mean absolute luminance difference; a boundary is a pair
      // whose diff clears SceneCutLum. The comparison is exact integer
      // math (sum_|Δ| > threshold × n_px — no float threshold wobble);
      // narrow mapPartitions, payload read only for video rows.
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "video")
        .mapPartitions(_.map { m =>
          val frames = Codec.decodeVideo(m.format, m.payload).toArray
          def lum(rgb: Array[Byte], i: Int): Int = {
            val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff
            val b = rgb(i + 2) & 0xff
            (r * 299 + g * 587 + b * 114) / 1000
          }
          var nCuts = 0; var cutAt = -1; var maxNum = 0L; var maxDen = 1L
          var f = 1
          while (f < frames.length) {
            val (a, b) = (frames(f - 1), frames(f))
            val npx = a.width * a.height
            var sum = 0L; var i = 0
            while (i < npx * 3) {
              sum += math.abs(lum(a.rgb, i) - lum(b.rgb, i)); i += 3
            }
            if (sum * maxDen > maxNum * npx) { maxNum = sum; maxDen = npx }
            if (sum > SceneCutLum.toLong * npx) {
              nCuts += 1; if (cutAt < 0) cutAt = f
            }
            f += 1
          }
          (m.media_id, frames.length, nCuts, cutAt,
            math.round(maxNum.toDouble / maxDen * 100) / 100.0)
        })
        .toDF("media_id", "n_frames", "n_cuts", "cut_at", "max_diff")
        .orderBy($"media_id")
    }),
    "m5_audio_spectrum" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // real frequency-domain analysis: decode the WAV, FFT the samples
      // (pure-JVM radix-2, Dsp.scala), summarize the spectrum — narrow
      // mapPartitions work, payload bytes never shuffle; the payload
      // column is read only for audio rows (kind pushdown at the scan)
      mediaParquet(s, d).as[MediaRecord]
        .filter($"kind" === "audio")
        .mapPartitions(_.map { m =>
          val a = Codec.decodeWav(m.payload)
          val sp = Dsp.spectrum(a.samples, a.sampleRate)
          (m.media_id, a.samples.length, sp.nFft,
            math.round(sp.centroidHz * 100) / 100.0,
            sp.rolloffHz, sp.peakHz,
            math.round(sp.rms * 100) / 100.0)
        })
        .toDF("media_id", "n_samples", "n_fft", "centroid_hz",
          "rolloff_hz", "peak_hz", "rms")
        .orderBy($"media_id")
    }),
    "m1_media_features" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      extractFeatures(mediaParquet(s, d).as[MediaRecord])
        .select($"media_id", $"kind", $"n_bytes",
          size($"features").as("feature_dim"),
          round(element_at($"features", 3), 4).as("f2"))
        .orderBy($"media_id")
    }),
    "m2_frame_sample" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // frame sampling + decoded-geometry evidence: every sampled frame
      // must DECODE (each is a standalone PPM/JPEG/PNG or WAV chunk —
      // sniffed from its own magic bytes), and the decoded units (pixels
      // for visual frames, samples for audio chunks) plus the chunk
      // arithmetic are pure functions of the synth metadata — the m3
      // pattern — so the row is ORACLE-EXACT while the sampling and the
      // round-trip decode still run distributed. Encoded frame BYTES
      // (JPEG/PNG entropy coding, not SQL-derivable — what kept this row
      // rows-only through r5) stay spec-checked against planted ground
      // truth in MultimodalSpec.
      sampleFrames(mediaParquet(s, d).as[MediaRecord])
        .map { fr =>
          val units: Long = fr.kind match {
            case "audio" => fr.frames.iterator
              .map(b => Codec.decodeWav(b).samples.length.toLong).sum
            case _ => fr.frames.iterator.map { b =>
              val f = if (b.length >= 2 && b(0) == 'P'.toByte &&
                  b(1) == '6'.toByte) Codec.decodePpm(b)
                else Codec.decodeImageIo(b)
              f.width.toLong * f.height
            }.sum
          }
          (fr.media_id, fr.kind, fr.n_frames, units)
        }
        .toDF("media_id", "kind", "n_frames", "decoded_units")
        .orderBy($"media_id")
    }),
    "m3_media_catalog" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // metadata-only scan: never touches payload (column pruning at the
      // parquet reader — payload bytes stay on disk)
      mediaParquet(s, d)
        .groupBy($"kind", $"format")
        .agg(count(lit(1)).as("n"),
          sum($"duration_ms").as("total_ms"),
          max($"width").as("max_w"))
        .orderBy($"kind", $"format")
    }),
    "m4_resize_decode" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // distributed resize, then decode the resized payloads back IN
      // FULL to prove they are valid media: dims and frame count are
      // read from the re-encoded bytes, never the metadata — and both
      // are pure functions of the synth rules (the resize target and
      // the container's frame count), so the row is ORACLE-EXACT (the
      // r5 row carried the re-encoded byte length, whose JPEG/PNG
      // entropy coding is not SQL-derivable; payload validity is now
      // proven more strongly — every frame decodes, not just the first)
      val resized = resize(mediaParquet(s, d, spread = true).as[MediaRecord]
        .filter(col("kind").isin("image", "video")), 32, 18)
      resized.map { m =>
        val (w, h, nf) =
          if (m.kind == "image") {
            val f = Codec.decodeImage(m.format, m.payload)
            (f.width, f.height, 1)
          } else {
            val fs = Codec.decodeVideo(m.format, m.payload)
            (fs.head.width, fs.head.height, fs.length)
          }
        (m.media_id, m.kind, m.format, w, h, nf)
      }.toDF("media_id", "kind", "format", "decoded_w", "decoded_h",
          "n_frames")
        .orderBy($"media_id")
    }),
  )

  /** DuckDB-readable glob for a persisted media-derived model table
    * (Similarity.modelGlob / Pipeline.docModelGlob convention). */
  private def mediaModelGlob(name: String): String = {
    val dir = sys.props.getOrElse("graft.oracle.sfdir", "/root/testdata/sf0.01")
    graft.sources.ModelStore.path(dir, "documents.parquet", name).getPath +
      "/*.parquet"
  }

  /** The C(8,2)=28 band-pair CTE shared by the m7/m9 oracles — the SQL
    * twin of [[bandBuckets]]: band id b1*8+b2, 16-bit bucket from the two
    * 8-bit bands. DuckDB's `>>` is the same arithmetic shift and
    * bit_count/xor the same two's-complement ops as the JVM's (checked
    * on negative hashes). */
  private val bandPairCte =
    """bp AS (SELECT b1, b2 FROM (SELECT unnest(range(8)) AS b1)
      |       CROSS JOIN (SELECT unnest(range(8)) AS b2) WHERE b1 < b2)"""
      .stripMargin

  /** Oracles for the metadata-derivable m-queries, plus the perceptual-
    * hash dedups. m3 never decodes; m2/m4 DO decode distributed (every
    * sampled frame / resized payload must round-trip through a real
    * codec) but emit decoded GEOMETRY — frame counts, pixel/sample
    * totals, resize-target dims — and every one of those is a pure
    * function of `doc_id` (the synth rules in `synthesize`), so DuckDB
    * re-derives them from `documents` alone and the driver checks the
    * rows exactly. m7/m9 (r8): DuckDB consumes the PERSISTED dHash
    * tables ([[m7SigTable]]/[[m9SigTable]] — the artifact is part of the
    * contract, the d15/v4 precedent) and replays band-pair candidate
    * generation and exact-Hamming verification from scratch, so the
    * whole dedup downstream of the codec is hash-exact-checked. The
    * remaining decode queries (m1/m5/m6/m8) stay rows-only: their values
    * depend on encoded payload BYTES (JPEG entropy coding, ADPCM state
    * machines, FFT bins) that SQL cannot reproduce; their fidelity specs
    * compare against driver-side recomputes instead. */
  def oracleSql: Map[String, String] = Map(
    "m7_image_phash" ->
      s"""WITH s AS (SELECT media_id, sig FROM '${mediaModelGlob("m7-dhash")}'),
         |$bandPairCte,
         |banded AS (SELECT media_id, sig, b1 * 8 + b2 AS band,
         |             ((sig >> (b1 * 8)) & 255) * 256
         |               + ((sig >> (b2 * 8)) & 255) AS bucket
         |           FROM s CROSS JOIN bp),
         |cand AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
         |           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |         FROM banded a JOIN banded b
         |           ON a.band = b.band AND a.bucket = b.bucket
         |          AND a.media_id < b.media_id)
         |SELECT id1, id2, hamming FROM cand
         |WHERE hamming <= $PHashMaxDist ORDER BY id1, id2""".stripMargin,
    "m8_audio_fingerprint" ->
      // Candidates replayed from the persisted fingerprint index; the
      // cross-correlation replayed from the persisted waveform cache with
      // the engine's exact accumulation shape: three separate sequential
      // left-folds seeded at 0.0 (list_reduce over a 0.0-prepended list —
      // 0.0 + x1 is bit-identical to x1), one sqrt, one division, then
      // the floor(x·10⁴ + 0.5) rounding (Java Math.round). Verified
      // bit-exact at sf0.01/sf0.001.
      s"""WITH fp AS (SELECT media_id, h
         |            FROM '${mediaModelGlob("m8-fingerprints")}'),
         |w AS (SELECT media_id, samples FROM '${mediaModelGlob("m8-samples")}'),
         |cand AS (SELECT a.media_id AS id1, b.media_id AS id2,
         |           CAST(count(*) AS BIGINT) AS n_shared
         |         FROM fp a JOIN fp b
         |           ON a.h = b.h AND a.media_id < b.media_id
         |         GROUP BY 1, 2),
         |z AS (SELECT c.id1, c.id2, c.n_shared,
         |        list_zip(
         |          list_slice(wa.samples, 1,
         |            least(len(wa.samples), len(wb.samples))),
         |          list_slice(wb.samples, 1,
         |            least(len(wa.samples), len(wb.samples)))) AS zz
         |      FROM cand c JOIN w wa ON wa.media_id = c.id1
         |                  JOIN w wb ON wb.media_id = c.id2),
         |m AS (SELECT id1, id2, n_shared,
         |        list_reduce(list_prepend(0.0, list_transform(zz,
         |          t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))),
         |          (x, y) -> x + y) AS sab,
         |        list_reduce(list_prepend(0.0, list_transform(zz,
         |          t -> CAST(t[1] AS DOUBLE) * CAST(t[1] AS DOUBLE))),
         |          (x, y) -> x + y) AS saa,
         |        list_reduce(list_prepend(0.0, list_transform(zz,
         |          t -> CAST(t[2] AS DOUBLE) * CAST(t[2] AS DOUBLE))),
         |          (x, y) -> x + y) AS sbb
         |      FROM z),
         |r AS (SELECT id1, id2, n_shared,
         |        CAST(floor((CASE WHEN saa = 0 OR sbb = 0 THEN 0.0
         |          ELSE sab / sqrt(saa * sbb) END) * 10000 + 0.5) AS BIGINT)
         |          / 10000.0 AS corr
         |      FROM m)
         |SELECT id1, id2, n_shared, corr FROM r
         |WHERE corr >= $FpMinCorr ORDER BY id1, id2""".stripMargin,
    "m9_video_phash" ->
      s"""WITH s AS (SELECT media_id, sig FROM '${mediaModelGlob("m9-dhash")}'),
         |fr0 AS (SELECT media_id, sig,
         |          unnest(generate_series(1, len(sig))) AS i FROM s),
         |fr AS (SELECT media_id, i - 1 AS fidx, sig[i] AS fh FROM fr0),
         |$bandPairCte,
         |banded AS (SELECT media_id, fidx, fh, b1 * 8 + b2 AS band,
         |             ((fh >> (b1 * 8)) & 255) * 256
         |               + ((fh >> (b2 * 8)) & 255) AS bucket
         |           FROM fr CROSS JOIN bp WHERE fh != 0),
         |cand AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2
         |         FROM banded a JOIN banded b
         |           ON a.fidx = b.fidx AND a.band = b.band
         |          AND a.bucket = b.bucket AND a.media_id < b.media_id),
         |ham AS (SELECT c.id1, c.id2,
         |          CAST(sum(bit_count(xor(fa.fh, fb.fh))) AS INT) AS hamming
         |        FROM cand c
         |        JOIN fr fa ON fa.media_id = c.id1
         |        JOIN fr fb ON fb.media_id = c.id2 AND fb.fidx = fa.fidx
         |        GROUP BY c.id1, c.id2)
         |SELECT id1, id2, hamming FROM ham
         |WHERE hamming <= ${VideoFrames * PHashMaxDist}
         |ORDER BY id1, id2""".stripMargin,
    "m2_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |         CASE WHEN (doc_id // 3) % 5 = 2 AND doc_id >= 3
        |              THEN doc_id - 3 ELSE doc_id END AS src
        |  FROM documents
        |), a AS (
        |  SELECT id, src, 400 + (src % 100) * 8 AS asamp,
        |         (400 + (src % 100) * 8 + 3) // 4 AS aper
        |  FROM m
        |)
        |SELECT id AS media_id,
        |  CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(CASE id % 3 WHEN 0 THEN 1
        |       WHEN 1 THEN (asamp + aper - 1) // aper
        |       ELSE 4 END AS INT) AS n_frames,
        |  CAST(CASE id % 3
        |       WHEN 0 THEN (16 + (src % 8) * 4) * (9 + (src % 8) * 2)
        |       WHEN 1 THEN asamp
        |       ELSE 4 * (16 + (src % 4) * 4) * (8 + (src % 4) * 2)
        |       END AS BIGINT) AS decoded_units
        |FROM a ORDER BY media_id""".stripMargin,
    "m4_resize_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |         CASE WHEN (doc_id // 3) % 5 = 2 AND doc_id >= 3
        |              THEN doc_id - 3 ELSE doc_id END AS src,
        |         ((doc_id // 3) % 5 = 2 AND doc_id >= 3) AS is_dup
        |  FROM documents WHERE doc_id % 3 != 1
        |)
        |SELECT id AS media_id,
        |  CASE id % 3 WHEN 0 THEN 'image' ELSE 'video' END AS kind,
        |  CASE WHEN id % 3 = 0 THEN CASE (id // 3) % 3 WHEN 0 THEN 'ppm'
        |            WHEN 1 THEN 'jpeg' ELSE 'png' END
        |       ELSE CASE WHEN ((src // 3) // 2) % 2 = 0
        |            THEN (CASE WHEN is_dup THEN 'mjpeg' ELSE 'ppms' END)
        |            ELSE (CASE WHEN is_dup THEN 'ppms' ELSE 'mjpeg' END) END
        |  END AS format,
        |  CAST(32 AS INT) AS decoded_w, CAST(18 AS INT) AS decoded_h,
        |  CAST(CASE id % 3 WHEN 0 THEN 1 ELSE 4 END AS INT) AS n_frames
        |FROM m ORDER BY media_id""".stripMargin,
    "m3_media_catalog" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |         CASE WHEN (doc_id // 3) % 5 = 2 AND doc_id >= 3
        |              THEN doc_id - 3 ELSE doc_id END AS src,
        |         ((doc_id // 3) % 5 = 2 AND doc_id >= 3) AS is_dup
        |  FROM documents
        |), meta AS (
        |  SELECT
        |    CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    CASE
        |      WHEN id % 3 = 0 THEN CASE (id // 3) % 3 WHEN 0 THEN 'ppm'
        |           WHEN 1 THEN 'jpeg' ELSE 'png' END
        |      WHEN id % 3 = 1 THEN CASE WHEN (id // 3) % 2 = 0
        |           THEN 'wav' ELSE 'adpcm' END
        |      ELSE CASE WHEN ((src // 3) // 2) % 2 = 0
        |           THEN (CASE WHEN is_dup THEN 'mjpeg' ELSE 'ppms' END)
        |           ELSE (CASE WHEN is_dup THEN 'ppms' ELSE 'mjpeg' END) END
        |    END AS format,
        |    CASE id % 3 WHEN 0 THEN 16 + (src % 8) * 4 WHEN 1 THEN 0
        |         ELSE 16 + (src % 4) * 4 END AS width,
        |    CASE id % 3 WHEN 0 THEN 0 WHEN 1 THEN 50 + (src % 100)
        |         ELSE 160 END AS duration_ms
        |  FROM m
        |)
        |SELECT kind, format, count(*) AS n,
        |       CAST(sum(duration_ms) AS BIGINT) AS total_ms,
        |       CAST(max(width) AS INT) AS max_w
        |FROM meta GROUP BY kind, format ORDER BY kind, format""".stripMargin,
  )
}
