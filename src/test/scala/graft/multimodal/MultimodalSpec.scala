package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("ppm codec round-trips pixels exactly") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 31) % 256).toByte)
    val f = Codec.decodePpm(Codec.encodePpm(4, 3, rgb))
    assert(f.width == 4 && f.height == 3)
    assert(f.rgb.toSeq == rgb.toSeq)
  }

  test("wav codec round-trips samples exactly") {
    val samples = Array.tabulate(777)(i => ((i * 997) % 30000 - 15000).toShort)
    val a = Codec.decodeWav(Codec.encodeWav(samples, 8000))
    assert(a.sampleRate == 8000)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("concatenated ppm frames decode back individually") {
    val frames = (0 until 3).map { f =>
      Array.tabulate(2 * 2 * 3)(i => (i + f * 50).toByte)
    }
    val stream = frames.toArray.flatMap(p => Codec.encodePpm(2, 2, p))
    val decoded = Codec.decodePpmSeq(stream)
    assert(decoded.length == 3)
    decoded.zip(frames).foreach { case (d, exp) =>
      assert(d.rgb.toSeq == exp.toSeq)
    }
  }

  test("media table schema: opaque binary + typed metadata, real payloads") {
    val m = Multimodal.mediaTable(spark, dir)
    val f = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("kind") == "string" && f("width") == "int")
    val rows = m.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      r.kind match {
        case "image" =>
          val d = Codec.decodeImage(r.format, r.payload)
          assert(d.width == r.width && d.height == r.height,
            s"media ${r.media_id}: metadata dims must match decoded dims")
        case "audio" =>
          val a = Codec.decodeWav(r.payload)
          assert(a.samples.length * 1000L / a.sampleRate == r.duration_ms)
        case "video" =>
          assert(Codec.decodeVideo(r.format, r.payload).length ==
            Multimodal.VideoFrames)
      }
    }
    // every modality rotates through a raw AND a real compressed format
    val formats = m.collect().groupBy(_.kind)
      .map { case (k, rs) => k -> rs.map(_.format).toSet }
    assert(formats("image") == Set("ppm", "jpeg", "png"))
    assert(formats("audio") == Set("wav", "adpcm"))
    assert(formats("video") == Set("ppms", "mjpeg"))
  }

  test("adpcm codec: standard tag-0x11 WAVE, ~4:1 compression, SNR bound") {
    // a smooth-ish triangle wave — the signal class ADPCM is built for
    val samples = Array.tabulate(3000) { i =>
      val m = i % 400
      (((if (m < 200) m else 400 - m) - 100) * 250).toShort
    }
    val bytes = Codec.encodeAdpcmWav(samples, 8000)
    // container: RIFF/WAVE with fmt tag 0x11 (IMA ADPCM) — a standard
    // playable file, not a private framing
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val tag = ((bytes(21) & 0xff) << 8) | (bytes(20) & 0xff)
    assert(tag == 0x11, s"fmt tag $tag")
    // real compression: 4 bits/sample vs 16 (+ headers)
    assert(bytes.length < samples.length * 2 / 3,
      s"${bytes.length} bytes for ${samples.length * 2} bytes of PCM")
    val decoded = Codec.decodeWav(bytes)
    assert(decoded.sampleRate == 8000)
    // fact chunk truncates the block-padding tail to the true count
    assert(decoded.samples.length == samples.length)
    val sigPow = samples.map(s => s.toDouble * s).sum
    val errPow = samples.zip(decoded.samples)
      .map { case (a, b) => val d = (a - b).toDouble; d * d }.sum
    val snrDb = 10 * math.log10(sigPow / errPow)
    assert(snrDb >= 25.0, s"ADPCM round-trip SNR $snrDb dB")
  }

  test("mjpeg avi: real RIFF/AVI container, JPEG chunks, loss-bounded frames") {
    val (w, h) = (32, 16)
    val frames = (0 until 5).map { f =>
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        (60 + ((x * 3 + y * 5 + f * 20) % 120)).toByte
      }
    }
    val avi = Codec.encodeAviMjpeg(w, h, frames)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    // frame extraction is container-level: each chunk is a standalone JPEG
    val chunks = Codec.aviJpegChunks(avi)
    assert(chunks.length == 5)
    chunks.foreach { j =>
      assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8, "JPEG SOI")
    }
    val decoded = Codec.decodeAviMjpeg(avi)
    assert(decoded.length == 5)
    decoded.zip(frames).foreach { case (d, exp) =>
      assert(d.width == w && d.height == h)
      val mae = d.rgb.zip(exp).map { case (a, b) =>
        math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / exp.length
      assert(mae <= 8.0, s"mjpeg frame MAE $mae")
    }
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

  test("image features come from the decoded pixels") {
    val rec = Multimodal.synthesize(0) // id 0 -> image
    val fs = Multimodal.decodeFeatures(rec, Multimodal.FeatureDim)
    val d = Codec.decodePpm(rec.payload)
    val n = d.width * d.height
    val meanR = (0 until n).map(i => d.rgb(i * 3) & 0xff).sum.toFloat / n
    assert(fs(0) == d.width && fs(1) == d.height)
    assert(fs(2) == meanR, s"mean_r ${fs(2)} != $meanR")
    // 8-bin luminance histogram sums to 1
    assert(math.abs(fs.slice(8, 16).sum - 1.0f) < 1e-5)
  }

  test("audio features come from the decoded samples") {
    // id 1 -> wav leg, id 4 -> adpcm leg: features must equal a local
    // recompute over whatever the container decodes to (for adpcm, the
    // lossy reconstruction — that IS the decoded representation)
    Seq(1L, 4L).foreach { id =>
      val rec = Multimodal.synthesize(id)
      assert(rec.format == (if (id == 1L) "wav" else "adpcm"))
      val fs = Multimodal.decodeFeatures(rec, Multimodal.FeatureDim)
      val a = Codec.decodeWav(rec.payload)
      val rms = math.sqrt(a.samples.map(s => s.toDouble * s).sum / a.samples.length)
      assert(fs(0) == Multimodal.AudioRate && fs(1) == a.samples.length)
      assert(math.abs(fs(2) - rms) < 1e-2, s"audio $id: rms ${fs(2)} != $rms")
      assert(fs(3) == a.samples.map(s => math.abs(s.toInt)).max)
    }
  }

  test("frame sampling yields decodable frames preserving content") {
    val m = Multimodal.mediaTable(spark, dir)
    val byId = m.collect().map(r => r.media_id -> r).toMap
    Multimodal.sampleFrames(m, 4).collect().foreach { fr =>
      val orig = byId(fr.media_id)
      fr.kind match {
        case "video" =>
          assert(fr.n_frames == Multimodal.VideoFrames)
          if (orig.format == "mjpeg") {
            // zero-transcode extraction: sampled frames ARE the container's
            // own JPEG chunks, byte for byte
            val chunks = Codec.aviJpegChunks(orig.payload)
            fr.frames.zip(chunks).foreach { case (bytes, exp) =>
              assert(bytes.toSeq == exp.toSeq)
              val d = Codec.decodeImageIo(bytes)
              assert(d.width == orig.width && d.height == orig.height)
            }
          } else {
            val expected = Codec.decodePpmSeq(orig.payload)
            fr.frames.zip(expected).foreach { case (bytes, exp) =>
              assert(Codec.decodePpm(bytes).rgb.toSeq == exp.rgb.toSeq)
            }
          }
        case "image" =>
          assert(fr.n_frames == 1)
          assert(fr.frames.head.toSeq == orig.payload.toSeq)
        case "audio" =>
          val joined = fr.frames.flatMap(b => Codec.decodeWav(b).samples)
          assert(joined.toSeq == Codec.decodeWav(orig.payload).samples.toSeq,
            "audio chunks must reassemble to the original samples")
      }
    }
  }

  test("resize rescales real pixels (nearest-neighbor) and re-encodes per format") {
    val m = Multimodal.mediaTable(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
    val resized = Multimodal.resize(m, 64, 32).collect()
    val origById = m.collect().map(r => r.media_id -> r).toMap
    assert(resized.map(_.format).toSet == Set("ppm", "jpeg", "png"),
      "all three image formats must flow through resize")
    resized.foreach { r =>
      val d = Codec.decodeImage(r.format, r.payload)
      assert(d.width == 64 && d.height == 32)
      // ground truth: nearest-neighbor of the DECODED original pixels
      val o = Codec.decodeImage(r.format, origById(r.media_id).payload)
      val exp = Codec.resizeNearest(o.width, o.height, o.rgb, 64, 32)
      if (r.format == "jpeg") {
        // lossy: one extra encode/decode separates d from exp — bound the
        // mean absolute channel error instead of matching bytes
        val mae = d.rgb.zip(exp).map { case (a, b) =>
          math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / d.rgb.length
        assert(mae <= 16.0, s"media ${r.media_id}: jpeg resize MAE $mae")
      } else {
        assert(d.rgb.toSeq == exp.toSeq,
          s"media ${r.media_id}: lossless format must resize exactly")
      }
    }
  }

  test("png codec round-trips pixels exactly; jpeg within a loss bound") {
    val rgb = Array.tabulate(48 * 20 * 3)(i => ((i * 37) % 256).toByte)
    val png = Codec.decodeImageIo(Codec.encodeImageIo("png", 48, 20, rgb))
    assert(png.width == 48 && png.height == 20)
    assert(png.rgb.toSeq == rgb.toSeq, "png is lossless")
    val jpg = Codec.decodeImageIo(Codec.encodeImageIo("jpeg", 48, 20, rgb))
    assert(jpg.width == 48 && jpg.height == 20)
    val mae = jpg.rgb.zip(rgb).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / rgb.length
    // the fixture pattern is adversarially high-frequency; the JDK encoder
    // at default quality still lands well under gray-noise MAE (~85)
    assert(mae < 48.0, s"jpeg roundtrip MAE $mae")
  }

  test("fft: a pure sine peaks at its own frequency; Parseval holds") {
    val rate = 8000
    val n = 1024
    val binHz = rate.toDouble / n
    val f = 93 * binHz // exactly on bin 93 — no spectral leakage
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * f * i / rate) * 20000).toShort)
    val sp = Dsp.spectrum(samples, rate, maxFft = n)
    assert(sp.nFft == n)
    assert(math.abs(sp.peakHz - f) < binHz / 2,
      s"peak ${sp.peakHz} Hz != tone $f Hz")
    // a pure tone's centroid sits at the tone (within leakage tolerance)
    assert(math.abs(sp.centroidHz - f) < 2 * binHz,
      s"centroid ${sp.centroidHz} vs $f")
    // Parseval: sum |x|^2 == (1/N) sum |X|^2 for the raw FFT
    val re = samples.map(_.toDouble); val im = new Array[Double](n)
    val time = re.map(x => x * x).sum
    Dsp.fft(re, im)
    val freq = re.indices.map(i => re(i) * re(i) + im(i) * im(i)).sum / n
    assert(math.abs(time - freq) / time < 1e-9,
      s"Parseval violated: $time vs $freq")
  }

  test("m5 audio spectrum query runs the real FFT over decoded clips") {
    val rows = Multimodal.queries("m5_audio_spectrum")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nFft, centroid, rolloff, peak) =
        (r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert((nFft & (nFft - 1)) == 0 && nFft >= r.getInt(1).min(1024) / 2)
      val nyquist = Multimodal.AudioRate / 2.0
      assert(centroid > 0 && centroid < nyquist)
      assert(peak >= 0 && peak < nyquist && rolloff <= nyquist)
      assert(rolloff >= peak / 4, "rolloff sits in the energy mass")
    }
    // recompute one clip driver-side: the distributed result is exactly
    // the local Dsp computation on the decoded samples
    val rec = Multimodal.synthesize(1) // audio
    val a = Codec.decodeWav(rec.payload)
    val sp = Dsp.spectrum(a.samples, a.sampleRate)
    val row = rows.find(_.getLong(0) == 1L).get
    assert(row.getDouble(5) == sp.peakHz &&
      row.getDouble(4) == sp.rolloffHz,
      "distributed spectrum must equal the local recompute")
  }

  test("m6 scene detection recovers exactly the synthesized cuts") {
    val rows = Multimodal.queries("m6_scene_detect")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nCuts, cutAt) = (r.getLong(0), r.getInt(2), r.getInt(3))
      // a planted transcode dup carries its SOURCE's frames, so the cut
      // expectation follows the source id
      val eff = Multimodal.videoDupSource(id).getOrElse(id)
      if (eff % 6 == 2) {
        // synth plants ONE cut at the frame midpoint for these videos
        assert(nCuts == 1, s"video $id: expected exactly one cut, got $nCuts")
        assert(cutAt == Multimodal.VideoFrames / 2, s"video $id cut at $cutAt")
      } else {
        assert(nCuts == 0 && cutAt == -1,
          s"video $id: false positive cut (max_diff ${r.getDouble(4)})")
      }
    }
  }

  test("m9 video phash finds every planted transcode dup and matches a " +
      "driver recompute") {
    val rows = Multimodal.queries("m9_video_phash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairs = rows.map(r => (r._1, r._2)).toSet
    val vids = Multimodal.mediaParquet(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("media_id", "format", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    val ids = vids.map(_._1).toSet
    val planted = ids.filter(id =>
        Multimodal.videoDupSource(id).exists(ids.contains))
      .map(id => (id - 3, id))
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(pairs.contains(p), s"planted video dup pair $p not detected")
    }
    // planted pairs are cross-container (the transcode dup contract)
    val fmt = vids.map(v => v._1 -> v._2).toMap
    planted.foreach { case (a, b) =>
      assert(fmt(a) != fmt(b), s"pair ($a,$b) not cross-container")
    }
    // exactness of the implementation: the distributed result equals a
    // full driver recompute of per-frame dHash signatures + threshold
    val sigs = vids.map { case (id, f, payload) =>
      id -> Codec.decodeVideo(f, payload)
        .map(fr => Multimodal.dHash(fr.width, fr.height, fr.rgb)).toArray
    }
    // candidate rule mirror: a pair is considered only if some
    // NON-DEGENERATE (hash ≠ 0) frame pair shares a clean band PAIR —
    // i.e. ≥ 2 of the 8 bands match (bandBuckets keys on 16-bit band
    // pairs; Hamming ≤ 6 always leaves ≥ 2 clean bands, so the planted
    // guarantee is unchanged) — and the operator drops constant frames
    // as candidate keys (stop-key rule)
    def bandCollides(a: Long, b: Long): Boolean =
      a != 0L && b != 0L &&
        (0 until 8).count(k => ((a >>> (k * 8)) & 0xff) ==
          ((b >>> (k * 8)) & 0xff)) >= 2
    val expected = (for {
      (i, si) <- sigs; (j, sj) <- sigs
      if i < j && si.length == sj.length
      if si.zip(sj).exists { case (a, b) => bandCollides(a, b) }
      ham = si.zip(sj).map { case (a, b) =>
        java.lang.Long.bitCount(a ^ b) }.sum
      if ham <= Multimodal.VideoFrames * Multimodal.PHashMaxDist
    } yield (i, j)).toSet
    assert(pairs == expected,
      s"distributed != driver recompute: ${pairs -- expected} / " +
        s"${expected -- pairs}")
  }

  test("m8 audio fingerprint detects exactly the planted cross-format dups") {
    val rows = Multimodal.queries("m8_audio_fingerprint")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ids = Multimodal.mediaParquet(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val planted = ids.filter(id => (id / 3) % 5 == 2 && ids.contains(id - 3))
      .map(id => (id - 3, id))
    assert(planted.nonEmpty)
    val pairs = rows.map(d => (d._1, d._2)).toSet
    planted.foreach { p =>
      assert(pairs.contains(p), s"planted audio dup pair $p not detected")
    }
    // the gain-change dup barely dents correlation; unrelated tone
    // triples correlate near zero and cannot survive verification, so
    // detection is EXACTLY the planted set
    assert(pairs == planted, s"extra pairs: ${pairs -- planted}")
    rows.foreach { r =>
      assert(r._3 >= 1, s"pair (${r._1},${r._2}) shares no frame hash")
      // clear margin above FpMinCorr: the 4-bit ADPCM leg tracks the
      // near-Nyquist third partial imperfectly (worst observed ≈ 0.949;
      // phase alignment steepens slopes vs the phase-free synth's 0.99)
      assert(r._4 >= 0.92, s"pair (${r._1},${r._2}) corr ${r._4}")
    }
    // the planted pairs really are cross-format (wav vs adpcm): the
    // rotation parity flips between id and id−3
    val fmt = Multimodal.mediaParquet(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("media_id", "format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    planted.foreach { case (a, b) =>
      assert(fmt(a) != fmt(b), s"pair ($a,$b) not cross-format")
    }
    // the distributed result equals a full driver recompute: fingerprint
    // every stored clip locally, derive candidate pairs + correlations
    // with the same rules, and demand the exact same detection set
    val clips = Multimodal.mediaParquet(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> Codec.decodeWav(r.getAs[Array[Byte]](1)).samples)
      .sortBy(_._1)
    val fps = clips.map { case (id, s) =>
      id -> Multimodal.audioFingerprint(s).toSet
    }
    val samplesById = clips.toMap
    val expected = (for {
      (i, fi) <- fps; (j, fj) <- fps if i < j && fi.intersect(fj).nonEmpty
      if Multimodal.xcorr(samplesById(i), samplesById(j)) >= Multimodal.FpMinCorr
    } yield (i, j)).toSet
    assert(pairs == expected,
      s"distributed detection must equal the driver recompute: " +
        s"${pairs -- expected} / ${expected -- pairs}")
  }

  test("m7 phash finds every planted brightness/format dup; extras are " +
      "true pixel-level near-duplicates") {
    val detected = Multimodal.queries("m7_image_phash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = Multimodal.mediaParquet(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val planted = ids.filter(id => (id / 3) % 5 == 2 && ids.contains(id - 3))
      .map(id => (id - 3, id))
    val pairs = detected.map(d => (d._1, d._2)).toSet
    info("planted hammings: " + detected.filter(d => planted.contains((d._1, d._2)))
      .map(_._3).sorted.mkString(","))
    info("extra hammings: " + detected.filterNot(d => planted.contains((d._1, d._2)))
      .map(_._3).sorted.mkString(","))
    planted.foreach { p =>
      assert(pairs.contains(p), s"planted dup pair $p not detected")
    }
    // any extra detection must be a genuine pixel-level near-duplicate
    // (texture-parameter collision), not a hash artifact: verify the two
    // decoded 9x8 luminance grids agree closely
    (pairs -- planted).foreach { case (a, b) =>
      val fa = Codec.decodeImage(Multimodal.synthesize(a).format,
        Multimodal.synthesize(a).payload)
      val fb = Codec.decodeImage(Multimodal.synthesize(b).format,
        Multimodal.synthesize(b).payload)
      def grid(f: Codec.PpmFrame): Seq[Int] =
        for (gy <- 0 until 8; gx <- 0 until 9) yield {
          val i = ((gy * f.height / 8) * f.width + gx * f.width / 9) * 3
          ((f.rgb(i) & 0xff) * 299 + (f.rgb(i + 1) & 0xff) * 587 +
            (f.rgb(i + 2) & 0xff) * 114) / 1000
        }
      val (ga, gb) = (grid(fa), grid(fb))
      val meanAbs = ga.zip(gb).map { case (x, y) => math.abs(x - y) }
        .sum.toDouble / ga.size
      assert(meanAbs <= 24.0,
        s"pair ($a,$b) detected but grids differ (mean |d|=$meanAbs)")
    }
    // the planted pairs' hamming distances sit well inside the threshold
    detected.filter(d => planted.contains((d._1, d._2))).foreach { d =>
      assert(d._3 <= Multimodal.PHashMaxDist)
    }
  }

  test("catalog query prunes the payload column at the parquet scan") {
    val df = Multimodal.queries("m3_media_catalog")(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(!_.contains("payload")),
      s"metadata-only query must not read payload bytes:\n$plan")
  }

  test("m4 resize-decode query proves resized payloads are valid media") {
    val rows = Multimodal.queries("m4_resize_decode")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) == 32 && r.getInt(4) == 18,
        s"media ${r.getLong(0)}: decoded dims must be the resize target")
      assert(r.getInt(5) == (if (r.getString(1) == "image") 1
        else Multimodal.VideoFrames),
        s"media ${r.getLong(0)}: every container frame must decode")
    }
  }
}
