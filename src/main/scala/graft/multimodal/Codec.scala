package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the media formats the multimodal operators decode
  * for real. Every modality covers both a raw and a genuinely COMPRESSED
  * real-world format end to end:
  *
  *  - images: binary PPM (P6) by hand; JPEG/PNG through the JDK's own
  *    `javax.imageio` (headless, no external libraries);
  *  - audio: PCM-16 WAV by hand; IMA ADPCM (the standard 4-bit lossy
  *    codec, WAVE format tag 0x11 — 4:1 compression) hand-rolled from the
  *    published step/index tables, in a standard playable RIFF container;
  *  - video: concatenated-PPM sequences by hand; MJPEG inside a real
  *    AVI/RIFF container ('MJPG' fourcc, '00dc' movi chunks — the format
  *    cameras and players actually exchange), each frame a JDK-encoded
  *    JPEG.
  *
  * Only long-GOP / entropy-coded codecs (H264/MP3) remain out of reach
  * in this environment; the operator contract (bytes in → pixels/samples
  * out) is identical, and the compressed paths above exercise real lossy
  * decode in every modality.
  *
  * The hand-rolled paths are deterministic byte/int math; the imageio
  * paths are deterministic within a JDK (the same encoder produces the
  * same bytes for the same pixels). All are safe inside mapPartitions on
  * any executor.
  */
object Codec {

  // headless + no temp-file cache: executor-thread-friendly imageio
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  // ---------------------------------------------------------- JPEG / PNG

  /** Interleaved RGB → BufferedImage by ONE bulk setRGB call — the
    * per-pixel form routes through color-model conversion per call,
    * ~10-50× slower on the executor encode hot path. */
  private def rgbToImage(w: Int, h: Int,
                         rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val packed = new Array[Int](w * h)
    var p = 0
    while (p < packed.length) {
      val i = p * 3
      packed(p) = ((rgb(i) & 0xff) << 16) |
        ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, w, h, packed, 0, w)
    img
  }

  /** Encode interleaved RGB bytes as JPEG or PNG via the JDK codec. */
  def encodeImageIo(format: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(rgbToImage(w, h, rgb), format, bos)
    require(ok, s"no JDK image writer for format '$format'")
    bos.toByteArray
  }

  /** Decode a JPEG/PNG (any JDK-readable image) to interleaved RGB. The
    * container self-describes — no format argument needed. */
  def decodeImageIo(bytes: Array[Byte]): PpmFrame = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val packed = img.getRGB(0, 0, w, h, null, 0, w) // bulk, one call
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < packed.length) {
      val v = packed(p)
      val i = p * 3
      rgb(i) = ((v >> 16) & 0xff).toByte
      rgb(i + 1) = ((v >> 8) & 0xff).toByte
      rgb(i + 2) = (v & 0xff).toByte
      p += 1
    }
    PpmFrame(w, h, rgb, bytes.length)
  }

  /** JPEG encode at an explicit quality (the bare `ImageIO.write` path
    * uses the writer default ~0.75). The MJPEG frames use 0.9: smaller
    * quantization noise keeps scene-cut luminance margins intact while
    * still being genuinely lossy DCT compression. */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte], quality: Float): Array[Byte] = {
    val img = rgbToImage(w, h, rgb)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose(); ios.close()
    }
    bos.toByteArray
  }

  /** Format-dispatched single-image decode: hand-rolled PPM for 'ppm',
    * the JDK codec for compressed formats. */
  def decodeImage(format: String, bytes: Array[Byte]): PpmFrame =
    if (format == "ppm") decodePpm(bytes) else decodeImageIo(bytes)

  // ----------------------------------------------------------- AVI / MJPEG
  // A real RIFF-AVI container with 'MJPG'-fourcc '00dc' frame chunks —
  // the Motion-JPEG layout cameras/players exchange. Writer emits
  // hdrl(avih + strl(strh/strf)) + movi; reader walks RIFF chunks and
  // decodes each frame via the JDK JPEG codec. Pure JVM.

  val MjpegQuality = 0.9f
  val MjpegFps = 25

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode RGB frames (all same w×h) as an MJPEG AVI. */
  def encodeAviMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "empty video")
    val jpegs = frames.map(f => encodeJpeg(w, h, f, MjpegQuality))
    val moviBody = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlLen = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffLen = 4 + (8 + hdrlLen) + (8 + 4 + moviBody)
    val maxJpeg = jpegs.map(_.length).max
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(cc("RIFF")).putInt(riffLen).put(cc("AVI "))
    // --- LIST hdrl
    buf.put(cc("LIST")).putInt(hdrlLen).put(cc("hdrl"))
    //     avih: main header (56 bytes)
    buf.put(cc("avih")).putInt(56)
      .putInt(1000000 / MjpegFps) // µs per frame
      .putInt(maxJpeg * MjpegFps) // max bytes/sec
      .putInt(0) // padding granularity
      .putInt(0) // flags: no idx1 written, so AVIF_HASINDEX stays clear
      .putInt(frames.length)
      .putInt(0) // initial frames
      .putInt(1) // streams
      .putInt(maxJpeg) // suggested buffer
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    //     LIST strl
    buf.put(cc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(cc("strl"))
    //       strh: stream header (56 bytes)
    buf.put(cc("strh")).putInt(56)
      .put(cc("vids")).put(cc("MJPG"))
      .putInt(0) // flags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(MjpegFps) // scale, rate → fps
      .putInt(0) // start
      .putInt(frames.length) // length in frames
      .putInt(maxJpeg) // suggested buffer
      .putInt(-1) // quality (default)
      .putInt(0) // sample size (varies)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    //       strf: BITMAPINFOHEADER (40 bytes)
    buf.put(cc("strf")).putInt(40)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24) // planes, bpp
      .put(cc("MJPG")) // biCompression
      .putInt(w * h * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // --- LIST movi
    buf.put(cc("LIST")).putInt(4 + moviBody).put(cc("movi"))
    jpegs.foreach { j =>
      buf.put(cc("00dc")).putInt(j.length).put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // RIFF even padding
    }
    buf.array()
  }

  /** Decode an MJPEG AVI to frames: the container walk finds the '00dc'
    * JPEG chunks, the JDK codec decodes each. */
  def decodeAviMjpeg(bytes: Array[Byte]): Seq[PpmFrame] = {
    val out = aviJpegChunks(bytes).map(decodeImageIo)
    require(out.nonEmpty, "no 00dc frames in AVI")
    out
  }

  /** The raw JPEG payloads of an MJPEG AVI, WITHOUT decoding — frame
    * extraction from this container is pure chunk walking (each '00dc'
    * chunk already is a standalone JPEG), so sampling frames out of an
    * MJPEG video never runs the pixel codec at all. */
  def aviJpegChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    buf.getInt
    require(fourcc() == "AVI ", "not an AVI file")
    val chunks = Seq.newBuilder[Array[Byte]]
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val len = buf.getInt
      val next = buf.position() + len + (len & 1)
      if (id == "LIST" && fourcc() == "movi") {
        while (buf.position() < next && buf.remaining() >= 8) {
          val cid = fourcc()
          val clen = buf.getInt
          val cnext = buf.position() + clen + (clen & 1)
          if (cid == "00dc" && clen > 0) {
            val jpeg = new Array[Byte](clen)
            buf.get(jpeg)
            chunks += jpeg
          }
          buf.position(cnext)
        }
      }
      buf.position(next)
    }
    chunks.result()
  }

  /** Format-dispatched video decode: hand-rolled PPM sequence for 'ppms',
    * the AVI/MJPEG path for 'mjpeg'. */
  def decodeVideo(format: String, bytes: Array[Byte]): Seq[PpmFrame] =
    if (format == "mjpeg") decodeAviMjpeg(bytes) else decodePpmSeq(bytes)

  /** Format-dispatched video encode from same-sized RGB frames. */
  def encodeVideo(format: String, w: Int, h: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] =
    if (format == "mjpeg") encodeAviMjpeg(w, h, frames)
    else frames.toArray.flatMap(f => encodePpm(w, h, f))


  /** Format-dispatched single-image encode. */
  def encodeImage(format: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    if (format == "ppm") encodePpm(w, h, rgb) else encodeImageIo(format, w, h, rgb)

  // ---------------------------------------------------------------- PPM P6

  /** Encode interleaved RGB bytes (len = w*h*3) as a binary PPM. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** One decoded PPM frame plus the offset just past it (frames may be
    * concatenated back-to-back — the "video" container). */
  final case class PpmFrame(width: Int, height: Int, rgb: Array[Byte], end: Int)

  /** Decode the PPM frame starting at `off`. */
  def decodePpm(bytes: Array[Byte], off: Int = 0): PpmFrame = {
    var i = off
    def skipWs(): Unit = {
      while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\r' || bytes(i) == '\t')) i += 1
    }
    def token(): String = {
      skipWs()
      val start = i
      while (i < bytes.length && bytes(i) > ' ') i += 1
      new String(bytes, start, i - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a P6 PPM at offset $off: '$magic'")
    val w = token().toInt
    val h = token().toInt
    val maxVal = token().toInt
    require(maxVal == 255, s"unsupported maxval $maxVal")
    i += 1 // single whitespace after maxval, then raster
    val n = w * h * 3
    require(i + n <= bytes.length, "truncated PPM raster")
    val rgb = java.util.Arrays.copyOfRange(bytes, i, i + n)
    PpmFrame(w, h, rgb, i + n)
  }

  /** Decode a stream of concatenated P6 frames. */
  def decodePpmSeq(bytes: Array[Byte]): Seq[PpmFrame] = {
    val frames = Seq.newBuilder[PpmFrame]
    var off = 0
    while (off < bytes.length) {
      val f = decodePpm(bytes, off)
      frames += f
      off = f.end
    }
    frames.result()
  }

  /** Nearest-neighbor resample of interleaved RGB pixels. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
                    newW: Int, newH: Int): Array[Byte] = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val sx = x * w / newW
        val src = (sy * w + sx) * 3
        val dst = (y * newW + x) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- WAV PCM16

  /** Encode mono 16-bit PCM samples as a RIFF/WAVE file. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  /** Decode a mono RIFF/WAVE file: PCM-16 (format tag 1) or IMA ADPCM
    * (format tag 0x11). Walks chunks to find fmt/fact/data; the container
    * self-describes, so callers never dispatch on an external format
    * string. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE file")
    var rate = -1
    var tag = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val len = buf.getInt
      val next = buf.position() + len + (len & 1) // RIFF chunks pad to even
      id match {
        case "fmt " =>
          tag = buf.getShort & 0xffff
          val ch = buf.getShort
          require((tag == 1 || tag == 0x11) && ch == 1,
            s"only mono PCM / IMA ADPCM supported (tag=$tag ch=$ch)")
          rate = buf.getInt
          buf.getInt // byte rate
          blockAlign = buf.getShort & 0xffff
          buf.getShort // bits per sample
          if (tag == 0x11) {
            buf.getShort // cbSize (2)
            samplesPerBlock = buf.getShort & 0xffff
          }
          buf.position(next)
        case "fact" =>
          factSamples = buf.getInt
          buf.position(next)
        case "data" =>
          require(tag > 0, "data chunk before fmt")
          if (tag == 1) {
            samples = new Array[Short](len / 2)
            var j = 0
            while (j < samples.length) { samples(j) = buf.getShort; j += 1 }
          } else {
            samples = decodeAdpcmBlocks(bytes, buf.position(), len,
              blockAlign, samplesPerBlock, factSamples)
          }
        case _ =>
          buf.position(next)
      }
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    WavAudio(rate, samples)
  }

  // --------------------------------------------------- IMA ADPCM (tag 0x11)
  // The standard DVI/IMA tables (public spec; also in e.g. ffmpeg/SoX).
  // 4 bits/sample vs PCM-16's 16 → real 4:1 lossy compression.

  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: apply a 4-bit code to (predictor, index). The
    * ENCODER runs the same function so its predictor tracks exactly what
    * the decoder will reconstruct (the codec's feedback loop). Returns
    * the new (predictor, index). */
  private def imaStep(code: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    val p0 = if ((code & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + ImaIndexAdj(code)))
    (p, i)
  }

  /** Quantize one sample against the current (predictor, index). */
  private def imaEncodeSample(sample: Int, predictor: Int, index: Int): Int = {
    var diff = sample - predictor
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    var step = ImaStep(index)
    if (diff >= step) { code |= 4; diff -= step }
    step >>= 1
    if (diff >= step) { code |= 2; diff -= step }
    step >>= 1
    if (diff >= step) code |= 1
    code
  }

  /** Mono block layout: 4-byte header (int16 predictor = first sample,
    * uint8 step index, 1 reserved byte) then (blockAlign-4)*2 nibble
    * samples, low nibble first. */
  private val AdpcmBlockAlign = 256
  private val AdpcmSamplesPerBlock = (AdpcmBlockAlign - 4) * 2 + 1 // 505

  /** Encode mono 16-bit samples as a standard IMA ADPCM WAVE file
    * (format tag 0x11, fact chunk carrying the true sample count — the
    * last block's tail nibbles are padding the decoder discards). */
  def encodeAdpcmWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty, "empty audio")
    val nBlocks = (samples.length + AdpcmSamplesPerBlock - 1) / AdpcmSamplesPerBlock
    val dataLen = nBlocks * AdpcmBlockAlign
    val buf = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * AdpcmBlockAlign / AdpcmSamplesPerBlock
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11) // IMA ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort(AdpcmBlockAlign.toShort)
      .putShort(4) // bits per sample
      .putShort(2) // cbSize
      .putShort(AdpcmSamplesPerBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var index = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * AdpcmSamplesPerBlock
      var predictor: Int = samples(base)
      buf.putShort(predictor.toShort).put(index.toByte).put(0.toByte)
      var k = 1
      var lowNibble = -1
      while (k < AdpcmSamplesPerBlock) {
        val idx = base + k
        val s: Int = if (idx < samples.length) samples(idx) else predictor
        val code = imaEncodeSample(s, predictor, index)
        val (p, i) = imaStep(code, predictor, index)
        predictor = p; index = i
        if (lowNibble < 0) lowNibble = code
        else { buf.put((lowNibble | (code << 4)).toByte); lowNibble = -1 }
        k += 1
      }
      b += 1
    }
    buf.array()
  }

  private def decodeAdpcmBlocks(bytes: Array[Byte], off: Int, len: Int,
                                blockAlign: Int, samplesPerBlock: Int,
                                factSamples: Int): Array[Short] = {
    require(blockAlign > 4 && samplesPerBlock == (blockAlign - 4) * 2 + 1,
      s"unsupported ADPCM block layout ($blockAlign/$samplesPerBlock)")
    // fail fast like the other unsupported shapes: a trailing partial
    // block (external encoders may emit one) would otherwise be silently
    // discarded by the len/blockAlign floor
    require(len % blockAlign == 0,
      s"ADPCM data chunk length $len is not a whole number of " +
        s"$blockAlign-byte blocks (trailing partial block unsupported)")
    val nBlocks = len / blockAlign
    val total =
      if (factSamples > 0) factSamples else nBlocks * samplesPerBlock
    val out = new Array[Short](total)
    var n = 0
    var b = 0
    while (b < nBlocks && n < total) {
      val buf = ByteBuffer.wrap(bytes, off + b * blockAlign, blockAlign)
        .order(ByteOrder.LITTLE_ENDIAN)
      var predictor: Int = buf.getShort
      var index: Int = math.max(0, math.min(88, buf.get() & 0xff))
      buf.get() // reserved
      out(n) = predictor.toShort; n += 1
      // nibble pair j encodes samples 2j+1 (low nibble) and 2j+2 (high)
      var k = 1
      while (k < samplesPerBlock && n < total) {
        val byteVal = bytes(off + b * blockAlign + 4 + (k - 1) / 2) & 0xff
        val code = if (k % 2 == 1) byteVal & 0x0f else (byteVal >> 4) & 0x0f
        val (p, i) = imaStep(code, predictor, index)
        predictor = p; index = i
        out(n) = predictor.toShort; n += 1
        k += 1
      }
      b += 1
    }
    out
  }
}
