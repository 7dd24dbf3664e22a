package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the media formats the multimodal operators decode
  * for real: binary PPM (P6) images and PCM-16 WAV audio by hand, and
  * COMPRESSED images (JPEG, PNG) through the JDK's own `javax.imageio`
  * (headless, no external libraries) — so the image path covers both a
  * raw and a real-world compressed format end to end. Only compressed
  * *video/audio* codecs (H264/MP3) remain out of reach in this
  * environment; their operator shape is identical (bytes in →
  * pixels/samples out), exercised here via the PPM-sequence container.
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

  /** Encode interleaved RGB bytes as JPEG or PNG via the JDK codec. */
  def encodeImageIo(format: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // bulk transfer: one setRGB call for the whole image — the per-pixel
    // form routes through color-model conversion per call, ~10-50× slower
    // on the executor decode hot path
    val packed = new Array[Int](w * h)
    var p = 0
    while (p < packed.length) {
      val i = p * 3
      packed(p) = ((rgb(i) & 0xff) << 16) |
        ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, w, h, packed, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, bos)
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

  /** Format-dispatched single-image decode: hand-rolled PPM for 'ppm',
    * the JDK codec for compressed formats. */
  def decodeImage(format: String, bytes: Array[Byte]): PpmFrame =
    if (format == "ppm") decodePpm(bytes) else decodeImageIo(bytes)

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

  /** Decode a mono PCM-16 RIFF/WAVE file (walks chunks to find fmt/data). */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE file")
    var rate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = fourcc()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          require(fmt == 1 && ch == 1, s"only mono PCM supported ($fmt/$ch)")
          rate = buf.getInt
          buf.position(buf.position() + len - 8) // skip rest of fmt
        case "data" =>
          samples = new Array[Short](len / 2)
          var j = 0
          while (j < samples.length) { samples(j) = buf.getShort; j += 1 }
        case _ =>
          buf.position(buf.position() + len)
      }
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    WavAudio(rate, samples)
  }
}
