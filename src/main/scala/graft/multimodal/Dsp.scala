package graft.multimodal

/** Minimal pure-JVM signal processing for the audio operators: an
  * iterative radix-2 FFT and the spectral summary features computed from
  * it (centroid, rolloff, peak frequency, RMS). Deterministic double
  * arithmetic in a fixed order — identical results on any executor, no
  * native libraries.
  */
object Dsp {

  /** In-place iterative radix-2 FFT (Cooley–Tukey, bit-reversal order).
    * `re.length` must be a power of two; `im` is modified in place too. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft size $n not a power of two")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  final case class Spectrum(
      nFft: Int,
      centroidHz: Double,
      rolloffHz: Double, // smallest freq with >= 85% cumulative magnitude
      peakHz: Double,
      rms: Double)

  /** Spectral summary of PCM samples: analyze the first `maxFft` samples
    * (zero-padded to a power of two), magnitudes over the positive-
    * frequency half. */
  def spectrum(samples: Array[Short], sampleRate: Int,
               maxFft: Int = 1024): Spectrum = {
    val take = math.min(samples.length, maxFft)
    var nFft = 1
    while (nFft < take) nFft <<= 1
    val re = new Array[Double](nFft)
    val im = new Array[Double](nFft)
    var i = 0
    var sq = 0.0
    while (i < take) {
      re(i) = samples(i).toDouble
      sq += re(i) * re(i)
      i += 1
    }
    fft(re, im)
    val half = nFft / 2
    val mag = new Array[Double](half)
    var total = 0.0
    var (peakBin, peakMag) = (0, -1.0)
    i = 1 // skip DC: the features describe the signal, not its offset
    while (i < half) {
      mag(i) = math.sqrt(re(i) * re(i) + im(i) * im(i))
      total += mag(i)
      if (mag(i) > peakMag) { peakMag = mag(i); peakBin = i }
      i += 1
    }
    val hzPerBin = sampleRate.toDouble / nFft
    var centroid = 0.0
    i = 1
    while (i < half) { centroid += i * hzPerBin * mag(i); i += 1 }
    centroid = if (total > 0) centroid / total else 0.0
    var cum = 0.0
    var roll = half - 1
    i = 1
    var found = false
    while (i < half && !found) {
      cum += mag(i)
      if (cum >= 0.85 * total) { roll = i; found = true }
      i += 1
    }
    Spectrum(nFft, centroid, roll * hzPerBin, peakBin * hzPerBin,
      math.sqrt(sq / math.max(take, 1)))
  }
}
