package graft.functions

/** Minimal JDK-only DSP kernel backing the audio spectral rung
  * (Media.audioSpectral): an iterative radix-2 Cooley-Tukey FFT over
  * Double arrays. Kept deliberately tiny — power-of-two sizes only,
  * in-place, no allocation beyond the caller's buffers — because the
  * executor-side hot loop runs once per media row inside
  * mapPartitions and the window size is fixed (512) at the call site.
  *
  * Correctness contract (DspSpec): bit-tolerance agreement with the
  * O(N^2) reference DFT, Parseval energy conservation, and exact peak
  * recovery for planted pure tones — the property the oracle of
  * q_multimodal_audio_spectral leans on (a sine at integer bin k of an
  * unpadded N-window concentrates ALL its energy in bins k and N-k;
  * zero leakage in exact math, and the int16 rounding noise floor is
  * ~5 orders of magnitude below the planted peaks).
  */
object Dsp {

  /** In-place radix-2 decimation-in-time FFT. `re.length` must be a
    * power of two and `im.length == re.length`.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT size $n is not a power of two")
    require(im.length == n, "re/im length mismatch")
    // bit-reversal permutation
    var i = 1
    var j = 0
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
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr
          im(b) = im(a) - xi
          re(a) += xr
          im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of a real signal: FFT then |X[k]| for
    * k in [0, n/2] (the Hermitian-symmetric upper half is redundant
    * for real input).
    */
  def magnitudeSpectrum(signal: Array[Double]): Array[Double] = {
    val n = signal.length
    val re = java.util.Arrays.copyOf(signal, n)
    val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => math.hypot(re(k), im(k)))
  }
}
