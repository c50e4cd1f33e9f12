package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{Dsp, Media}

/** The FFT kernel behind Media.audioSpectral — pinned three ways:
  *
  *  1. bit-tolerance agreement with the O(N^2) reference DFT on random
  *     signals across sizes (the transform is DEFINED by that sum);
  *  2. Parseval energy conservation (sum |X[k]|^2 = N sum x[n]^2);
  *  3. planted pure tones at integer bins: ALL energy in bins k and
  *     N-k, zero leakage in exact math — the property the oracle of
  *     q_multimodal_audio_spectral leans on — including the int16
  *     QUANTIZED tone the fixture actually ships, whose rounding noise
  *     floor must stay far below the 0.999-purity gate.
  */
class DspSpec extends AnyFunSuite with Matchers {

  /** Naive O(N^2) DFT — the definition the FFT must reproduce. */
  private def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val a = -2.0 * math.Pi * k * j / n
      re(k) += x(j) * math.cos(a)
      im(k) += x(j) * math.sin(a)
    }
    (re, im)
  }

  test("fft agrees with the reference DFT across sizes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(2, 4, 8, 32, 128, 512)) {
      val x = Array.fill(n)(rnd.nextDouble() * 2000 - 1000)
      val (er, ei) = dft(x)
      val re = java.util.Arrays.copyOf(x, n)
      val im = new Array[Double](n)
      Dsp.fft(re, im)
      val scale = math.max(1.0, x.map(math.abs).max * n)
      for (k <- 0 until n) {
        math.abs(re(k) - er(k)) should be <= 1e-9 * scale
        math.abs(im(k) - ei(k)) should be <= 1e-9 * scale
      }
    }
  }

  test("Parseval: spectral energy equals N x time energy") {
    val rnd = new scala.util.Random(11)
    val n = 512
    val x = Array.fill(n)(rnd.nextDouble() * 2000 - 1000)
    val eTime = x.map(v => v * v).sum
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    Dsp.fft(re, im)
    val eSpec = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    math.abs(eSpec - n * eTime) should be <= 1e-9 * n * eTime
  }

  test("planted exact-math tone: all energy at bins k and N-k, zero leakage") {
    val n = 512
    for (k <- Seq(1, 3, 97, 200, 255)) {
      val x = Array.tabulate(n)(i => 1000.0 * math.sin(2.0 * math.Pi * k * i / n))
      val mag = Dsp.magnitudeSpectrum(x)
      mag.length shouldBe n / 2 + 1
      val peak = mag.indices.maxBy(mag)
      peak shouldBe k
      // |X[k]| = A*N/2 for an interior-bin sine
      math.abs(mag(k) - 1000.0 * n / 2) should be <= 1e-6 * 1000.0 * n / 2
      // every other one-sided bin is numerical dust
      for (j <- mag.indices if j != k) mag(j) should be <= 1e-6 * mag(k)
    }
  }

  test("int16-quantized fixture tone: peak exact, purity far above the 0.999 gate") {
    val n = 512
    for (docId <- Seq(0L, 1L, 42L, 199L, 123456789L, -7L)) {
      val k = Media.fixtureToneBin(docId)
      val x = Array.tabulate(n)(i => Media.fixtureToneSample(docId, i).toDouble)
      val mag = Dsp.magnitudeSpectrum(x)
      val power = mag.map(m => m * m)
      val peak = power.indices.maxBy(power)
      peak shouldBe k
      val eSpec = power.indices.map { j =>
        (if (j == 0 || j == n / 2) 1.0 else 2.0) * power(j)
      }.sum
      val purity = 2.0 * power(k) / eSpec
      purity should be >= 0.99999 // rounding noise is ~8 orders down
      // Parseval against the exact integer time energy
      val eTime = n.toDouble * x.map(v => v * v).sum
      math.abs(eSpec - eTime) should be <= 1e-9 * eTime
    }
  }

  test("non-power-of-two and mismatched buffers are refused") {
    an[IllegalArgumentException] should be thrownBy
      Dsp.fft(new Array[Double](12), new Array[Double](12))
    an[IllegalArgumentException] should be thrownBy
      Dsp.fft(new Array[Double](8), new Array[Double](4))
  }
}
