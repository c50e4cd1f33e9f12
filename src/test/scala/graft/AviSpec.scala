package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{Jpeg, Media}

/** The AVI-MJPEG container rung (container x codec composition):
  * round-trip through our builder + walker, frame payload integrity
  * (every movi span decodes as the JPEG that was put in), refusal of
  * non-AVI RIFF files, and the same truncation/corruption fuzz
  * discipline as the WAV/BMP/PNG/JPEG parsers — a crafted or damaged
  * container must return None or a smaller frame list, never throw.
  */
class AviSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def frames(id: Long, w: Int, h: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map(f =>
      Jpeg.encode(w, h, Media.fixtureVideoPixel(id, f), Array.emptyByteArray))

  test("round-trip: header fields, frame spans, and per-frame JPEG decode") {
    val (w, h, n) = (11, 7, 4)
    val fr = frames(42L, w, h, n)
    val avi = Media.aviMjpegContainer(w, h, 40000, fr, "payload".getBytes("UTF-8"))
    val info = Media.parseAviMjpeg(avi).get
    info.width shouldBe w
    info.height shouldBe h
    info.usPerFrame shouldBe 40000
    info.totalFrames shouldBe n
    info.frames.length shouldBe n
    info.frames.zip(fr).foreach { case ((off, len), orig) =>
      len shouldBe orig.length
      val bytes = java.util.Arrays.copyOfRange(avi, off, off + len)
      bytes shouldBe orig
      val (dw, dh, rgb) = Jpeg.decodeRgb(bytes).get
      (dw, dh) shouldBe ((w, h))
      rgb.length shouldBe w * h
    }
  }

  test("decoded frames meet the lossy tolerance against their per-frame formulas") {
    val (w, h, n) = (16, 12, 3)
    val fr = frames(7L, w, h, n)
    val avi = Media.aviMjpegContainer(w, h, 33333, fr, Array.emptyByteArray)
    val info = Media.parseAviMjpeg(avi).get
    info.frames.zipWithIndex.foreach { case ((off, len), fi) =>
      val Some((dw, dh, rgb)) =
        Jpeg.decodeRgb(java.util.Arrays.copyOfRange(avi, off, off + len))
      var worst = 0
      for (y <- 0 until dh; x <- 0 until dw) {
        val p = rgb(y * dw + x)
        val (r, g, b) = Media.fixtureVideoPixel(7L, fi)(x, y)
        worst = math.max(worst, math.max(math.abs(((p >> 16) & 0xff) - r),
          math.max(math.abs(((p >> 8) & 0xff) - g), math.abs((p & 0xff) - b))))
      }
      worst should be <= Jpeg.FixtureTolerance
    }
    // distinct seeds -> genuinely distinct frames
    val d0 = Jpeg.decodeRgb(java.util.Arrays.copyOfRange(
      avi, info.frames(0)._1, info.frames(0)._1 + info.frames(0)._2)).get._3
    val d1 = Jpeg.decodeRgb(java.util.Arrays.copyOfRange(
      avi, info.frames(1)._1, info.frames(1)._1 + info.frames(1)._2)).get._3
    d0 should not be d1
  }

  test("non-AVI and non-RIFF payloads are refused, not misparsed") {
    Media.parseAviMjpeg("not a container at all".getBytes) shouldBe None
    // a genuine RIFF that is a WAV, not an AVI
    val wav = Media.wavContainer(8000, Array.fill[Short](64)(100), Array.emptyByteArray)
    Media.parseAviMjpeg(wav) shouldBe None
    Media.parseAviMjpeg(Array.emptyByteArray) shouldBe None
  }

  test("truncation fuzz: every prefix parses to None or fewer frames, never throws") {
    val fr = frames(3L, 9, 6, 3)
    val avi = Media.aviMjpegContainer(9, 6, 40000, fr, "p".getBytes)
    (0 until avi.length).foreach { cut =>
      val trunc = java.util.Arrays.copyOfRange(avi, 0, cut)
      noException should be thrownBy {
        Media.parseAviMjpeg(trunc).foreach { info =>
          info.frames.length should be <= 3
        }
      }
    }
  }

  test("corruption fuzz: 400 random single-byte flips never throw") {
    val fr = frames(9L, 10, 8, 2)
    val avi = Media.aviMjpegContainer(10, 8, 40000, fr, "p".getBytes)
    val rnd = new scala.util.Random(13)
    (0 until 400).foreach { _ =>
      val mut = avi.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy Media.parseAviMjpeg(mut)
    }
  }

  test("videoFrameStats stride geometry and verdicts on a hand-built corpus") {
    // via the fixture path end to end at a couple of (n, stride) points
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha", "s1", "en", 7L),   // n_frames = 1 + 7%4 = 4
      (2L, "beta", "s1", "en", 10L)    // n_frames = 1 + 10%4 = 3
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val stats = Media.videoFrameStats(Media.fromDocumentsVideo(spark, docs), stride = 2)
      .collect().sortBy(_.doc_id)
    stats.map(_.n_frames).toSeq shouldBe Seq(4, 3)
    stats.map(_.n_sampled).toSeq shouldBe Seq(2, 2)
    stats.map(_.last_sampled).toSeq shouldBe Seq(2, 2)
    all(stats.map(_.dims_ok)) shouldBe true
    all(stats.map(_.within_tol)) shouldBe true
    stats.map(_.duration_ms).toSeq shouldBe
      Seq((4L * (33333 + 2 * 1000) / 1000).toInt, (3L * 33333 / 1000).toInt)
  }
}
