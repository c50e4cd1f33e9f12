package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.Jpeg

/** The baseline JPEG codec (functions.Jpeg): lossy, so correctness is
  * a tolerance contract plus INDEPENDENT-decoder agreement — the same
  * two-sided discipline as the PNG rung, adapted to a lossy codec:
  *
  *  1. our encoder -> our decoder: every sample within
  *     [[Jpeg.FixtureTolerance]] of ground truth, on both a noisy
  *     (fixture-formula) and a smooth (gradient) image;
  *  2. our encoder -> the JDK's ImageIO decoder: the foreign decoder
  *     accepts our stream and agrees with OURS almost exactly (the
  *     two differ only in IDCT/rounding arithmetic);
  *  3. ImageIO's encoder -> our decoder: we accept a foreign stream
  *     (different tables, 4:2:0 subsampling at default quality) and
  *     agree with ImageIO's own decode of the same bytes;
  *  4. refusal + fuzz: progressive and 16-bit-quant streams return
  *     None, truncation at every prefix length never throws, crafted
  *     dimensions beyond the allocation cap are refused, trailing
  *     payload bytes after EOI don't disturb the decode.
  */
class JpegSpec extends AnyFunSuite with Matchers {

  /** The multimodal fixture pixel formula (Media.fixtureBmpPixel) —
    * deliberately noisy: every 8x8 block has full-range variation, the
    * hardest case for a transform codec's tolerance contract.
    */
  private def noisyPixel(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + x * 11 + y * 3) % 256).toInt,
    ((id * 23 + x * 5 + y * 19) % 256).toInt)

  private def gradientPixel(x: Int, y: Int): (Int, Int, Int) =
    (math.min(255, x * 3 + y), math.min(255, 128 + x - y / 2), math.min(255, y * 2))

  private def maxErr(w: Int, h: Int, rgb: Array[Int],
      ref: (Int, Int) => (Int, Int, Int)): Int = {
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = rgb(y * w + x)
      val (r, g, b) = ref(x, y)
      worst = math.max(worst, math.max(math.abs(((p >> 16) & 0xff) - r),
        math.max(math.abs(((p >> 8) & 0xff) - g), math.abs((p & 0xff) - b))))
    }
    worst
  }

  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) rgb(y * w + x) = img.getRGB(x, y) & 0xffffff
    (w, h, rgb)
  }

  private def imageIoEncode(w: Int, h: Int,
      pixel: (Int, Int) => (Int, Int, Int), quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    out.toByteArray
  }

  test("roundtrip: our encoder -> our decoder within the fixture tolerance, noisy and smooth") {
    for ((w, h) <- Seq((16, 12), (13, 7), (8, 8), (1, 1), (17, 9))) {
      val bytes = Jpeg.encode(w, h, noisyPixel(42L), Array.emptyByteArray)
      val Some((dw, dh, rgb)) = Jpeg.decodeRgb(bytes)
      (dw, dh) shouldBe (w, h)
      withClue(s"noisy ${w}x$h: ") {
        maxErr(w, h, rgb, noisyPixel(42L)) should be <= Jpeg.FixtureTolerance
      }
    }
    val bytes = Jpeg.encode(64, 48, gradientPixel, Array.emptyByteArray)
    val Some((_, _, rgb)) = Jpeg.decodeRgb(bytes)
    maxErr(64, 48, rgb, gradientPixel) should be <= Jpeg.FixtureTolerance
  }

  test("cross-decode: ImageIO reads OUR stream and agrees with our decoder") {
    val (w, h) = (24, 16)
    val bytes = Jpeg.encode(w, h, noisyPixel(7L), Array.emptyByteArray)
    val (iw, ih, ioRgb) = imageIoDecode(bytes)
    (iw, ih) shouldBe (w, h)
    val Some((_, _, ourRgb)) = Jpeg.decodeRgb(bytes)
    // same stream, two independent IDCT/color pipelines: tiny skew only
    var worst = 0
    for (i <- ourRgb.indices; shift <- Seq(16, 8, 0))
      worst = math.max(worst,
        math.abs(((ourRgb(i) >> shift) & 0xff) - ((ioRgb(i) >> shift) & 0xff)))
    worst should be <= 4
  }

  test("cross-encode: our decoder reads an ImageIO stream (foreign tables, 4:2:0) and agrees with ImageIO") {
    // smooth image: with subsampled chroma the two decoders' upsample
    // filters (box vs bilinear) agree to a small band only where the
    // chroma gradient is small — which smoothness guarantees
    val (w, h) = (32, 24)
    val bytes = imageIoEncode(w, h, gradientPixel, 0.95f)
    val Some((dw, dh, ourRgb)) = Jpeg.decodeRgb(bytes)
    (dw, dh) shouldBe (w, h)
    val (_, _, ioRgb) = imageIoDecode(bytes)
    var worst = 0
    for (i <- ourRgb.indices; shift <- Seq(16, 8, 0))
      worst = math.max(worst,
        math.abs(((ourRgb(i) >> shift) & 0xff) - ((ioRgb(i) >> shift) & 0xff)))
    withClue(s"foreign-stream agreement (worst channel delta $worst): ") {
      worst should be <= 12
    }
    // and against ground truth the decode is still a faithful image
    maxErr(w, h, ourRgb, gradientPixel) should be <= 24
  }

  test("grayscale: a 1-component foreign stream decodes with Y replicated") {
    val (w, h) = (20, 10)
    // write sample values through the RASTER: TYPE_BYTE_GRAY's
    // get/setRGB round-trips through a LINEAR gray colorspace, so
    // RGB-space comparisons would measure that conversion, not the
    // codec — the JFIF Y channel carries the raster values verbatim
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 9 + y * 5) % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    val Some((dw, dh, rgb)) = Jpeg.decodeRgb(out.toByteArray)
    (dw, dh) shouldBe (w, h)
    val io = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w)
      worst = math.max(worst,
        math.abs((rgb(y * w + x) & 0xff) - io.getRaster.getSample(x, y, 0)))
    worst should be <= 4
    // every decoded pixel is genuinely gray
    rgb.forall(p => ((p >> 16) & 0xff) == (p & 0xff)) shouldBe true
  }

  test("payload carrier: trailing bytes after EOI do not disturb the decode") {
    val payload = "the document text rides behind the image".getBytes("UTF-8")
    val bytes = Jpeg.encode(10, 10, noisyPixel(3L), payload)
    val plain = Jpeg.encode(10, 10, noisyPixel(3L), Array.emptyByteArray)
    Jpeg.decodeRgb(bytes).map(_._3.toSeq) shouldBe Jpeg.decodeRgb(plain).map(_._3.toSeq)
    bytes.takeRight(payload.length) shouldBe payload
  }

  test("refusal: progressive, 16-bit quant, oversized dims, and non-JPEG bytes return None") {
    val good = Jpeg.encode(8, 8, noisyPixel(1L), Array.emptyByteArray)
    // flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    val prog = good.clone()
    val sof = prog.indices.dropRight(1)
      .find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    Jpeg.decodeRgb(prog) shouldBe None
    // flip a DQT's Pq nibble to 16-bit
    val dq = good.clone()
    val dqt = dq.indices.dropRight(1)
      .find(i => (dq(i) & 0xff) == 0xff && (dq(i + 1) & 0xff) == 0xdb).get
    dq(dqt + 4) = 0x10.toByte
    Jpeg.decodeRgb(dq) shouldBe None
    // crafted dims past the allocation cap
    val big = good.clone()
    big(sof + 5) = 0xff.toByte; big(sof + 6) = 0xff.toByte // height 65535
    big(sof + 7) = 0xff.toByte; big(sof + 8) = 0xff.toByte // width 65535
    Jpeg.decodeRgb(big) shouldBe None
    Jpeg.decodeRgb("not a jpeg at all".getBytes) shouldBe None
    Jpeg.decodeRgb(Array.emptyByteArray) shouldBe None
  }

  test("fuzz: truncation at every prefix length never throws") {
    val good = Jpeg.encode(16, 12, noisyPixel(9L), Array.emptyByteArray)
    for (n <- 0 until good.length) {
      val r = Jpeg.decodeRgb(good.take(n)) // must not throw
      r.foreach { case (w, h, rgb) => rgb.length shouldBe w * h }
    }
    // random single-byte corruption: no crash, either None or a
    // well-shaped (possibly wrong) image — never an exception
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Jpeg.decodeRgb(m).foreach { case (w, h, rgb) => rgb.length shouldBe w * h }
    }
  }
}
