package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{ImageHash, Media}

/** dHash invariance contracts (the q_dedup_image_dhash rung's
  * machinery): codec-independence (BMP and PNG of the same pixels hash
  * equal), order-preserving-transform invariance (brightness shift,
  * contrast scale), discrimination (a transform that REORDERS cell
  * means flips bits), grid-refusal for undersized images, and a
  * hand-computed tiny case pinning the bit layout.
  */
class ImageHashSpec extends AnyFunSuite with Matchers {

  private def px(f: (Int, Int) => Int)(x: Int, y: Int): (Int, Int, Int) = {
    val v = f(x, y); (v, v, v)
  }

  // an arbitrary (NOT cell-constant) pixel field
  private def arb(x: Int, y: Int): Int = (x * 37 + y * 101 + (x * y) % 13) % 200

  test("BMP and PNG of the same pixels hash identically (codec independence)") {
    val (w, h) = (20, 16)
    val bmp = Media.bmpContainer(w, h, px(arb), Array.emptyByteArray)
    val png = Media.pngPixelContainer(w, h, px(arb), Array.emptyByteArray)
    val hb = ImageHash.dhashBmp(bmp).get
    val hp = ImageHash.dhashPng(png).get
    hb shouldBe hp
    hb._3.length shouldBe 64
    hb._3.forall(c => c == '0' || c == '1') shouldBe true
  }

  test("order-preserving transforms leave a cell-constant image's hash unchanged; " +
      "a reordering transform flips it") {
    val (w, h) = (13, 9)
    def cellVal(x: Int, y: Int): Int = {
      val ci = x * 9 / w; val cj = y * 8 / h
      (7 * (1 + ci + 9 * cj) + 31 * ci + 57 * cj) % 128
    }
    val base = ImageHash.dhashBmp(
      Media.bmpContainer(w, h, px(cellVal), Array.emptyByteArray)).get._3
    val bright = ImageHash.dhashBmp(
      Media.bmpContainer(w, h, px((x, y) => cellVal(x, y) + 64), Array.emptyByteArray)).get._3
    val contrast = ImageHash.dhashPng(
      Media.pngPixelContainer(w, h, px((x, y) => cellVal(x, y) * 3 / 2),
        Array.emptyByteArray)).get._3
    bright shouldBe base
    contrast shouldBe base
    // inversion reverses every strict comparison: a different image
    // must get a different hash (discrimination, not just recall)
    val inverted = ImageHash.dhashBmp(
      Media.bmpContainer(w, h, px((x, y) => 127 - cellVal(x, y)), Array.emptyByteArray)).get._3
    inverted should not be base
  }

  test("images smaller than the sampling grid are refused") {
    ImageHash.dhashBmp(Media.bmpContainer(8, 8, px(arb), Array.emptyByteArray)) shouldBe None
    ImageHash.dhashBmp(Media.bmpContainer(9, 7, px(arb), Array.emptyByteArray)) shouldBe None
    ImageHash.dhashBmp(Media.bmpContainer(9, 8, px(arb), Array.emptyByteArray)).isDefined shouldBe true
  }

  test("hand-computed 9x8 case pins the bit layout (row-major, left>right)") {
    // 9x8 image: one pixel per grid cell; luminance 3*v with
    // v(x, y) = x when y even else 8 - x. Row j even: strictly
    // increasing -> every left>right bit is 0; row j odd: strictly
    // decreasing -> every bit 1.
    val bmp = Media.bmpContainer(9, 8,
      px((x, y) => if (y % 2 == 0) x else 8 - x), Array.emptyByteArray)
    val (w, h, hash) = ImageHash.dhashBmp(bmp).get
    w shouldBe 9
    h shouldBe 8
    hash shouldBe ("00000000" + "11111111") * 4
  }

  test("garbage bytes are refused, not fatal") {
    ImageHash.dhashBmp(Array[Byte](1, 2, 3)) shouldBe None
    ImageHash.dhashPng(Array[Byte](1, 2, 3)) shouldBe None
  }
}
