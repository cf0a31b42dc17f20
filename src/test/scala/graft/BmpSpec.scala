package graft

import graft.multimodal.{Bmp, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class BmpSpec extends AnyFunSuite with SparkSpec {

  private def pat(x: Int, y: Int): (Int, Int, Int) =
    ((x * 50 + y) % 256, (y * 80 + x) % 256, (x + y * 3) % 256)

  test("BMP round trip is pixel-exact, including stride padding") {
    // width 3 → 9 data bytes padded to a 12-byte stride
    val bytes = Bmp.write(3, 2, pat)
    assert(Bmp.rowStride(3) === 12)
    assert(bytes.length === 54 + 12 * 2)
    val img = Bmp.parse(bytes).get
    assert(img.width === 3 && img.height === 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(img.pixel(x, y) === pat(x, y), s"pixel ($x,$y)")
  }

  test("BMP parser rejects malformed payloads instead of throwing") {
    val ok = Bmp.write(4, 4, pat)
    assert(Bmp.parse(ok).isDefined)
    assert(Bmp.parse(Array.empty[Byte]).isEmpty)
    assert(Bmp.parse(ok.take(53)).isEmpty) // truncated header
    assert(Bmp.parse(ok.dropRight(1)).isEmpty) // truncated pixel data
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    assert(Bmp.parse(badMagic).isEmpty)
    val bpp8 = ok.clone(); bpp8(28) = 8.toByte
    assert(Bmp.parse(bpp8).isEmpty)
    val compressed = ok.clone(); compressed(30) = 1.toByte // BI_RLE8
    assert(Bmp.parse(compressed).isEmpty)
    val text = "not a bitmap at all, just bytes".getBytes("UTF-8")
    assert(Bmp.parse(text).isEmpty)
  }

  test("decodeFrame takes the real BMP path: top-down RGB bands") {
    val bytes = Bmp.write(2, 4, pat)
    // 2 frames over 4 rows → 2-row bands of 2 px × 3 channels
    val f0 = Multimodal.decodeFrame(bytes, 0, 2)
    val f1 = Multimodal.decodeFrame(bytes, 1, 2)
    assert(f0.length === 12 && f1.length === 12)
    def rgbAt(f: Array[Byte], i: Int) =
      (f(i * 3) & 0xFF, f(i * 3 + 1) & 0xFF, f(i * 3 + 2) & 0xFF)
    assert(rgbAt(f0, 0) === pat(0, 0)) // band 0 starts at the TOP row
    assert(rgbAt(f0, 1) === pat(1, 0))
    assert(rgbAt(f0, 2) === pat(0, 1))
    assert(rgbAt(f1, 0) === pat(0, 2)) // band 1 = rows 2-3
    assert(rgbAt(f1, 3) === pat(1, 3))
  }

  test("resize takes the real image path for BMP payloads") {
    // 2×2 checkerboard upsampled 2× by nearest neighbor: each source
    // pixel becomes a 2×2 block in the output image
    val board = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0),
      (0, 1) -> (0, 0, 255), (1, 1) -> (255, 255, 0))
    val src = Bmp.write(2, 2, (x, y) => board((x, y)))
    val out = Multimodal.resizeBytes(src, 4, 4)
    val img = Bmp.parse(out).get // output is itself a valid BMP
    assert(img.width === 4 && img.height === 4)
    for (x <- 0 until 4; y <- 0 until 4)
      assert(img.pixel(x, y) === board((x / 2, y / 2)), s"pixel ($x,$y)")
    // non-image payloads keep the documented byte-striding fallback
    val raw = Multimodal.resizeBytes("plain text bytes".getBytes, 4, 4)
    assert(raw.length === 16 && Bmp.parse(raw).isEmpty)
  }

  test("imageFeatures round trip matches a direct pattern fold") {
    import spark.implicits._
    val got = Multimodal.imageFeatures(
        Seq(7L).toDF("doc_id"), "doc_id", width = 24, height = 16)
      .collect().head
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (x <- 0 until 24; y <- 0 until 16) {
      sr += (7L * 31 + x * 7 + y * 13) % 256
      sg += (7L * 17 + x * 11 + y * 5) % 256
      sb += (7L * 23 + x * 3 + y * 19) % 256
    }
    assert(got === Multimodal.ImageFeatures(7L, 24, 16, sr, sg, sb))
  }
}
