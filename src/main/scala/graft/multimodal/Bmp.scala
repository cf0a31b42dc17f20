package graft.multimodal

/** A parsed 24-bit uncompressed BMP: dimensions plus the location of
  * the (bottom-up, 4-byte-row-aligned) pixel data inside `bytes`.
  */
case class BmpImage(width: Int, height: Int, dataOffset: Int,
                    rowStride: Int, bytes: Array[Byte]) {
  /** Pixel (x, y) with y = 0 the TOP row, as (r, g, b). BMP stores
    * rows bottom-up and channels in BGR order.
    */
  def pixel(x: Int, y: Int): (Int, Int, Int) = {
    val o = dataOffset + (height - 1 - y) * rowStride + x * 3
    (bytes(o + 2) & 0xFF, bytes(o + 1) & 0xFF, bytes(o) & 0xFF)
  }
}

/** Pure-JVM BMP (Windows DIB) codec for the uncompressed 24-bit
  * BI_RGB form — like RIFF/WAVE ([[Wav]]), this format is headers +
  * raw little-endian payload, so real decode needs no codec library.
  * Parsing is defensive: malformed magic, header size, bit depth,
  * compression flag, non-positive dimensions, or pixel data
  * overrunning the buffer all return None rather than throw.
  */
object Bmp {
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xFF).toByte
    b(o + 1) = ((v >> 8) & 0xFF).toByte
    b(o + 2) = ((v >> 16) & 0xFF).toByte
    b(o + 3) = ((v >> 24) & 0xFF).toByte
  }

  def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Parse a BITMAPFILEHEADER + BITMAPINFOHEADER 24-bpp BI_RGB image. */
  def parse(bytes: Array[Byte]): Option[BmpImage] = {
    if (bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val dataOffset = u32(bytes, 10)
    if (u32(bytes, 14) < 40) return None // header size
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    if (width <= 0 || height <= 0) return None
    if (u16(bytes, 26) != 1) return None // planes
    if (u16(bytes, 28) != 24) return None // bits per pixel
    if (u32(bytes, 30) != 0L) return None // BI_RGB only
    val stride = rowStride(width)
    if (dataOffset < 54 ||
      dataOffset + stride.toLong * height > bytes.length) return None
    Some(BmpImage(width, height, dataOffset.toInt, stride, bytes))
  }

  /** Serialize top-down RGB pixels (function of (x, y) with y = 0 the
    * top row) into a 24-bit BI_RGB BMP byte array.
    */
  def write(width: Int, height: Int,
            rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = rowStride(width)
    val out = new Array[Byte](54 + stride * height)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putU32(out, 2, out.length.toLong) // file size
    putU32(out, 10, 54L) // pixel data offset
    putU32(out, 14, 40L) // BITMAPINFOHEADER size
    putU32(out, 18, width.toLong)
    putU32(out, 22, height.toLong)
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bpp
    putU32(out, 30, 0L) // BI_RGB
    putU32(out, 34, (stride * height).toLong) // image size
    var y = 0
    while (y < height) {
      val rowO = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(rowO + x * 3) = b.toByte
        out(rowO + x * 3 + 1) = g.toByte
        out(rowO + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
