package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal length-prefixed frame container (`GVID`): the video layout
  * for frame-sampling pipelines. Real video codecs aren't in this
  * container image (C13's stub policy covers MP4/JPEG), but the
  * PIPELINE mechanics are real: an index of length-prefixed frames
  * lets a reader seek to frame k without touching frames 0..k-1, so
  * stride sampling pays decode cost proportional to frames KEPT, not
  * frames stored — the property that matters when a 100 TB corpus
  * holds hours of video per row and training wants 1 fps.
  *
  * Layout: 'G''V''I''D' | int32LE nFrames | nFrames × (int32LE len |
  * frame bytes). Frames here are 24-bit BMPs ([[Bmp]]), each
  * independently decodable.
  */
object Video {

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  def write(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** The frame index — (offset, length) per frame — WITHOUT reading
    * any frame body. None on a malformed container (bad magic,
    * truncated index, frame running past the buffer).
    */
  def parseIndex(bytes: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    if (bytes.length < 8 || !bytes.take(4).sameElements(Magic)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(4)
    val n = buf.getInt
    if (n < 0) return None
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var off = 8
    var i = 0
    while (i < n) {
      if (off + 4 > bytes.length) return None
      val len = buf.getInt(off)
      if (len < 0 || off + 4 + len > bytes.length) return None
      out += ((off + 4, len))
      off += 4 + len
      i += 1
    }
    Some(out.result())
  }

  /** One frame's bytes by index entry — an array slice, no decode. */
  def frameBytes(bytes: Array[Byte], entry: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, entry._1, entry._1 + entry._2)
}
