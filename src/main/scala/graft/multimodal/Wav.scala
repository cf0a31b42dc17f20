package graft.multimodal

/** Parsed RIFF/WAVE PCM header and the location of the data chunk
  * inside the original byte array.
  */
case class WavPcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                  dataOffset: Int, dataLength: Int) {
  def bytesPerSample: Int = bitsPerSample / 8
  def nSamples: Int = dataLength / math.max(1, bytesPerSample * channels)
}

/** Pure-JVM RIFF/WAVE PCM decoder — a REAL media decode path (no
  * codec library needed: WAV PCM is headers + raw little-endian
  * samples). Non-WAV payloads fall back to [[Multimodal.decodeFrame]]'s
  * deterministic stand-in, so this is the format that de-stubs the
  * decode stage end-to-end.
  *
  * Reference header layout: RIFF chunk descriptor (bytes 0-11),
  * then a sequence of sub-chunks, each `id(4) | size(LE u32) | body`;
  * "fmt " carries audioFormat/channels/sampleRate/bitsPerSample,
  * "data" carries the samples.
  */
object Wav {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a PCM WAV header; None for anything that is not a
    * well-formed RIFF/WAVE with PCM (format code 1) "fmt " and
    * "data" chunks.
    */
  def parse(bytes: Array[Byte]): Option[WavPcm] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None     // offset, length
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      // u32 size stays a Long until bounds-checked: truncating first
      // lets a crafted size (e.g. 0xFFFFFFF8 → -8) pass the check as a
      // negative Int, wedging the loop / producing negative lengths
      val sizeL = u32(bytes, off + 4)
      val body = off + 8
      if (body.toLong + sizeL > bytes.length) return None
      val size = sizeL.toInt // safe: ≤ bytes.length here
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = u16(bytes, body)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((u16(bytes, body + 2), u32(bytes, body + 4).toInt,
            u16(bytes, body + 14)))
        case "data" =>
          data = Some((body, size))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off = body + size + (size & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt; (doff, dlen) <- data)
      yield WavPcm(ch, rate, bits, doff, dlen)
  }

  /** Interleaved 16-bit PCM samples (all channels), little-endian. */
  def pcm16Samples(bytes: Array[Byte]): Option[Array[Short]] =
    parse(bytes).filter(_.bitsPerSample == 16).map { w =>
      val n = w.dataLength / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = u16(bytes, w.dataOffset + 2 * i).toShort
        i += 1
      }
      out
    }

  /** Serialize 16-bit PCM samples into a canonical 44-byte-header WAV
    * — the generator counterpart of [[parse]], used to round-trip in
    * tests and to synthesize payloads.
    */
  def writePcm16(samples: Array[Short], channels: Int,
                 sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
