package graft

import graft.multimodal.{Multimodal, Wav, WavPcm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real media decode: RIFF/WAVE PCM is parsed from raw bytes (no codec
  * library), verified byte-for-byte against generated files, and runs
  * through the Spark-side feature pipeline. De-stubs the decode stage
  * for one real container format (reference analog: the Flink app's
  * payload-opaque event stream; here the payload is actually decoded).
  */
class WavSpec extends AnyFunSuite with SparkSpec {

  private def sine(n: Int): Array[Short] =
    Array.tabulate(n)(i => (math.sin(i * 0.1) * 12000).toShort)

  test("wav round-trip: write → parse recovers header fields exactly") {
    val samples = sine(480)
    val bytes = Wav.writePcm16(samples, channels = 2, sampleRate = 8000)
    val parsed = Wav.parse(bytes)
    assert(parsed === Some(WavPcm(channels = 2, sampleRate = 8000,
      bitsPerSample = 16, dataOffset = 44, dataLength = 960)))
    assert(parsed.get.nSamples === 240) // per-channel frames
    assert(Wav.pcm16Samples(bytes).get.toSeq === samples.toSeq)
  }

  test("wav parse handles unknown chunks and rejects malformed input") {
    val base = Wav.writePcm16(sine(100), 1, 16000)
    // splice a LIST chunk (odd size → word-aligned skip) before "data"
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val p = Wav.parse(spliced).get
    assert(p.sampleRate === 16000 && p.dataLength === 200)
    assert(Wav.pcm16Samples(spliced).get.toSeq === sine(100).toSeq)

    assert(Wav.parse("not a wav at all".getBytes).isEmpty)
    assert(Wav.parse(base.take(20)).isEmpty)          // truncated header
    val nonPcm = base.clone(); nonPcm(20) = 3          // IEEE float format
    assert(Wav.parse(nonPcm).isEmpty)
    val overrun = base.clone()                         // data size > file
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 100000)
    assert(Wav.parse(overrun).isEmpty)

    // adversarial size fields: 0xFFFFFFF8 truncates to -8 as an Int —
    // must be rejected, not loop forever / yield negative lengths
    val negSize = base.clone()
    java.nio.ByteBuffer.wrap(negSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0xFFFFFFF8) // fmt chunk size
    assert(Wav.parse(negSize).isEmpty)
    val negData = base.clone()
    java.nio.ByteBuffer.wrap(negData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 0xFFFFFFF8) // data chunk size
    assert(Wav.parse(negData).isEmpty)
  }

  test("decodeFrame takes the real WAV path: frames are block-aligned sample spans") {
    val samples = sine(400) // 400 interleaved samples → 200 stereo blocks
    val bytes = Wav.writePcm16(samples, channels = 2, sampleRate = 8000)
    val nFrames = 4
    val frames = (0 until nFrames).map(f =>
      Multimodal.decodeFrame(bytes, f, nFrames))
    // frames concatenate to exactly the data chunk — decoded, no header
    assert(frames.map(_.length).sum === 800)
    assert(frames.flatten.toSeq === bytes.drop(44).toSeq)
    assert(frames.forall(_.length % 4 === 0)) // block-aligned
    // and differs from the stub fallback slicing (which keeps the header)
    assert(Multimodal.sliceFrame(bytes, 0, nFrames).toSeq !== frames.head.toSeq)
  }

  test("feature pipeline over real WAV payloads runs the decoded samples") {
    val wavs = (1L to 8L).map { id =>
      (id, Wav.writePcm16(sine(64 * id.toInt), 1, 8000), id.toInt % 3 + 1)
    }
    val df = spark.createDataFrame(wavs)
      .toDF("doc_id", "payload", "frames")
      .select(col("doc_id"), col("payload"),
        struct(length(col("payload")).as("n_bytes"), lit(0).as("width"),
          lit(0).as("height"), col("frames")).as("meta"))
    val feats = Multimodal.extractFeatures(df, batchSize = 3).collect()
    assert(feats.length === 8)
    // histogram equals the expected one over the DATA bytes only
    val expected = wavs.map { case (id, bytes, nf) =>
      id -> {
        val data = bytes.drop(44)
        val bins = new Array[Float](16)
        data.foreach(b => bins((b & 0xFF) >> 4) += 1f)
        bins.map(_ / data.length)
      }
    }.toMap
    feats.foreach { f =>
      val exp = expected(f.doc_id)
      // frame-mean of disjoint equal slices ≈ whole-data histogram only
      // when frames=1; for >1 frames just check normalization + support
      if (f.n_frames == 1)
        f.features.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
      assert(math.abs(f.features.sum - 1f) < 1e-4)
    }
  }
}
