package graft

import graft.multimodal.{Bmp, Multimodal, Video}
import org.scalatest.funsuite.AnyFunSuite

class VideoSpec extends AnyFunSuite with SparkSpec {

  private def frame(seed: Int): Array[Byte] =
    Bmp.write(4, 2, (x, y) => (seed + x, seed + y, seed))

  test("container round-trips frame bytes through the index") {
    val frames = Seq(frame(10), frame(60), frame(110))
    val container = Video.write(frames)
    val idx = Video.parseIndex(container).get
    assert(idx.length === 3)
    idx.zip(frames).foreach { case (e, f) =>
      assert(Video.frameBytes(container, e).sameElements(f))
    }
    // every recovered frame still decodes as a valid BMP
    idx.foreach(e => assert(Video.frameBytes(container, e)
      .pipe(Bmp.parse).isDefined))
  }

  test("malformed containers are rejected, not mis-read") {
    val good = Video.write(Seq(frame(1), frame(2)))
    assert(Video.parseIndex("BAD!".getBytes ++ good.drop(4)).isEmpty)
    assert(Video.parseIndex(good.take(good.length - 3)).isEmpty,
      "truncated final frame must fail the index walk")
    val negCount = good.clone()
    negCount(4) = -1 // int32 LE frame count -> negative
    negCount(5) = -1; negCount(6) = -1; negCount(7) = -1
    assert(Video.parseIndex(negCount).isEmpty)
    assert(Video.parseIndex(Array.emptyByteArray).isEmpty)
  }

  test("stride sampling decodes ceil(n/stride) frames with exact sums") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(0L, 3L, 7L).toDF("doc_id")
    val got = Multimodal.videoFeatures(docs, "doc_id", stride = 2)
      .collect().map(v => v.doc_id -> v).toMap
    (Seq(0L, 3L, 7L)).foreach { id =>
      val n = 4 + id % 5
      assert(got(id).n_frames === n)
      assert(got(id).n_sampled === (n + 1) / 2)
      // closed-form recompute of the sampled frames' red channel
      val expR = (0L until n).filter(_ % 2 == 0).flatMap(f =>
        for (x <- 0 until 16; y <- 0 until 8)
          yield (id * 31 + f * 41 + x * 7 + y * 13) % 256).sum
      assert(got(id).sum_r === expR)
    }
    // stride 1 samples every frame and can only add to the sums
    val all = Multimodal.videoFeatures(docs, "doc_id", stride = 1)
      .collect().map(v => v.doc_id -> v).toMap
    assert(all(3L).n_sampled === got(3L).n_frames)
    assert(all(3L).sum_r > got(3L).sum_r)
  }

  implicit private class Piped[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
