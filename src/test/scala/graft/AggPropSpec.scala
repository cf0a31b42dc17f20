package graft

import graft.functions.TopKAgg
import graft.multimodal.Wav
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure ScalaCheck properties (no Spark session): the bounded top-k
  * aggregate must equal sort-and-take under ANY partitioning/merge
  * tree, and the WAV writer/parser must round-trip arbitrary PCM.
  */
object AggPropSpec extends Properties("AggKernels") {

  private val rows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    scores <- Gen.listOfN(n, Gen.choose(-50L, 50L))
  } yield scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }

  private def reference(xs: List[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.sortBy { case (s, p) => (-s, p) }.take(k)

  property("topK == sort.take(k) under any split + merge tree") =
    forAll(rows, Gen.choose(1, 7), Gen.choose(1, 5)) { (xs, k, nSplits) =>
      val agg = TopKAgg(k)
      // partition rows round-robin into nSplits partial buffers,
      // reduce each, then fold-merge — the shape Spark's partial/final
      // aggregation takes, for an arbitrary split
      val partials = xs.zipWithIndex.groupBy(_._2 % nSplits).values
        .map(part => part.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == reference(xs, k)
    }

  property("KmvAgg == distinct.sorted.take(k) under any split + " +
      "merge tree (duplicates never occupy slots)") =
    forAll(rows, Gen.choose(1, 7), Gen.choose(1, 5)) { (xs, k, nSplits) =>
      val agg = graft.functions.KmvAgg(k)
      // duplicate-heavy value stream: reuse scores (range -50..50) so
      // collisions are common — the dedup property under test
      val vals = xs.map(_._1)
      val partials = vals.zipWithIndex.groupBy(_._2 % nSplits).values
        .map(part => part.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == vals.distinct.sorted.take(k)
    }

  private val skewedStream: Gen[List[String]] = for {
    nHeavy <- Gen.choose(0, 3)
    reps <- Gen.listOfN(nHeavy, Gen.choose(20, 60))
    tail <- Gen.choose(0, 200)
  } yield reps.zipWithIndex.flatMap { case (r, i) =>
    List.fill(r)(s"h$i")
  } ++ (1 to tail).map(i => s"t$i").toList

  property("Misra-Gries keeps every item above n/(cap+1) under any " +
      "shuffle, split, and merge tree; buffer stays bounded") =
    forAll(skewedStream, Gen.choose(1, 8), Gen.choose(1, 5),
      Gen.long) { (xs0, cap, nSplits, seed) =>
      val xs = new scala.util.Random(seed).shuffle(xs0)
      val agg = graft.operators.MisraGriesAgg(cap)
      val partials = xs.zipWithIndex.groupBy(_._2 % nSplits).values
        .map(part => part.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      val out = agg.finish(merged).toSet
      val n = xs.length
      val exact = xs.groupBy(identity).map { case (t, l) => t -> l.size }
      out.size <= cap && exact.forall { case (tok, cnt) =>
        cnt.toLong * (cap + 1) <= n.toLong || out(tok)
      }
    }

  private val pcm: Gen[(Array[Short], Int, Int)] = for {
    n <- Gen.choose(0, 400)
    samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    channels <- Gen.choose(1, 4)
    rate <- Gen.oneOf(8000, 16000, 44100)
  } yield (samples.map(_.toShort).toArray, channels, rate)

  property("wav write → parse → samples round-trips any PCM") =
    forAll(pcm) { case (samples, channels, rate) =>
      val bytes = Wav.writePcm16(samples, channels, rate)
      val parsed = Wav.parse(bytes)
      val back = Wav.pcm16Samples(bytes)
      parsed.exists(p => p.channels == channels && p.sampleRate == rate &&
        p.bitsPerSample == 16 && p.dataLength == samples.length * 2) &&
        back.exists(_.sameElements(samples))
    }
}
