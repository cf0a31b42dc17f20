package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over a document corpus.
  *
  * The classic iterative scheme (count adjacent symbol pairs weighted
  * by word frequency, merge the most frequent pair everywhere, repeat)
  * is made engine-exact the same way PageRank is (Graph.scala): a
  * FIXED merge budget, integer pair counts, and a deterministic
  * tie-break (count desc, then (lhs, rhs) lexicographic) mean two
  * engines running the same rounds land on the same merge table, so
  * the driver's hash oracle can gate an iterative induction exactly.
  *
  * The greedy leftmost-non-overlapping merge application is the one
  * genuinely order-sensitive step; it is expressed as a plain string
  * `replace` over a doubled-delimiter encoding: word "abc" is held as
  * "•a••b••c•" (each symbol wrapped in its own bullet pair), and
  * merging (a,b) is replace("•a••b•" -> "•ab•"). Because every symbol
  * carries its own delimiters, consecutive occurrences never share a
  * separator and the standard left-to-right replace semantics — which
  * Spark and DuckDB both implement — IS the greedy BPE merge. Pair
  * counting counts every adjacent position (overlaps included), the
  * standard get_stats contract.
  *
  * Scale shape: the corpus is read once into a word-frequency table
  * (one vocabulary shuffle); every round after that touches only that
  * table — a map-side pair explode, a (lhs,rhs)-keyed count shuffle, a
  * TakeOrdered(1) for the argmax, and a map-only broadcast apply. No
  * round re-reads corpus text, so cost is merges × O(vocab), not
  * merges × O(corpus). The per-round best row is localCheckpointed
  * (one-row frame) so the returned merge table holds no lineage into
  * the unpersisted intermediate word tables.
  *
  * Words are lowercased and restricted to /^[a-z]+$/ — BPE induction
  * normalizes its input by convention, and the restriction also
  * guarantees the bullet delimiter can never collide with a symbol.
  *
  * Contract: the corpus must contain at least `merges` distinct
  * adjacent pairs (any natural-language corpus does); otherwise later
  * rounds have no argmax and the merge table comes up short.
  */
object Bpe {

  /** Induce `merges` BPE merges from `docs(textCol)`. Returns one row
    * per round: (merge_round, lhs, rhs, merged, pair_count).
    */
  def vocab(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, "need at least one merge round")
    // loop-scoped, restored on exit: lets AQE right-size the stages
    // that read each round's pinned word table — the Graph.pageRank
    // finding; without it the 2×merges materializations (per-round
    // best checkpoint + next-words fill) each re-run wide 32-task
    // stages over a vocabulary-sized frame
    val spark = docs.sparkSession
    val ccKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val ccPrev = spark.conf.getOption(ccKey)
    spark.conf.set(ccKey, "true")
    try vocabImpl(docs, textCol, merges)
    finally ccPrev match {
      case Some(v) => spark.conf.set(ccKey, v)
      case None => spark.conf.unset(ccKey)
    }
  }

  private def vocabImpl(docs: DataFrame, textCol: String,
                        merges: Int): DataFrame = {
    // corpus -> word-frequency table, symbols pre-wrapped: "ab" ->
    // "•a••b•". regexp_replace of every char with •c• builds the
    // doubled-delimiter form in one codegen'd pass, no char split.
    val words0 = docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("word"), "(.)", "•$1•").as("w"),
        col("freq"))

    var words = words0.persist()
    words.count() // eager fill: every round reuses this frame twice
    val merged = ArrayBuffer.empty[DataFrame]
    for (round <- 1 to merges) {
      val syms = split(trim(col("w"), "•"), "••")
      val m = greatest(size(syms) - 1, lit(0))
      val pairs = zip_with(slice(syms, lit(1), m), slice(syms, lit(2), m),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))
      // eager localCheckpoint: cuts the logical lineage into `words`
      // each round — without it the per-round plans nest one another
      // and the final union's serialized plan grows 2^rounds (OOMs
      // the driver). One extra one-row job per round; a lazy
      // checkpoint measures no faster (the broadcast build triggers
      // it as its own job either way)
      val best = words
        .select(col("freq"), explode(pairs).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .localCheckpoint(true)
      merged += best.select(lit(round).as("merge_round"), col("lhs"),
        col("rhs"), concat(col("lhs"), col("rhs")).as("merged"),
        col("pair_count"))
      if (round < merges) {
        val next = words.crossJoin(broadcast(best))
          .select(expr("replace(w, concat('•', lhs, '••', rhs, '•')," +
              " concat('•', lhs, rhs, '•'))").as("w"),
            col("freq"))
          .persist()
        next.count()
        words.unpersist(blocking = false)
        words = next
      }
    }
    words.unpersist(blocking = false)
    merged.reduce(_ unionAll _)
  }
}
