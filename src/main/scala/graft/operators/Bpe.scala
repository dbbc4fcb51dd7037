package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge training over a word-frequency vocabulary —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et al.,
  * ACL'16), distributed the way published trainers actually run: merges
  * are learned from the WORD-FREQUENCY table (one corpus-sized shuffle,
  * once), after which every iteration is one aggregate over the
  * vocabulary — |vocab| ≪ corpus at any scale.
  *
  * Portable-by-construction representation: a word's symbol sequence is
  * its DOUBLE-space-joined symbols with two leading and two trailing
  * spaces (`"  h  a  s  h  "`). Merging pair `(a, s)` is then ONE
  * literal string replace of `" a  s "` with `" as "`: the pattern's
  * single-space edges consume one space from each two-space boundary,
  * and the replacement restores them, so the two-space invariant is
  * preserved and — crucially — consecutive occurrences never compete
  * for a shared boundary character. A leftmost-greedy replace over this
  * representation IS the canonical left-to-right non-overlapping merge
  * fold, self-pairs included: `"  a  a  a  a  a  "` under merge
  * `(a, a)` → `"  aa  aa  a  "`, exactly the `[aa, aa, a]` the fold
  * produces (a single-space representation cannot do this in any fixed
  * number of passes — the consumed boundary shifts later matches within
  * a run, yielding `[aa, a, aa]`). Both Spark and DuckDB `replace` are
  * leftmost-greedy, so the oracle re-derives training bit-for-bit.
  * Symbols never contain spaces, so a space-delimited pattern cannot
  * match across symbol boundaries.
  *
  * Per iteration: adjacent-pair extraction is a row-local lambda over
  * the symbol array; the weighted pair count is one partial+final
  * aggregate; the argmax is `orderBy(..).limit(1)` — planned as
  * TakeOrderedAndProject (per-partition 1-row heaps, never a global
  * sort) — and the single winning row is the ONLY driver state
  * (`O(iterations)` total, the same bounded-scalar pattern as the IVF
  * centroid seed). Ties break on the pair string ascending —
  * deterministic in any engine.
  */
object Bpe {

  /** One merge learned at `iteration`: `pair` ("a s") collapses into
    * `merged` ("as") with corpus-weighted occurrence count `weight`. */
  final case class Merge(
      iteration: Long, pair: String, merged: String, weight: Long)

  /** (word, freq) vocabulary of a documents frame — the one
    * corpus-sized pass; everything after runs at |vocab|. */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** `"  h  a  s  h  "` — char symbols, double-space-joined,
    * double-space-padded (see the object scaladoc for why two). */
  private def charSyms(word: Column): Column =
    concat(lit("  "),
      concat_ws("  ", filter(split(word, ""), s => length(s) > 0)),
      lit("  "))

  /** All adjacent symbol pairs (with multiplicity) as `"a s"` strings;
    * empty for single-symbol words (never a descending `sequence`). */
  private val adjacentPairs: Column = {
    val pairs = expr(
      "transform(sequence(1, size(_s) - 1), " +
        "i -> concat(element_at(_s, i), ' ', element_at(_s, i + 1)))")
    when(size(col("_s")) >= 2, pairs).otherwise(array())
  }

  private def applyMerge(syms: Column, m: Merge): Column = {
    // " a  s " → " as ": one pass; each match keeps one space of both
    // two-space boundaries, so runs of a self-pair merge left-to-right
    // without the consumed-boundary shift (see the object scaladoc)
    val pat = lit(" " + m.pair.replace(" ", "  ") + " ")
    val rep = lit(s" ${m.merged} ")
    replace(syms, pat, rep)
  }

  /** Learn `iterations` merges from `vocab` (word, freq). */
  def train(vocab: DataFrame, iterations: Int): Seq[Merge] = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    // Each iteration runs ONE job: the argmax aggregate, whose scan is
    // also what materializes the current round's persisted vocabulary
    // (the first action on a persisted frame populates its cache, and
    // the aggregate reads every partition). The former explicit
    // `count()` per round was a second materialization-only job — and
    // it also paid for applying the LAST merge to the vocabulary,
    // which no caller reads (train returns only the merge table). The
    // parent round's cache is released only AFTER the child's argmax
    // has populated the child's cache, so the child computes from
    // cached parent partitions, never from the re-derived base plan.
    var words = vocab
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var prev: Option[DataFrame] = None
    var it = 1L
    var done = false
    while (it <= iterations && !done) {
      val top = words
        .select(col("freq"), split(trim(col("syms")), "  ").as("_s"))
        .select(col("freq"), explode(adjacentPairs).as("pair"))
        .groupBy("pair").agg(sum("freq").as("w"))
        .orderBy(col("w").desc, col("pair"))
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = None
      if (top.isEmpty) done = true
      else {
        val m = Merge(it, top(0).getString(0),
          top(0).getString(0).replace(" ", ""), top(0).getLong(1))
        merges += m
        val next = words
          .withColumn("syms", applyMerge(col("syms"), m))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(words)
        words = next
        it += 1
      }
    }
    prev.foreach(_.unpersist())
    words.unpersist()
    merges.result()
  }

  /** Segment `vocab` with an already-learned merge list: one chained
    * row-local replace per merge — one scan, no shuffle, whatever the
    * corpus size. Output `segmented` is single-space-joined (the
    * internal double-space delimiters are collapsed for the caller). */
  def segment(vocab: DataFrame, merges: Seq[Merge]): DataFrame = {
    val syms = merges.foldLeft(charSyms(col("word")))(applyMerge)
    // inner delimiters are exactly two spaces (invariant), so the
    // collapse is a plain replace, not a regex
    vocab.select(col("word"), col("freq"),
        replace(trim(syms), lit("  "), lit(" ")).as("segmented"))
      .withColumn("n_symbols", size(split(col("segmented"), " ")))
  }
}
