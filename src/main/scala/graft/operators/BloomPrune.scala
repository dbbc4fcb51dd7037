package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning: shrink the shuffled side of a
  * selective join BEFORE the exchange.
  *
  * When `large ⋈ small` keeps only a small fraction of `large` (a
  * selective dimension filter, an id allowlist), the plain plan still
  * shuffles every large-side row. Building a Bloom filter over the
  * small side's keys (one aggregate on the already-small side) and
  * filtering the large side with it turns the exchange input into
  * ~(matching rows + false positives): with fpp = 1% the shuffle
  * carries ≈1% of the non-matching volume. Spark's own runtime-filter
  * rewrite (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies
  * the same idea automatically for some shapes; this operator is the
  * explicit form that works regardless of plan shape and makes the
  * trade visible and testable.
  *
  * The sketch is built by Spark's native `BloomFilterAggregate` — the
  * same expression the runtime-filter rewrite injects — so the build is
  * a distributed partial/final aggregate, and it rides the probe plan
  * as a SCALAR SUBQUERY (`BloomFilterMightContain(ScalarSubquery(agg),
  * key)`) — bit-for-bit the plan shape Spark's own
  * `InjectRuntimeFilter` emits. Nothing executes at construction time
  * (the old form ran the aggregate eagerly and embedded the serialized
  * sketch as a plan LITERAL — fine to tens of MB, but plan size scaled
  * with `numBits`); the subquery executes once at runtime, its 1-row
  * binary result is injected into the codegen'd predicate, and the
  * probe stays inside the large side's WholeStageCodegen span. The
  * join afterwards is UNCHANGED — false positives are eliminated by
  * the real equi-join, so the result set is row-identical to the
  * unpruned join (pinned by BloomPruneSpec).
  */
object BloomPrune {

  /** `large` reduced to rows whose long-typed `key` might be in
    * `small`'s key set (no false negatives — safe to join afterwards).
    *
    * `buildParallelism` bounds the PARTIAL-sketch count of the build
    * aggregate: its final merge is ONE task ORing
    * partials × numBits/8 bytes, which silently serializes when the
    * build side arrives in many partitions with a wide sketch (the
    * 100× decontamination probe measured a 15.2 s single-task stage —
    * 400 partials × 20 MB = 8 GB through one reducer). The default
    * caps the merge input at ~512 MB by projecting the build side to
    * the key column and repartitioning it to `parts` before the
    * aggregate: the repartition is a real exchange, but it carries ONLY
    * the (long-castable) key column, and — unlike a coalesce, which
    * inserts no stage boundary — it leaves the parallelism of the
    * build side's own derivation (scans, filters, joins upstream of
    * `small`) untouched. Pass an explicit value to override — on a
    * large cluster more partials buy build parallelism at merge cost,
    * and the right balance is sketch-size-dependent, so the knob is
    * exposed rather than guessed. Results are row-identical either
    * way (the sketch is a commutative OR). */
  def pruneLarge(
      large: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01,
      buildParallelism: Int = 0): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // default target: enough partials to keep the merge input under
    // ~512 MB, but never MORE partitions than the session's shuffle
    // width — with a narrow sketch the memory bound alone would compute
    // millions of useless partitions (the repartition would spawn that
    // many empty tasks; the 512 MB bound is an upper cap on partials,
    // not a parallelism request)
    val parts =
      if (buildParallelism > 0) buildParallelism
      else math.min(
        small.sparkSession.sessionState.conf.numShufflePartitions.toLong,
        math.max(8L, (512L << 20) / math.max(1L, numBits / 8))).toInt
    val sketchCol = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(col(key).cast("long")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    // the build is a non-correlated scalar subquery: planned as one
    // distributed aggregate, executed once at runtime, result injected
    // into the predicate — plan size independent of numBits, no eager
    // driver round-trip at construction time
    val aggPlan = small.select(col(key)).repartition(parts)
      .agg(sketchCol.as("bf"))
      .queryExecution.analyzed
    val mightContain = ColumnBridge.column(
      new BloomFilterMightContain(
        ScalarSubquery(aggPlan),
        ColumnBridge.expression(col(key).cast("long"))))
    large.filter(mightContain)
  }

  /** Inner equi-join with the large side Bloom-pruned pre-shuffle.
    * Row-identical to `large.join(small, key)`. */
  def prunedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame =
    pruneLarge(large, small, key, expectedItems, fpp).join(small, key)
}
