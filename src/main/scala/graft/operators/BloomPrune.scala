package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * The filter is consulted via `DataFrameStatFunctions.bloomFilter`
  * (a driver-built, task-broadcast sketch — O(bits) driver memory,
  * bounded by `expectedItems` and `fpp`). The join afterwards is
  * UNCHANGED — false positives are eliminated by the real equi-join,
  * so the result set is row-identical to the unpruned join (pinned by
  * BloomPruneSpec).
  */
object BloomPrune {

  /** `large` reduced to rows whose long-typed `key` might be in
    * `small`'s key set (no false negatives — safe to join afterwards). */
  def pruneLarge(
      large: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(key, expectedItems, fpp)
    val bloomBc = large.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bloomBc.value.mightContainLong(k))
    large.filter(mightContain(col(key)))
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
