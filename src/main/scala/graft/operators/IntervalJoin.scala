package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlap (interval) join WITHOUT an equi key, by temporal binning.
  *
  * `r_join_range` scales because its range predicate rides an equi
  * anchor (`user_id`) — the hash join does the heavy lifting and the
  * range is a residual filter. When there is NO natural anchor
  * ("which ad impressions overlapped any outage window", "which spans
  * intersect in a document timeline"), Spark plans a raw
  * `a.s < b.e AND b.s < a.e` join as BroadcastNestedLoop or Cartesian
  * — O(|A|·|B|) and a guaranteed scale-killer.
  *
  * The classic fix (the partition-based interval join of temporal
  * databases, the same scheme DuckDB's IEJoin and pgRouting's overlap
  * operators bucket with) is to MANUFACTURE the equi key:
  *
  *  - pick a bin width `W`;
  *  - explode each interval `[s, e)` to every bin it touches
  *    (`floor(s/W) .. floor((e-1)/W)` — fan-out `len/W + 1`, codegen'd
  *    `sequence` + `explode`, no shuffle of its own);
  *  - hash-join on the bin id with the true overlap predicate as a
  *    residual filter;
  *  - emit each qualifying pair EXACTLY ONCE without a dedup shuffle:
  *    a pair that overlaps does so in the bin containing
  *    `max(s1, s2)` (the overlap's first instant), so
  *    `bin == floor(greatest(s1, s2) / W)` claims it there and nowhere
  *    else.
  *
  * Cost model: the join input is `Σ len_i / W` exploded rows per side
  * and each bin's candidate set is (rows alive in that W-window)² —
  * `W` trades fan-out (small W → more exploded copies) against
  * residual-filter waste (large W → more non-overlapping candidates
  * meet in a bin). `W ≈ the typical interval length` keeps fan-out
  * ~2× and candidates near-minimal; a pathologically dense bin is a
  * skewed join key, which AQE's skew-join split handles because this
  * IS a plain shuffled hash/sort-merge equi-join. Nothing here is
  * all-pairs: 100 TB of intervals joins in `O(input + output)` like
  * every other pairing operator in this engine.
  *
  * Bounds are LONGS in caller units (epoch seconds, token offsets —
  * anything affine). Intervals are half-open `[s, e)`, `e > s`;
  * overlap = `s1 < e2 AND s2 < e1`. Half-open is the contract that
  * makes back-to-back intervals (`[0,10) [10,20)`) NOT overlap.
  */
object IntervalJoin {

  /** Floor division of a LONG column by a positive long width, in pure
    * long arithmetic. `floor(c / w)` would route through a double
    * divide and can misassign bins for |c| > 2^53 (the mantissa
    * limit), breaking both overlap matching and the exactly-once bin
    * claim; here `c - pmod(c, w)` is an exact multiple of w (pmod is
    * non-negative), so the integral `div` truncation IS the floor.
    * Remaining precondition: c > Long.MinValue + w (the subtraction
    * would wrap at the very bottom of the long range). */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  private def explodeBins(
      df: DataFrame, s: String, e: String, w: Long): DataFrame =
    df
      // an empty half-open interval [s, s) overlaps nothing — and it
      // must be dropped BEFORE the explode, because sequence(a, b)
      // auto-steps -1 when a > b and would fabricate descending bins
      .filter(col(e) > col(s))
      .withColumn(
        "__bin",
        explode(sequence(
          floorDiv(col(s), w),
          floorDiv(col(e) - 1, w))))

  /** All (left, right) pairs whose half-open intervals overlap.
    *
    * Column names must be disjoint between the two sides (standard
    * for the composed operators here — callers alias). Output: one row
    * per overlapping pair, left columns then right columns, plus
    * `overlap_start`/`overlap_len` (the intersection, since callers
    * almost always weight by it).
    */
  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long,
      extraPred: Column = lit(true)): DataFrame = {
    require(binWidth > 0, "overlapJoin needs a positive bin width")
    val lb = explodeBins(left, lStart, lEnd, binWidth)
    val rb = explodeBins(right, rStart, rEnd, binWidth)
      .withColumnRenamed("__bin", "__rbin")
    val s1 = col(lStart); val e1 = col(lEnd)
    val s2 = col(rStart); val e2 = col(rEnd)
    lb.join(
        rb,
        col("__bin") === col("__rbin") &&
          s1 < e2 && s2 < e1 &&
          // claim the pair only in the bin holding the overlap's first
          // instant — exactly-once without a distinct
          col("__bin") === floorDiv(greatest(s1, s2), binWidth) &&
          extraPred)
      .drop("__bin", "__rbin")
      .withColumn("overlap_start", greatest(s1, s2))
      .withColumn("overlap_len", least(e1, e2) - greatest(s1, s2))
  }

  /** Self-join form: unordered pairs of overlapping intervals from ONE
    * frame, each emitted once as `id1 < id2`. `idCol` must be unique
    * per row (it is the pair identity). Output:
    * `id1, id2, overlap_start, overlap_len`.
    */
  def overlapPairs(
      df: DataFrame,
      idCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val a = df.select(
      col(idCol).as("id1"), col(startCol).as("__s1"), col(endCol).as("__e1"))
    val b = df.select(
      col(idCol).as("id2"), col(startCol).as("__s2"), col(endCol).as("__e2"))
    overlapJoin(
        a, "__s1", "__e1", b, "__s2", "__e2", binWidth,
        extraPred = col("id1") < col("id2"))
      .select("id1", "id2", "overlap_start", "overlap_len")
  }
}
