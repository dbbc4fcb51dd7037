package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches as native Catalyst aggregates — the QUANTILE
  * half of the mergeable-sketch store ([[graft.operators.SketchStore]]
  * holds the distinct-count half on Spark's built-in HLL functions).
  *
  * `percentile(...)` is exact but holds every value; Spark's
  * `approx_percentile` sketches in one pass but its sketch is an
  * opaque internal buffer — it cannot be PERSISTED and re-merged
  * later, which is the property the store pattern needs ("p95 latency
  * per day, re-rollable to any window without rescanning"). The
  * DataSketches KLL sketch (Karnin-Lang-Liberty, FOCS'16; the
  * datasketches-java library Spark itself ships for its HLL
  * functions) is a mergeable quantile summary with a proven
  * normalized-rank-error bound (~1.65% at the default k = 200,
  * shrinking ~1/k): sketches of arbitrary data splits merge into
  * exactly the summary the union would have produced, within bound.
  *
  * Three expressions complete the lifecycle:
  *  - [[KllSketchAgg]]  (`kll_sketch_agg(value[, k])`): double values →
  *    serialized sketch bytes. A TypedImperativeAggregate, so Spark
  *    runs it partial/final — per-partition sketches merge map-side
  *    and the exchange carries sketch bytes (KBs), never values.
  *  - [[KllUnionAgg]]   (`kll_union_agg(sketch)`): merge STORED
  *    sketches — the rollup-time aggregate over the persisted store.
  *  - [[KllQuantile]]   (`kll_quantile(sketch, rank)`): extract a
  *    quantile from sketch bytes. Scalar, CodegenFallback by design:
  *    it evaluates on rollup OUTPUT rows (one per group), never on
  *    base data, so codegen would buy nothing and the fallback keeps
  *    the deserialization cost visible where it belongs.
  *
  * The declared query (`x_quantile_rollup`) verifies with the bounded
  * oracle: exact engine-portable percentiles hash-matched, plus an
  * `approx_ok` verdict that the merged-sketch estimate lands between
  * the exact quantiles at rank ± 5% — triple the k=200 error bound.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a DOUBLE value, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Merge serialized KLL sketches (the store-rollup aggregate). The
  * union buffer is created at `k` (default 200, the build default):
  * KLL merges adapt DOWNWARD to the smallest k involved, so a store
  * built at a larger k must pass that k here or the rollup silently
  * degrades to k=200 accuracy — the same caller obligation as
  * `ThetaUnionAgg`'s lgK. Mixed-k stores merge at min(k, smallest
  * stored k) by the library's contract. */
case class KllUnionAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg needs BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_union_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(
        KllDoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}

/** `kll_quantile(sketch, rank)` — the quantile at normalized rank
  * `rank` ∈ [0, 1] (inclusive search semantics, the library default),
  * NULL for an empty sketch (a group whose every value was NULL).
  * Runs on rollup output rows only — see the file scaladoc for why
  * CodegenFallback is the right trade here. */
case class KllQuantile(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile needs (BINARY, DOUBLE), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def eval(input: InternalRow): Any = {
    val bytes = left.eval(input)
    val rank = right.eval(input)
    if (bytes == null || rank == null) return null
    val sk = KllDoublesSketch.wrap(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
}
