package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (Misra-Gries / SpaceSaving) sketches as native
  * Catalyst aggregates — the HEAVY-HITTERS half of the mergeable-sketch
  * store, completing the quartet next to distinct counts (HLL,
  * [[graft.operators.SketchStore.buildSketches]]), quantiles (KLL,
  * [[KllSketchAgg]]) and set algebra (theta, [[ThetaSketchAgg]]).
  *
  * "Which tokens/domains/users dominate the stream?" is the fourth
  * canonical rollup question, and like the other three it does NOT
  * decompose over exact partials: yesterday's top-k and today's top-k
  * don't merge into the month's top-k (an item can be #k+1 every day
  * and #1 overall). The engine already answers it one-shot with a CMS
  * (`x_heavy_cms`), but a CMS counter table keyed by (depth × width)
  * cannot name its heavy items without a second pass over candidates —
  * it is a point-lookup structure, not a store row. The DataSketches
  * frequent-items sketch (Misra-Gries '82 / SpaceSaving '05 lineage;
  * the same datasketches-java library the HLL/KLL/theta halves use)
  * carries its candidate set WITH the counters, merges losslessly in
  * error (error bounds add, ≤ streamLength/maxMapSize), and offers the
  * two-sided guarantee a pipeline needs: NO_FALSE_NEGATIVES returns
  * every item whose true count exceeds the threshold, each with
  * [lowerBound, upperBound] brackets on the true count.
  *
  * Lifecycle, mirroring the other halves:
  *  - [[FreqSketchAgg]] (`freq_sketch_agg(item[, maxMapSize])`) —
  *    string items → sketch bytes; TypedImperativeAggregate, so Spark
  *    runs it partial/final and the exchange carries sketch bytes
  *    (≤ ~18 KB at maxMapSize 256), never item streams.
  *  - [[FreqUnionAgg]] (`freq_union_agg(sketch)`) — merge STORED
  *    sketches at rollup time (Misra-Gries merge: counter tables add,
  *    then decrement-and-purge back to capacity).
  *  - [[FreqTopItems]] (`freq_top_items(sketch, threshold)`) — scalar
  *    bytes → array<struct<item, est, lb, ub>> of every item whose
  *    count MAY exceed `threshold` (no false negatives). Scalar ops are
  *    CodegenFallback by design: they run on rollup-output rows (one
  *    per group), never on base data.
  *
  * The declared query (`x_freq_rollup`) verifies with the bounded
  * oracle: support threshold chosen with margin ≫ the sketch's maximum
  * error at test scale, so the returned item set equals the exact
  * HAVING set and `lb ≤ exact ≤ ub` is a deterministic TRUE — the
  * bytes are engine-specific, the guarantee is portable.
  */
object FreqSketch {
  private[expressions] def serde = new ArrayOfStringsSerDe()

  private[expressions] def requireMapSize(maxMapSize: Int): Unit =
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"freq sketch maxMapSize must be a power of 2 >= 8: $maxMapSize")

  /** Result element schema of [[FreqTopItems]]. */
  val ItemStruct: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))
}

/** Build a frequent-items sketch of string `child` values per group. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  FreqSketch.requireMapSize(maxMapSize)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg needs a STRING item, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Merge serialized frequent-items sketches (the store-rollup
  * aggregate). `maxMapSize` MUST be the store's build size: the
  * library's merge routes every incoming item through the union
  * BUFFER's own update(), so the buffer's map caps merged capacity —
  * a store built at M > this value silently degrades the rollup to
  * this value's error grade (the exact analog of KLL's downward
  * adaptation, reached through the receiver rather than the inputs).
  * The default only floors error when inputs were built at ≤ its
  * size. Either way the NO_FALSE_NEGATIVES [lb, ub] brackets stay
  * valid — purges widen bounds, never drop a true heavy hitter — so
  * an undersized buffer costs accuracy, not correctness. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  FreqSketch.requireMapSize(maxMapSize)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_union_agg needs BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_union_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqSketch.serde))
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
}

/** `freq_top_items(sketch, threshold)` — every item whose true count
  * MAY exceed `threshold` (ErrorType.NO_FALSE_NEGATIVES: guaranteed to
  * include all true heavy hitters; may include borderline items whose
  * upper bound clears the threshold), as array<struct<item, est, lb,
  * ub>> sorted by the library's (estimate desc) order. */
case class FreqTopItems(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_top_items needs (BINARY sketch, BIGINT threshold), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = ArrayType(FreqSketch.ItemStruct, false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_top_items"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val t = right.eval(input)
    if (a == null || t == null) return null
    val sk = ItemsSketch.getInstance(
      Memory.wrap(a.asInstanceOf[Array[Byte]]), FreqSketch.serde)
    val rows = sk.getFrequentItems(
      t.asInstanceOf[Long], ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map(r => InternalRow(
      UTF8String.fromString(r.getItem),
      r.getEstimate, r.getLowerBound, r.getUpperBound)))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqTopItems = copy(left = l, right = r)
}

/** `freq_max_error(sketch)` — the sketch's maximum estimation error
  * (ub − est, a.k.a. the purge offset). 0 ⟺ the sketch is still in
  * exact mode (never purged), in which case est == lb == ub for every
  * item and threshold queries equal their exact HAVING set. Queries
  * whose oracle relies on that equality assert this instead of letting
  * a grown vocabulary surface as an opaque row-count diff. Scalar op
  * on rollup-output rows → CodegenFallback by design. */
case class FreqMaxError(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_max_error needs BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_max_error"

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    ItemsSketch.getInstance(
      Memory.wrap(a.asInstanceOf[Array[Byte]]), FreqSketch.serde)
      .getMaximumError
  }

  override protected def withNewChildInternal(c: Expression): FreqMaxError =
    copy(child = c)
}
