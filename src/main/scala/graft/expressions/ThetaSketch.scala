package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches as native Catalyst aggregates — distinct counts with
  * FULL SET ALGEBRA, the third leg of the mergeable-sketch store.
  *
  * HLL ([[graft.operators.SketchStore]]) answers "how many distinct?"
  * and merges under UNION only. The audience-overlap questions a
  * corpus/product pipeline actually asks — "how many users did BOTH X
  * and Y" (retention, cross-surface reach), "how many did X but not Y"
  * (churn, incremental reach) — need INTERSECTION and DIFFERENCE,
  * which HLL cannot give (inclusion-exclusion on estimates explodes
  * the error when the overlap is small). The DataSketches Theta sketch
  * (the KMV/theta family; same datasketches-java library Spark ships)
  * is the standard warehouse answer: a uniform hash-sample of the
  * distinct items that supports union / intersect / a-not-b with
  * proven error bounds, in exact mode (zero error) until the retained
  * set exceeds 2^lgK entries.
  *
  * Lifecycle, mirroring the HLL/KLL halves:
  *  - [[ThetaSketchAgg]] (`theta_sketch_agg(value[, lgK])`) — values →
  *    sketch bytes; TypedImperativeAggregate, partial/final, the
  *    exchange carries sketch bytes. The buffer IS a theta Union
  *    (unions accept raw item updates), so update and merge share one
  *    state object.
  *  - [[ThetaUnionAgg]] (`theta_union_agg(sketch)`) — merge STORED
  *    sketches at rollup time.
  *  - [[ThetaSetOp]] (`theta_intersect(a, b)` / `theta_a_not_b(a, b)`)
  *    — scalar set algebra over two serialized sketches → sketch
  *    bytes, so set expressions COMPOSE ((A∩B)∖C …).
  *  - [[ThetaEstimate]] (`theta_estimate(sketch)`) — bytes → estimated
  *    distinct count. Scalar ops are CodegenFallback by design: they
  *    run on rollup-output rows (one per group), never on base data.
  *
  * The declared query (`x_sketch_setops`) verifies with the bounded
  * oracle: exact INTERSECT/EXCEPT/UNION distinct counts hash-matched
  * plus an `approx_ok` ≤5% verdict (exact-mode sketches at test scale
  * make the estimates exact; the tolerance is the production
  * contract).
  */
object ThetaSketchAgg {
  /** Item updaters per supported input type — resolved once at plan
    * time, not per row. */
  private[expressions] def updater(
      dt: DataType): (Union, Any) => Unit = dt match {
    case LongType    => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case DoubleType  => (u, v) => u.update(v.asInstanceOf[Double])
    case StringType  => (u, v) => u.update(v.asInstanceOf[UTF8String].toString)
    case BinaryType  => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"theta_sketch_agg does not support ${other.sql} input")
  }
  private[expressions] val SupportedInputs: Seq[DataType] =
    Seq(LongType, IntegerType, DoubleType, StringType, BinaryType)
}

case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK out of range: $lgK")

  override def checkInputDataTypes(): TypeCheckResult =
    if (ThetaSketchAgg.SupportedInputs.contains(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg needs LONG/INT/DOUBLE/STRING/BINARY, " +
        s"got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  @transient private lazy val updateFn = ThetaSketchAgg.updater(child.dataType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) updateFn(buffer, v)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Merge serialized theta sketches (the store-rollup aggregate). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg needs BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Scalar set algebra over two serialized theta sketches → sketch
  * bytes (composable). `intersect = false` computes A-not-B. */
case class ThetaSetOp(
    left: Expression, right: Expression, intersect: Boolean)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two BINARY sketches, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (intersect) "theta_intersect" else "theta_a_not_b"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val sa = Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val out =
      if (intersect)
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      else {
        val anb = SetOperation.builder().buildANotB()
        anb.setA(sa); anb.notB(sb); anb.getResult(true)
      }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetOp = copy(left = l, right = r)
}

/** `theta_estimate(sketch)` — estimated distinct count of a serialized
  * theta sketch (exact while the sketch is in exact mode). */
case class ThetaEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_estimate"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    Sketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  }

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}
