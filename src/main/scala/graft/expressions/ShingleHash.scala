package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Row-local kernels behind the skinny exact-verification payloads of
  * [[graft.operators.Dedup]]'s near-dup verify phase. A top-level object
  * so scalac emits STATIC forwarders — the generated (whole-stage
  * codegen) Java calls these directly, no MODULE$ indirection in the
  * hot path. */
object ShingleHashKernels {

  /** Sorted distinct xxhash64 (seed 42 — the `xxhash64()` builtin's) of
    * each string element. Single allocation + primitive sort; the
    * result is an [[UnsafeArrayData]] of longs. */
  def hashSortedSet(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted run (a within-set 64-bit collision —
    // two distinct shingles on one hash — collapses to one element;
    // probability ≤ n²/2⁶⁵ per set, see the caller's recall note)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || out(w - 1) != out(i)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  /** |a ∩ b| for two SORTED distinct long arrays — one merge pass, zero
    * allocation (the hash-set build `array_intersect` would pay per
    * row). */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }
}

/** `array<string>` → sorted distinct `array<long>` of per-element
  * xxhash64 values (seed 42, bit-identical to the `xxhash64()` builtin
  * — ExpressionSpec pins equality against the composed
  * sort_array(array_distinct(transform(.., xxhash64))) form).
  *
  * Why an expression and not that composed form: `transform`'s lambda
  * evaluates as an INTERPRETED expression tree (higher-order functions
  * are CodegenFallback — the measured trap recorded at
  * [[graft.operators.Dedup.bandedMinHash]]), so per-shingle xxhash64
  * through it costs an interpreted call per element; this is one
  * codegen'd static call per row over the raw ArrayData. Elements must
  * be non-null (shingle arrays are by construction). */
case class XxHash64SortedSet(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(a: Any): Any =
    ShingleHashKernels.hashSortedSet(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.ShingleHashKernels.hashSortedSet($a)")

  override protected def withNewChildInternal(
      newChild: Expression): XxHash64SortedSet = copy(child = newChild)
}

object XxHash64SortedSet {
  /** Column-level entry point. */
  def apply(arr: Column): XxHash64SortedSet =
    XxHash64SortedSet(ColumnBridge.expression(arr))

  def column(arr: Column): Column =
    ColumnBridge.column(apply(arr))
}

/** Intersection size of two SORTED distinct `array<long>` columns (the
  * [[XxHash64SortedSet]] output shape) as a double — one codegen'd
  * merge pass per row, replacing `size(array_intersect(..))`'s per-row
  * hash-set build in the near-dup verify joins. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashKernels.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]).toDouble

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"(double) graft.expressions.ShingleHashKernels.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  /** Column-level entry point. */
  def column(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
