package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `ArrayType(FloatType)` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> double(x) *
  * double(y)), 0d, (s,v) -> s+v)` — materializes an intermediate
  * 64-element array per row and evaluates two lambda closures per
  * element. For pairwise-similarity workloads (millions of pairs) that
  * allocation dominates. This expression is the preferred middle rung of
  * the extension ladder (compose built-ins → custom Expression → custom
  * operator): a tight fused loop over the raw `ArrayData`, no
  * intermediate allocation, fully inside whole-stage codegen.
  *
  * Numerics are IDENTICAL to the composable form (and to the DuckDB
  * oracle): each float pair is widened to double, multiplied, and
  * accumulated left-to-right — same ops, same order, same result bits.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType

  // reject array<double>/array<int> at ANALYSIS time — the ArrayData
  // accessors below read raw 4-byte floats and would otherwise
  // misinterpret other element widths at runtime. (Covariant narrowing
  // to Seq[DataType]: AbstractDataType is private[sql].)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  /** Primitive copy of a FOLDABLE right operand (the probe/centroid
    * literal of every ANN/LSH scoring projection): `typedlit` arrays
    * are `GenericArrayData` holding boxed objects, so the scoring loop
    * would otherwise pay an unboxing virtual call PER ELEMENT PER ROW
    * — measured as the dominant cost of the 100× rehearsal's 64-probe
    * sign-bit stage (~30 s of boxed reads for 819M accesses). The copy
    * is made once per (de)serialized expression instance and shipped
    * into codegen as a reference object. Arithmetic is unchanged:
    * identical values, identical order, identical result bits. */
  @transient private lazy val rightConst: Array[Float] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else v.asInstanceOf[ArrayData].toFloatArray()
    } else null

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0d
    var i = 0
    if (rightConst != null) {
      val y = rightConst
      val n = math.min(x.numElements(), y.length)
      while (i < n) {
        acc += x.getFloat(i).toDouble * y(i).toDouble
        i += 1
      }
    } else {
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      if (rightConst != null) {
        val arr = ctx.addReferenceObj("dotConst", rightConst, "float[]")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $arr.length);
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.getFloat($i) * (double) $arr[$i];
           |}
           |${ev.value} = $acc;
         """.stripMargin
      } else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFloat(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
