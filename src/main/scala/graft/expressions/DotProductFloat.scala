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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
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
