package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All hyperplane-LSH sign bits of one embedding against a literal
  * probe matrix, packed into a single long: bit p is set iff
  * dot(embedding, probes(p)) ≥ 0.
  *
  * Why an expression and not 64 composed `dot >= 0` columns: the
  * composed form plans 64 independent [[DotProductFloat]] subtrees
  * inside one projection, and the resulting generated method measured
  * 4-7× slower than the same 64 dots inside an aggregate at the 100×
  * rehearsal (25-55 s vs 6-15 s over 200k × 64-dim vectors) — the
  * per-subtree evaluation scaffolding, not the arithmetic, dominates.
  * This expression is one fused two-level loop over the raw
  * `ArrayData` and a primitive `float[][]` reference: the probe matrix
  * loads once, the embedding's elements stream once per probe, and the
  * whole thing is a single small JIT-friendly method.
  *
  * Numerics are IDENTICAL to the composed form: each float pair widens
  * to double, multiplies, accumulates left-to-right, and the sign test
  * is the same `>= 0` on the same double — same bits, same bucket keys
  * (SimilaritySpec pins equality against the composed form).
  *
  * `probes.length` must be ≤ 64 (one bit per probe in the long). */
case class SignBitsPacked(child: Expression, probes: Seq[Seq[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  require(probes.nonEmpty && probes.length <= 64,
    s"SignBitsPacked needs 1..64 probes, got ${probes.length}")

  override def dataType: DataType = LongType

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  /** Primitive copy of the probe matrix, shared by the interpreted and
    * codegen paths (boxed per-element reads are the trap this
    * expression exists to avoid — see [[DotProductFloat.rightConst]]). */
  @transient private lazy val probeMatrix: Array[Array[Float]] =
    probes.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = probeMatrix
    var bits = 0L
    var p = 0
    while (p < m.length) {
      val probe = m(p)
      val n = math.min(x.numElements(), probe.length)
      var acc = 0d
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * probe(i).toDouble
        i += 1
      }
      if (acc >= 0) bits |= 1L << p
      p += 1
    }
    bits
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("signProbes", probeMatrix, "float[][]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bits = ctx.freshName("bits")
      val probe = ctx.freshName("probe")
      s"""
         |long $bits = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  float[] $probe = $m[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $probe.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $probe[$i];
         |  }
         |  if ($acc >= 0) $bits |= 1L << $p;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBitsPacked = copy(child = newChild)
}

object SignBitsPacked {
  /** Column-level entry point. */
  def apply(embedding: Column, probes: Seq[Seq[Float]]): Column =
    ColumnBridge.column(
      SignBitsPacked(ColumnBridge.expression(embedding), probes))
}
