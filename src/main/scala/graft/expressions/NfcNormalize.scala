package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition followed by
  * canonical composition, UAX #15) as a native codegen expression —
  * `nfc(text): string`.
  *
  * Spark ships no normalization builtin, yet any web-scale text corpus
  * mixes composed (`é` U+00E9) and decomposed (`e` + U+0301) spellings
  * of the same grapheme; exact dedup, n-gram contamination checks and
  * vocabulary builds all silently fracture on the distinction unless
  * every document is normalized first. A Scala UDF would de-optimize
  * the whole-stage pipeline; this expression stays inside codegen and
  * row-local (no shuffle, no state), so it composes with the scan at
  * zero plan cost.
  *
  * The hot path is the `Normalizer.isNormalized` check: real corpora
  * are overwhelmingly already-NFC (all-ASCII text short-circuits in
  * the first few chars), and normalized inputs are returned as-is with
  * no allocation. Only genuinely denormalized strings pay for the
  * compose pass.
  *
  * Null input → null. Semantics match DuckDB's `nfc_normalize`, which
  * the `x_text_nfc` oracle uses to re-derive results — both sides
  * implement the same Unicode canonical-composition tables. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc requires a string column, got ${child.dataType.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.expressions.NfcNormalize.compute($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code. Pure-ASCII inputs
    * (the overwhelming majority in practice) are NFC by definition and
    * return untouched after a byte scan on the UTF8String — no UTF-16
    * decode, no allocation. Non-ASCII strings pay one `toString`
    * (UTF-16 decode) for the NFC quick-check; only strings that are
    * actually denormalized allocate a new normalized copy. */
  def compute(t: UTF8String): UTF8String = {
    var i = 0
    val n = t.numBytes
    var ascii = true
    while (ascii && i < n) {
      if ((t.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return t
    val s = t.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) t
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def of(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
