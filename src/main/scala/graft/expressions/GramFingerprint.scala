package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass k-gram fingerprint of a string column:
  * `struct(fp: bigint, n_kgrams: bigint)` where
  *
  *   - `fp`       = min over all k-char grams of
  *                  [[graft.functions.Hashing.hash32]] (first 8 hex chars
  *                  of md5, read as an unsigned int) — the same portable
  *                  hash the DuckDB oracle recomputes;
  *   - `n_kgrams` = number of DISTINCT k-char grams (exact strings,
  *                  not hashes — no collision undercount).
  *
  * The composable form — two `transform(sequence(...), i -> substr(...))`
  * lambdas feeding `array_min` / `array_distinct` — walks the text twice
  * and evaluates every gram through interpreted higher-order-function
  * closures (Spark's HOFs don't participate in whole-stage codegen), which
  * made the fingerprint pass the single most expensive query in the bench.
  * This expression fuses both statistics into one scan of the string with
  * no intermediate arrays. Grams are taken by CODE POINT via
  * `UTF8String.substringSQL`, bit-identical to `substr(text, i, k)`, so
  * the DuckDB oracle (`substr` + `md5`) reproduces it exactly.
  *
  * Result is null for null input or when the text is shorter than k
  * grams' worth of characters (matching the `length(text) >= k` guard the
  * SQL form needs).
  */
case class GramFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be positive, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("n_kgrams", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_fingerprint requires a string column, got ${child.dataType.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    GramFingerprint.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The heavy loop lives in the static helper (JIT-compiled Scala, same
    // machine code janino would reach); codegen's job here is keeping the
    // call inside the fused pipeline instead of an interpreted eval() per
    // row through the expression-tree walker.
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.expressions.GramFingerprint.compute($t, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): GramFingerprint = copy(child = newChild)
}

object GramFingerprint {

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Per-task-thread gram -> hash32 memo. Natural-language k-grams are
    * heavily repeated across documents (Zipfian), so most lookups hit;
    * the md5 runs only on first sight of a gram. Bounded (cleared at
    * [[CacheCap]] entries) so a pathological high-entropy corpus cannot
    * grow it past ~tens of MB per executor thread; correctness never
    * depends on residency. */
  private val CacheCap = 1 << 20
  private val hashCache: ThreadLocal[java.util.HashMap[UTF8String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[UTF8String, java.lang.Long]())

  /** Shared by interpreted eval and generated code. Returns null when the
    * text holds fewer than one full gram.
    *
    * Only DISTINCT grams are hashed (min over a multiset equals min over
    * its support), and the per-row distinct set doubles as the
    * `n_kgrams` counter. */
  def compute(text: UTF8String, k: Int): InternalRow = {
    val n = text.numChars()
    if (n < k) return null
    val cache = hashCache.get()
    val seen = new java.util.HashSet[UTF8String]()
    var minH = Long.MaxValue
    var i = 1
    while (i <= n - k + 1) {
      val gram = text.substringSQL(i, k)
      if (seen.add(gram)) {
        val boxed = cache.get(gram)
        val h: Long =
          if (boxed != null) boxed.longValue
          else {
            val md = md5.get()
            val d = md.digest(gram.getBytes)
            val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
            if (cache.size >= CacheCap) cache.clear()
            // copy: the gram may be a view into this row's text buffer
            cache.put(gram.copy(), java.lang.Long.valueOf(hv))
            hv
          }
        if (h < minH) minH = h
      }
      i += 1
    }
    InternalRow(minH, seen.size.toLong)
  }

  /** Column-level entry point. */
  def of(text: Column, k: Int): Column =
    ColumnBridge.column(GramFingerprint(ColumnBridge.expression(text), k))
}
