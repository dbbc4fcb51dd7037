package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash of a space-tokenized string column:
  * `struct(sim_lo: bigint, sim_hi: bigint)`, where bit b of `sim_lo` is
  * set iff the ±1-weighted sum over all token occurrences of bit b of
  * [[graft.functions.Hashing.hash32]](token) is ≥ 0, and `sim_hi` uses
  * the seed-1 family member hash32("1:" ‖ token) — exactly the
  * fingerprints [[graft.operators.Dedup.simHashes]]/[[graft.operators.Dedup.simHashes64]]
  * build (the 32-bit simhash IS `sim_lo`).
  *
  * The aggregate form costs an explode of the token stream, a
  * (doc, hash) pre-collapse shuffle, and a 32/64-conditional-sum
  * aggregate shuffle — the three SimHash queries were ~13 s of the
  * sf0.1 bench between them. A document's SimHash depends on nothing
  * outside the document, so this expression computes it in ONE pass
  * over the row inside whole-stage codegen: no explode, no shuffles
  * before blocking. Bit-identity with the aggregate form is pinned by
  * ExpressionSpec; the aggregate form stays in [[graft.operators.Dedup]]
  * as the reference implementation.
  *
  * Tokenization matches `split(text, " ")` with Spark's keep-empties
  * semantics (consecutive delimiters yield empty tokens, the empty
  * string yields one empty token), so the swap is observationally
  * invisible — including to the DuckDB oracle, which re-derives the
  * same hashes from `string_split`.
  *
  * Null input → null; all other inputs produce a fingerprint. */
case class SimHashWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sim_lo", LongType, nullable = false),
    StructField("sim_hi", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_words requires a string column, got ${child.dataType.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    SimHashWords.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    // same pattern as GramFingerprint: the loop lives in a static
    // JIT-compiled helper; codegen keeps the call fused in the pipeline
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.expressions.SimHashWords.compute($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashWords = copy(child = newChild)
}

object SimHashWords {

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Per-task-thread token → (ha, hb) memo, both 32-bit hashes packed
    * into one long. Zipfian token repetition makes most lookups hit;
    * bounded like [[GramFingerprint.hashCache]] so adversarial corpora
    * cannot grow it. */
  private val CacheCap = 1 << 20
  private val hashCache: ThreadLocal[java.util.HashMap[UTF8String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[UTF8String, java.lang.Long]())

  private val SeedPrefix = "1:".getBytes("UTF-8")

  private def hash32(bytes: Array[Byte], md: MessageDigest): Long = {
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def hashesOf(tok: UTF8String): Long = {
    val cache = hashCache.get()
    val boxed = cache.get(tok)
    if (boxed != null) return boxed.longValue
    val md = md5.get()
    val raw = tok.getBytes
    val ha = hash32(raw, md)
    val prefixed = new Array[Byte](SeedPrefix.length + raw.length)
    System.arraycopy(SeedPrefix, 0, prefixed, 0, SeedPrefix.length)
    System.arraycopy(raw, 0, prefixed, SeedPrefix.length, raw.length)
    val hb = hash32(prefixed, md)
    val packed = (ha << 32) | hb
    if (cache.size >= CacheCap) cache.clear()
    cache.put(tok.copy(), java.lang.Long.valueOf(packed))
    packed
  }

  /** Shared by interpreted eval and generated code. Tokenizes on the
    * single-space delimiter with keep-empties semantics (bit-matching
    * `split(text, " ")` + explode), accumulates the 64 ±1 bit sums, and
    * packs the two sign words. */
  def compute(text: UTF8String): InternalRow = {
    val counts = new Array[Int](64)
    val s = text.toString
    var start = 0
    var done = false
    while (!done) {
      val sep = s.indexOf(' ', start)
      val end = if (sep == -1) { done = true; s.length } else sep
      val tok = UTF8String.fromString(s.substring(start, end))
      val packed = hashesOf(tok)
      val ha = packed >>> 32
      val hb = packed & 0xffffffffL
      var b = 0
      while (b < 32) {
        if (((ha >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        if (((hb >> b) & 1L) == 1L) counts(32 + b) += 1
        else counts(32 + b) -= 1
        b += 1
      }
      start = end + 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) >= 0) lo |= (1L << b)
      if (counts(32 + b) >= 0) hi |= (1L << b)
      b += 1
    }
    InternalRow(lo, hi)
  }

  /** Column-level entry point. */
  def of(text: Column): Column =
    ColumnBridge.column(SimHashWords(ColumnBridge.expression(text)))
}
