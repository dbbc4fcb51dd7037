package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProductFloat

/** SQL-surface registration for the engine's custom expressions, so the
  * same operators are reachable from `spark.sql(...)` as from the
  * DataFrame API.
  *
  * Two entry points:
  *  - [[registerAll]] — register on an existing session (temp functions);
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.GraftExtensions` in spark-submit /
  *    cluster deployments, where the session is built by the platform.
  */
object GraftFunctions {

  private def hash32Expr(child: Expression): Expression = {
    // raw catalyst tree for Hashing.hash32 — registry builders must
    // return directly-resolvable Expressions (a Column round-trip embeds
    // unresolved ColumnNode wrappers that fail codegen)
    import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
    import org.apache.spark.sql.types.{BinaryType, LongType}
    Cast(
      Conv(
        Substring(Md5(Cast(child, BinaryType)), Literal(1), Literal(8)),
        Literal(16), Literal(10)),
      LongType)
  }

  private case class GraftFn(
      name: String,
      implClass: String,
      builder: Seq[Expression] => Expression)

  /** Resolve a function argument that must be a compile-time integer
    * (a sketch size, a shingle width): fold any foldable expression
    * and accept every integral literal type — `256`, `256L`,
    * `CAST(256 AS INT)`, `2*128` all work, matching the
    * numeric-literal tolerance of built-in SQL functions. `sig` names
    * the function's SQL signature in the error. */
  private def intLitArg(e: Expression, what: String, sig: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val folded =
      if (e.foldable) Literal.create(e.eval(), e.dataType) else e
    folded match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) if v.isValidInt => v.toInt
      case Literal(v: Short, _) => v.toInt
      case Literal(v: Byte, _) => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$what in $sig must be an integer literal, got ${e.sql}")
    }
  }

  private val functions: Seq[GraftFn] = Seq(
    GraftFn("dot_f32", classOf[DotProductFloat].getName, exprs => {
      require(exprs.length == 2,
        s"dot_f32 requires exactly 2 arguments (two ARRAY<FLOAT> columns), got ${exprs.length}")
      DotProductFloat(exprs(0), exprs(1))
    }),
    // the engine-portable hash (oracle parity: '0x'||substr(md5(s),1,8))
    GraftFn("graft_hash32", "graft.functions.Hashing", exprs => {
      require(exprs.length == 1,
        s"graft_hash32 requires exactly 1 string argument, got ${exprs.length}")
      hash32Expr(exprs.head)
    }),
    GraftFn("gram_fingerprint",
      classOf[graft.expressions.GramFingerprint].getName, exprs => {
        require(exprs.length == 2,
          s"gram_fingerprint requires (text, k) arguments, got ${exprs.length}")
        val k = intLitArg(exprs(1), "k", "gram_fingerprint(text, k)")
        graft.expressions.GramFingerprint(exprs.head, k)
      }),
    // KLL quantile-sketch lifecycle (expressions/KllSketch.scala):
    // build / merge-stored / extract — the SQL surface of the
    // quantile half of the mergeable-sketch store
    GraftFn("kll_sketch_agg",
      classOf[graft.expressions.KllSketchAgg].getName, exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"kll_sketch_agg requires (value[, k]) arguments, got ${exprs.length}")
        val k = if (exprs.length < 2) 200
          else intLitArg(exprs(1), "k", "kll_sketch_agg(value[, k])")
        graft.expressions.KllSketchAgg(exprs.head, k)
      }),
    GraftFn("kll_union_agg",
      classOf[graft.expressions.KllUnionAgg].getName, exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"kll_union_agg requires (sketch[, k]) arguments, got ${exprs.length}")
        // k must match the store's build k or the union silently
        // degrades the rollup to k=200 accuracy (KLL adapts DOWNWARD)
        val k = if (exprs.length < 2) 200
          else intLitArg(exprs(1), "k", "kll_union_agg(sketch[, k])")
        graft.expressions.KllUnionAgg(exprs.head, k)
      }),
    GraftFn("kll_quantile",
      classOf[graft.expressions.KllQuantile].getName, exprs => {
        require(exprs.length == 2,
          s"kll_quantile requires (sketch, rank) arguments, got ${exprs.length}")
        graft.expressions.KllQuantile(exprs(0), exprs(1))
      }),
    // Theta sketch set algebra (expressions/ThetaSketch.scala):
    // distinct counts that intersect/subtract, not just union
    GraftFn("theta_sketch_agg",
      classOf[graft.expressions.ThetaSketchAgg].getName, exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"theta_sketch_agg requires (value[, lgK]) arguments, got ${exprs.length}")
        val lgK = if (exprs.length < 2) 12
          else intLitArg(exprs(1), "lgK", "theta_sketch_agg(value[, lgK])")
        graft.expressions.ThetaSketchAgg(exprs.head, lgK)
      }),
    GraftFn("theta_union_agg",
      classOf[graft.expressions.ThetaUnionAgg].getName, exprs => {
        require(exprs.length == 1,
          s"theta_union_agg requires exactly 1 binary argument, got ${exprs.length}")
        graft.expressions.ThetaUnionAgg(exprs.head)
      }),
    GraftFn("theta_intersect",
      classOf[graft.expressions.ThetaSetOp].getName, exprs => {
        require(exprs.length == 2,
          s"theta_intersect requires (a, b) arguments, got ${exprs.length}")
        graft.expressions.ThetaSetOp(exprs(0), exprs(1), intersect = true)
      }),
    GraftFn("theta_a_not_b",
      classOf[graft.expressions.ThetaSetOp].getName, exprs => {
        require(exprs.length == 2,
          s"theta_a_not_b requires (a, b) arguments, got ${exprs.length}")
        graft.expressions.ThetaSetOp(exprs(0), exprs(1), intersect = false)
      }),
    GraftFn("theta_estimate",
      classOf[graft.expressions.ThetaEstimate].getName, exprs => {
        require(exprs.length == 1,
          s"theta_estimate requires exactly 1 binary argument, got ${exprs.length}")
        graft.expressions.ThetaEstimate(exprs.head)
      }),
    // Frequent-items (Misra-Gries) heavy hitters
    // (expressions/FreqSketch.scala): the fourth sketch-store half
    GraftFn("freq_sketch_agg",
      classOf[graft.expressions.FreqSketchAgg].getName, exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"freq_sketch_agg requires (item[, maxMapSize]) arguments, " +
            s"got ${exprs.length}")
        val m = if (exprs.length < 2) 256
          else intLitArg(exprs(1), "maxMapSize",
            "freq_sketch_agg(item[, maxMapSize])")
        graft.expressions.FreqSketchAgg(exprs.head, m)
      }),
    GraftFn("freq_union_agg",
      classOf[graft.expressions.FreqUnionAgg].getName, exprs => {
        require(exprs.length == 1 || exprs.length == 2,
          s"freq_union_agg requires (sketch[, maxMapSize]) arguments, " +
            s"got ${exprs.length}")
        // pass the store's build size: the union BUFFER's map caps
        // merged capacity (see FreqUnionAgg scaladoc)
        val m = if (exprs.length < 2) 256
          else intLitArg(exprs(1), "maxMapSize",
            "freq_union_agg(sketch[, maxMapSize])")
        graft.expressions.FreqUnionAgg(exprs.head, m)
      }),
    GraftFn("freq_max_error",
      classOf[graft.expressions.FreqMaxError].getName, exprs => {
        require(exprs.length == 1,
          s"freq_max_error requires exactly 1 binary argument, got ${exprs.length}")
        graft.expressions.FreqMaxError(exprs.head)
      }),
    GraftFn("freq_top_items",
      classOf[graft.expressions.FreqTopItems].getName, exprs => {
        require(exprs.length == 2,
          s"freq_top_items requires (sketch, threshold) arguments, " +
            s"got ${exprs.length}")
        graft.expressions.FreqTopItems(exprs(0), exprs(1))
      }))

  /** Register all graft SQL functions as session temp functions. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { f =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        f.name, f.builder, "scala_udf")
    }

  private[graft] def inject(e: SparkSessionExtensions): Unit =
    functions.foreach { f =>
      e.injectFunction((
        FunctionIdentifier(f.name),
        new ExpressionInfo(f.implClass, f.name),
        f.builder))
    }
}

/** `spark.sql.extensions` entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.inject(e)
}
