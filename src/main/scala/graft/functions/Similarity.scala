package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `ArrayType(FloatType)` embedding columns.
  *
  * Built on Spark's higher-order array functions (`zip_with`,
  * `aggregate`, `transform`) — these are Catalyst expressions that run
  * inside codegen, so no UDF/serialization cost. Elements are cast to
  * double BEFORE multiplying so the arithmetic (and its rounding) is
  * identical to engines that compute in double natively.
  *
  * The left-to-right `aggregate` fold gives a deterministic summation
  * order — same input array, same result, regardless of partitioning.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double.
    * Backed by the codegen'd [[graft.expressions.DotProductFloat]] —
    * bit-identical to [[dotComposable]] but with no per-row array
    * allocation. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProductFloat(a, b)

  /** The compose-built-ins form of [[dot]] (zip_with + aggregate).
    * Kept as the reference implementation; SimilaritySpec asserts the
    * two produce identical bits. */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
