package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: the data-quality summary a pipeline computes before
  * trusting a new source drop (null counts, exact distinct cardinality
  * per column).
  *
  * Shape: ONE aggregate pass over the table computes every column's
  * metrics together (Spark plans the multi-`countDistinct` with a
  * single Expand — one shuffle, rows × |cols| expanded keys), then the
  * 1-row result pivots to long form through a row-local explode. At
  * 100 TB the exact-distinct Expand is the honest cost; the production
  * swap for wide tables is `approx_count_distinct` per column (no
  * Expand, one ordinary aggregate) — same output schema, bounded
  * error.
  */
object Profiling {

  /** Per-column profile of `cols`.
    * Output: (column_name, n_rows, n_null, n_distinct) — `n_distinct`
    * counts non-null distinct values, matching `count(DISTINCT c)`. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
