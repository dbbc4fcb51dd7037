package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale path for dense surrogate keys.
  *
  * The declared TierF queries mint dense 0..n-1 ids with
  * `row_number() OVER (ORDER BY ...)` — a single-partition window. That
  * is the right call for the reference's dimensions (a handful of
  * already-deduplicated rows), and the window's total order is exactly
  * the determinism contract the oracle checks. But a dimension with
  * hundreds of millions of distinct values cannot pass through one
  * task.
  *
  * [[withDenseId]] produces the IDENTICAL assignment with no
  * single-partition stage: a range-partitioned global sort (parallel),
  * then `zipWithIndex` — which computes per-partition counts in one
  * lightweight job and adds each partition's starting offset during the
  * main pass. Cost: one extra count job and a drop out of columnar
  * execution for the id-attach map; worth it only past the
  * single-task threshold, which is why the small-dimension queries keep
  * the window form (equality of the two forms is pinned by
  * DenseIdSpec).
  *
  * `sortCols` must be a TOTAL order (tie-broken) — the same requirement
  * the window form already carries for oracle determinism.
  */
object DenseId {

  def withDenseId(
      df: DataFrame, idCol: String, sortCols: Seq[Column]): DataFrame = {
    require(sortCols.nonEmpty, "withDenseId requires an explicit sort order")
    require(!df.columns.contains(idCol),
      s"withDenseId: column $idCol already exists")
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withIdx, schema)
  }
}
