package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row at or
  * before the left row's event time, per key — the temporal join Spark
  * has no built-in operator for (DuckDB: `ASOF JOIN`, kdb: `aj`).
  *
  * Implemented by COMPOSITION (rung (a) of the extension ladder — no
  * custom SparkPlan needed): tag both sides, union them (right rows
  * carry only key/ts/value, left columns null-padded), and run one
  * `last(value, ignoreNulls)` window per key ordered by (ts, tag).
  * Right rows sort before left rows at equal timestamps, so an exactly
  * simultaneous right row matches — inclusive ≤, same as DuckDB's
  * `ON l.ts >= r.ts`.
  *
  * Scale shape: ONE shuffle on the key + one sort — the cost profile of
  * a sort-merge join with state bounded by one carried value per key.
  * The naive formulation (range join + per-left-row argmax) shuffles
  * twice and explodes candidate pairs before pruning them.
  *
  * Ties among right rows with identical (key, ts) resolve to the
  * largest value (deterministic); engines with unspecified ASOF tie
  * order may differ on such data.
  */
object AsOfJoin {

  /** Returns `left` plus `matchCol` = `right(valueCol)` of the latest
    * right row with `right(tsCol) <= left(tsCol)` sharing `key` (null
    * if none precedes). `valueCol` must be castable to long. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      valueCol: String,
      matchCol: String): DataFrame = {
    // the internal tag/value columns must not collide with user columns
    // (mirrors SkewJoin.saltedJoin's salt-column guard) — a left frame
    // already carrying _tag/_rv would be silently corrupted by the drop
    require(!left.columns.contains("_tag") && !left.columns.contains("_rv"),
      "asofJoin: left frame must not contain internal columns _tag/_rv")
    // right rows with null ts or null value cannot participate: a null
    // ts never satisfies l.ts >= r.ts in engines with SQL-null
    // comparison semantics, and a null value is indistinguishable from
    // "no match" downstream — drop both up front
    val r = right
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(key), col(tsCol), col(valueCol).cast("long").as("_rv"),
        lit(0).as("_tag"))
    val l = left.withColumn("_tag", lit(1))
    val tagged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_tag"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(matchCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_rv")
  }
}
