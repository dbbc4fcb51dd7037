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

  /** Both joins carry the right value through integer tie-break
    * arithmetic (`asofNearest` negates it inside its struct key), so a
    * non-integral match column would be silently truncated to long.
    * Enforce the contract at the schema instead. */
  private def requireIntegral(df: DataFrame, valueCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"as-of match column '$valueCol' must be integral (byte/short/int/" +
        s"long), got ${dt.simpleString}: the match value travels through " +
        "long tie-break keys and any other type would be truncated")
  }

  /** Returns `left` plus `matchCol` = `right(valueCol)` of the latest
    * right row with `right(tsCol) <= left(tsCol)` sharing `key` (null
    * if none precedes). `valueCol` must be an integral column
    * (enforced — see [[requireIntegral]]). */
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
    requireIntegral(right, valueCol)
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

  /** NEAREST-within-tolerance as-of join — the sensor-alignment
    * variant of [[asofJoin]]: for every left row, the right row
    * minimizing |l.ts − r.ts| per key, provided the distance is within
    * `toleranceSec`, else null. Ties resolve (|dt| asc, r.ts asc,
    * value asc) — backward beats forward at equal distance, smaller
    * value wins among simultaneous right rows.
    *
    * Same union+window composition, run in BOTH directions: the
    * backward pass is [[asofJoin]]'s (ts, tag) scan; the forward pass
    * scans (ts DESC, tag) so `last` yields the EARLIEST right at or
    * after the left row. Per-side nearest is monotone in distance, so
    * applying the tolerance after the per-side pick equals restricting
    * candidates first (a farther-back row can never beat the nearest
    * backward row). The right payload rides as struct(ts, −value):
    * struct order makes the within-timestamp winner (smallest value)
    * the LAST row of each window scan in both directions.
    *
    * Scale shape: one shuffle on the key, two window sorts — still no
    * candidate-pair explosion, state one carried struct per key per
    * direction.
    *
    * Output: `left.*`, `matchCol` (null if nothing within tolerance),
    * `dt_s` (whole seconds to the match, null when unmatched). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      valueCol: String,
      matchCol: String,
      toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"negative tolerance: $toleranceSec")
    val internal = Seq("_tag", "_r", "_b", "_f")
    require(internal.forall(c => !left.columns.contains(c)),
      s"asofNearest: left frame must not contain internal columns $internal")
    requireIntegral(right, valueCol)
    val r = right
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(key), col(tsCol),
        struct(col(tsCol).as("rts"),
          (-col(valueCol).cast("long")).as("negv")).as("_r"),
        lit(0).as("_tag"))
    val l = left.withColumn("_tag", lit(1))
    val tagged = l.unionByName(r, allowMissingColumns = true)
    val frame = Window.partitionBy(key)
    val wB = frame.orderBy(col(tsCol).asc, col("_tag").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // primary ts DESC walks forward-in-time windows; at equal ts the
    // struct's rts components tie, so _r ASC again leaves the smallest
    // value last
    val wF = frame.orderBy(col(tsCol).desc, col("_tag").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolUs = toleranceSec * 1000000L
    val dtb = unix_micros(col(tsCol)) - unix_micros(col("_b.rts"))
    val dtf = unix_micros(col("_f.rts")) - unix_micros(col(tsCol))
    val bOk = col("_b").isNotNull && dtb <= tolUs
    val fOk = col("_f").isNotNull && dtf <= tolUs
    tagged
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(wB))
      .withColumn("_f", last(col("_r"), ignoreNulls = true).over(wF))
      .filter(col("_tag") === 1)
      .withColumn(matchCol,
        when(bOk && (!fOk || dtb <= dtf), -col("_b.negv"))
          .when(fOk, -col("_f.negv")))
      .withColumn("dt_s",
        when(bOk && (!fOk || dtb <= dtf), dtb)
          .when(fOk, dtf) / lit(1000000L))
      .withColumn("dt_s", floor(col("dt_s")).cast("long"))
      .drop("_tag", "_r", "_b", "_f")
  }
}
