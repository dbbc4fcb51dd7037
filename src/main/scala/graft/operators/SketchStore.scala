package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.{FreqMaxError, FreqSketchAgg, FreqTopItems, FreqUnionAgg, KllQuantile, KllSketchAgg, KllUnionAgg, ThetaEstimate, ThetaSetOp, ThetaSketchAgg, ThetaUnionAgg}

/** Mergeable-sketch store: persist per-partition HLL sketches at
  * ingest time, answer distinct-count rollups later by merging the
  * sketches — never rescanning the base table.
  *
  * `COUNT(DISTINCT x)` is the one aggregate that does NOT decompose
  * over partial results — yesterday's distinct count and today's
  * distinct count don't add. At 100 TB that makes every "distinct
  * users last N days / per domain / all time" question a full rescan
  * of N days of raw data, and it is THE canonical reason warehouses
  * keep sketch columns next to their rollup tables. The fix is a
  * mergeable sketch: Apache DataSketches HLL (Spark's native
  * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, backed
  * by the datasketches-java library) forms a commutative monoid under
  * union, so
  *
  *   estimate(union(sketch(day1), ..., sketch(dayN)))
  *     ≈ |distinct over day1..dayN|
  *
  * with relative standard error ~1.04/sqrt(2^lgK) (~0.8% at the
  * default lgK = 14), independent of how the data was split. The
  * pipeline shape:
  *
  *  - [[buildSketches]] at ingest: one distributed aggregate per
  *    ingest batch over the finest rollup grain (e.g. day × domain);
  *    partial sketches merge map-side, so the shuffle carries one
  *    ~KB sketch per (partition, group), not raw values.
  *  - [[writeStore]]: the sketch table lands in parquet — sketches are
  *    plain `binary` columns, so the store needs no special format and
  *    any later reader can merge them.
  *  - [[rollup]] at query time: group the STORE (KBs per row) by any
  *    coarser key subset and `hll_union_agg` — a query over 30 days ×
  *    10k domains touches 300k sketch rows (~GBs) instead of 100 TB of
  *    raw events, and the same store answers day-level, domain-level
  *    and grand-total questions without another base scan.
  *
  * Accuracy is an explicit contract, not a hope: the declared query
  * (`x_sketch_rollup`) emits the exact distinct count next to an
  * `approx_ok` bound check, the same bounded-oracle pattern as
  * `r_agg_approx_distinct` — the sketch bytes are engine-specific, the
  * tolerance is portable.
  */
object SketchStore {

  val SketchCol = "sketch"
  val QSketchCol = "qsketch"
  val TSketchCol = "tsketch"
  val FSketchCol = "fsketch"
  val RowCountCol = "n_rows"

  /** One HLL sketch of `valueCol`'s distinct values per `keyCols`
    * group, plus the exact row count (row counts DO decompose, so the
    * store carries them for free — rollups get exact volumes and
    * approximate distincts from the same table).
    *
    * lgK = 14 → 16 KiB max sketch, ~0.8% RSE; the store is pure
    * overhead-per-group, so the default favors accuracy. The aggregate
    * is a standard partial/final hash aggregate: map-side partials
    * sketch locally and the exchange carries sketch bytes only.
    */
  def buildSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 14): DataFrame = {
    require(keyCols.nonEmpty, "buildSketches needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(valueCol), lgK).as(SketchCol),
        count(lit(1)).as(RowCountCol))
  }

  /** Persist the sketch table. Overwrite: a store build is a pure
    * function of its input batch, so re-running an ingest is
    * idempotent. At scale the store would be partitioned by the ingest
    * grain (e.g. `partitionBy(date)`) so incremental builds append one
    * partition per batch; the declared query rebuilds the whole
    * (tiny) store per run, which keeps the round-trip deterministic.
    */
  def writeStore(sketches: DataFrame, path: String): Unit =
    sketches.write.mode("overwrite").parquet(path)

  def readStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Distinct-count rollup over the STORE alone: group by any subset
    * of the build keys (empty = grand total), union the sketches,
    * estimate. `n_sketches` = how many stored groups merged into each
    * output row and `n_rows` = exact row volume — both come from the
    * store, so the base table is never touched.
    *
    * The estimate is rounded to a LONG: a distinct count is integral,
    * and the long keeps the output schema oracle-portable.
    */
  def rollup(store: DataFrame, groupCols: Seq[String]): DataFrame = {
    val aggs = Seq(
      round(hll_sketch_estimate(hll_union_agg(col(SketchCol))))
        .cast("long").as("approx_distinct"),
      count(lit(1)).as("n_sketches"),
      sum(col(RowCountCol)).as(RowCountCol))
    if (groupCols.isEmpty) store.agg(aggs.head, aggs.tail: _*)
    else store.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---- quantile half (KLL; see expressions/KllSketch.scala) ----------

  /** `kll_sketch_agg(value, k)` as a Column (native
    * TypedImperativeAggregate — partial/final, sketch bytes on the
    * exchange). */
  def kllSketchAgg(value: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(value), k).toAggregateExpression())

  /** `kll_union_agg(sketch[, k])` as a Column — merge stored sketches.
    * Pass the store's build k: KLL unions adapt DOWNWARD, so a default
    * k=200 buffer would silently cap a higher-k store's accuracy. */
  def kllUnionAgg(sketch: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(sketch), k)
        .toAggregateExpression())

  /** `kll_quantile(sketch, rank)` as a Column. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    ColumnBridge.column(
      KllQuantile(ColumnBridge.expression(sketch), Literal(rank)))

  /** One KLL quantile sketch of `valueCol` per `keyCols` group, plus
    * the exact row count — the quantile analog of [[buildSketches]];
    * same store layout contract, `qsketch` binary column. */
  def buildQuantileSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Int = 200): DataFrame = {
    require(keyCols.nonEmpty,
      "buildQuantileSketches needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        kllSketchAgg(col(valueCol).cast("double"), k).as(QSketchCol),
        count(lit(1)).as(RowCountCol))
  }

  /** Quantile rollup over the quantile STORE alone: merge the stored
    * sketches per `groupCols` (empty = grand total) and extract one
    * `q_<pct>` column per requested rank — e.g. ranks 0.5/0.95 →
    * `q_50`, `q_95`. Base table never touched, same as [[rollup]]. */
  def quantileRollup(
      store: DataFrame,
      groupCols: Seq[String],
      ranks: Seq[Double]): DataFrame = {
    require(ranks.nonEmpty, "quantileRollup needs at least one rank")
    val aggs = Seq(
      kllUnionAgg(col(QSketchCol)).as(QSketchCol),
      count(lit(1)).as("n_sketches"),
      sum(col(RowCountCol)).as(RowCountCol))
    val merged =
      if (groupCols.isEmpty) store.agg(aggs.head, aggs.tail: _*)
      else store.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val qCols = ranks.map(r =>
      kllQuantile(col(QSketchCol), r)
        .as(s"q_${math.round(r * 100)}"))
    merged.select(
      groupCols.map(col) ++
        Seq(col("n_sketches"), col(RowCountCol)) ++ qCols: _*)
  }

  // ---- set-algebra half (Theta; see expressions/ThetaSketch.scala) ---

  /** `theta_sketch_agg(value, lgK)` as a Column. */
  def thetaSketchAgg(value: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(value), lgK)
        .toAggregateExpression())

  /** `theta_union_agg(sketch)` as a Column — merge stored sketches. */
  def thetaUnionAgg(sketch: Column): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** `theta_intersect(a, b)` — sketch of A ∩ B (composable bytes). */
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetOp(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      intersect = true))

  /** `theta_a_not_b(a, b)` — sketch of A ∖ B (composable bytes). */
  def thetaANotB(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetOp(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      intersect = false))

  /** `theta_estimate(sketch)` — estimated distinct count (exact while
    * the sketch is in exact mode). */
  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))

  /** One theta sketch of `valueCol`'s distinct values per `keyCols`
    * group — the set-algebra analog of [[buildSketches]]; same store
    * layout contract, `tsketch` binary column. */
  def buildThetaSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty,
      "buildThetaSketches needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        thetaSketchAgg(col(valueCol), lgK).as(TSketchCol),
        count(lit(1)).as(RowCountCol))
  }

  // ---- heavy-hitters half (Misra-Gries; expressions/FreqSketch.scala)

  /** `freq_sketch_agg(item, maxMapSize)` as a Column (native
    * TypedImperativeAggregate — partial/final, sketch bytes on the
    * exchange). */
  def freqSketchAgg(item: Column, maxMapSize: Int = 256): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(item), maxMapSize)
        .toAggregateExpression())

  /** `freq_union_agg(sketch[, maxMapSize])` as a Column — merge stored
    * sketches. Pass the store's build maxMapSize: merge routes items
    * through the union buffer's update(), so the BUFFER's map caps
    * merged accuracy (mirror of [[kllUnionAgg]]'s k rule; see
    * [[graft.expressions.FreqUnionAgg]]). */
  def freqUnionAgg(sketch: Column, maxMapSize: Int = 256): Column =
    ColumnBridge.column(
      FreqUnionAgg(ColumnBridge.expression(sketch), maxMapSize)
        .toAggregateExpression())

  /** `freq_max_error(sketch)` as a Column — 0 ⟺ still exact mode
    * (never purged); queries whose oracle needs item-set equality
    * with the exact HAVING set assert on this. */
  def freqMaxError(sketch: Column): Column =
    ColumnBridge.column(FreqMaxError(ColumnBridge.expression(sketch)))

  /** `freq_top_items(sketch, threshold)` as a Column —
    * array<struct<item, est, lb, ub>> of every item whose true count
    * may exceed `threshold` (no false negatives). */
  def freqTopItems(sketch: Column, threshold: Column): Column =
    ColumnBridge.column(FreqTopItems(
      ColumnBridge.expression(sketch), ColumnBridge.expression(threshold)))

  /** One frequent-items sketch of `valueCol` per `keyCols` group — the
    * heavy-hitters analog of [[buildSketches]]; same store layout
    * contract, `fsketch` binary column. Unlike the other three halves
    * the sketched statistic is WEIGHTED occurrence (every row counts),
    * not distinct presence, so `n_rows` doubles as the exact stream
    * length each sketch summarized — rollups derive support thresholds
    * (e.g. "count > 2% of the stream") from the store alone. */
  def buildFreqSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      maxMapSize: Int = 256): DataFrame = {
    require(keyCols.nonEmpty,
      "buildFreqSketches needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        freqSketchAgg(col(valueCol), maxMapSize).as(FSketchCol),
        count(lit(1)).as(RowCountCol))
  }
}
