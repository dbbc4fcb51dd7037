package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distributed uncertainty estimation: the Poisson bootstrap.
  *
  * The classic bootstrap draws a multinomial resample over ALL n rows
  * per replicate — undistributable, because every row's count depends
  * on every other row's. For large n the per-row resample count
  * converges to Poisson(1), which is INDEPENDENT per row (Chamandy et
  * al., "Estimating Uncertainty for Massive Data Streams", Google
  * 2012) — so each row derives its own weight for every replicate and
  * the whole bootstrap distribution falls out of ONE weighted
  * aggregation pass: no resample materialization, no shuffle beyond
  * the |replicates|-group aggregate, embarrassingly parallel at any
  * scale.
  *
  * Determinism contract: the "draw" is [[Hashing.hash32]] of
  * (replicate, row-key) mapped through the Poisson(1) inverse CDF — no
  * RNG, partition-invariant, reproducible by the DuckDB oracle from
  * md5 arithmetic. `u = hash32 / 2^32` is exact (division by a power
  * of two), the CDF thresholds are shared double literals, and the
  * weighted sums accumulate scaled-integer values, so every replicate
  * mean is bit-identical across engines. Weights cap at 6
  * (P(X > 6) ≈ 6e-5 — a defined part of the contract, not an
  * approximation bug).
  */
object Stats {

  /** Cumulative Poisson(1) CDF, P(X ≤ k) for k = 0..5; u ≥ cdf(5) →
    * weight 6. The SAME literals appear in the oracle SQL — both
    * engines parse the decimal string to the nearest double, so
    * comparisons agree bit-for-bit. */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183)

  /** Per-replicate bootstrap means of `valueCol` over `reps`
    * hash-fated Poisson resamples. `keyCol` must be unique per row
    * (it seeds the draw). Output: (b, n_eff, boot_mean).
    *
    * The MD5 behind the portable draw is the dominant cost (one per
    * (row, replicate) would be n × reps digests), and a digest is 128
    * bits while a draw consumes 32 — so each md5('boot:' chunk ':'
    * key) seeds FOUR replicates (b = chunk·4 + lane, lane selecting
    * hex chars [lane·8+1, lane·8+8]), cutting digests 4× (measured
    * 4.7 s → ~1.6 s at sf0.1). Lanes of one MD5 are independent by
    * design of the digest; the DuckDB oracle extracts the identical
    * substrings, so the contract stays bit-identical cross-engine. */
  def poissonBootstrapMeans(
      df: DataFrame,
      valueCol: String,
      keyCol: String,
      reps: Int = 32): DataFrame = {
    require(reps >= 2, s"poissonBootstrapMeans: reps must be >= 2, got $reps")
    val chunks = (reps + 3) / 4
    // per-lane weight as a plain codegen'd column (NOT inside a
    // higher-order-function lambda, which would run conv/substr
    // interpreted per row — measured +2.8 s at sf0.1)
    def wtLane(j: Int): Column = {
      val u = expr(
        s"cast(conv(substr(h, ${j * 8 + 1}, 8), 16, 10) as bigint)")
        .cast("double") / lit(4294967296d)
      poissonCdf.zipWithIndex
        .foldLeft(when(lit(false), 0)) { case (acc, (c, k)) =>
          acc.when(u < lit(c), k)
        }
        .otherwise(6)
        .cast("long")
    }
    // the 4 lanes never materialize as rows: each (row, chunk) carries
    // its 4 weights as COLUMNS into a chunk-grouped aggregate (n × reps/4
    // rows through the hash aggregate instead of n × reps), and the
    // (chunk, lane) grid unfolds to the b = chunk·4 + lane replicate id
    // by a stack() over the |chunks|-row aggregate output
    val lanes = 0 until 4
    val aggCols = lanes.flatMap { j =>
      Seq(sum(col(s"w$j")).as(s"n$j"),
        sum(col(s"w$j") * col("q")).as(s"s$j"))
    }
    val stackArgs = lanes.map(j => s"$j, n$j, s$j").mkString(", ")
    // fanOut: the (row × chunk) md5 + lane-decode pass is heavy
    // row-local work chained straight onto the input scan — jobtrace
    // measured it as one 2.8 s single-task job at sf0.1 (the scan's
    // split count); no-op at scale (see [[Lineage.fanOut]])
    Lineage.fanOut(df).select(col(keyCol), col(valueCol),
        explode(expr(s"sequence(0, ${chunks - 1})")).as("c"))
      .withColumn("h", md5(concat(
        lit("boot:"), col("c").cast("string"),
        lit(":"), col(keyCol).cast("string"))))
      .withColumn("q", round(col(valueCol) * lit(1000000d)).cast("long"))
      .select(col("c") +: col("q") +:
        lanes.map(j => wtLane(j).as(s"w$j")): _*)
      .groupBy("c")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("c"),
        expr(s"stack(4, $stackArgs) as (j, n_eff, s)"))
      .withColumn("b", (col("c") * 4 + col("j")).cast("int"))
      .filter(col("b") < reps)
      .select(col("b"), col("n_eff"),
        (col("s").cast("double") / lit(1000000d) / col("n_eff"))
          .as("boot_mean"))
  }

  /** Per-group percentile clipping (winsorization) — the outlier
    * treatment a feature/metrics pipeline applies before aggregation:
    * values outside the group's [lo, hi] exact-interpolated percentiles
    * clamp to the boundary, and the group reports raw vs clipped means
    * plus how many rows were clamped.
    *
    * Determinism: Spark's exact `percentile` and DuckDB's
    * `quantile_cont` share the linear-interpolation definition (the
    * x_bootstrap_ci precedent), and both means accumulate
    * scaled-integer micro-units so the sums are order-free.
    *
    * Scale shape: one percentile aggregate over the groups (small
    * output), broadcast back onto the fact stream, one final
    * aggregate — the fact table shuffles once for the percentile pass
    * and once for the report, never sorts globally. (Exact percentile
    * holds per-group value multisets in the aggregate; at corpus scale
    * the drop-in refinement is `approx_percentile` with a pinned
    * accuracy — semantics then carry an error bound, which is why the
    * exact form is the declared contract here.)
    *
    * Output: (group, n, mean_raw, mean_clip, n_clipped, p_lo, p_hi). */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"invalid bounds [$lo, $hi]")
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile($valueCol, $lo)").as("p_lo"),
      expr(s"percentile($valueCol, $hi)").as("p_hi"))
    def microSum(c: Column) =
      sum(round(c * lit(1000000d)).cast("long")).cast("double") /
        lit(1000000d)
    df.join(broadcast(bounds), groupCol)
      .withColumn("cv",
        least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(microSum(col(valueCol)) / count(lit(1)), 4).as("mean_raw"),
        round(microSum(col("cv")) / count(lit(1)), 4).as("mean_clip"),
        sum(when(col(valueCol) < col("p_lo")
          || col(valueCol) > col("p_hi"), 1L).otherwise(0L))
          .as("n_clipped"),
        round(max(col("p_lo")), 4).as("p_lo"),
        round(max(col("p_hi")), 4).as("p_hi"))
  }
}
