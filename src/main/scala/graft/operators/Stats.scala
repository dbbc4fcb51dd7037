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
    * (it seeds the draw). Output: (b, n_eff, boot_mean). */
  def poissonBootstrapMeans(
      df: DataFrame,
      valueCol: String,
      keyCol: String,
      reps: Int = 32): DataFrame = {
    require(reps >= 2, s"poissonBootstrapMeans: reps must be >= 2, got $reps")
    val u = Hashing.hash32(concat(
      lit("boot:"), col("b").cast("string"),
      lit(":"), col(keyCol).cast("string")))
      .cast("double") / lit(4294967296d)
    val wt = poissonCdf.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (c, k)) =>
        acc.when(u < lit(c), k)
      }
      .otherwise(6)
    df.select(col(keyCol), col(valueCol),
        explode(expr(s"sequence(0, ${reps - 1})")).as("b"))
      .withColumn("wt", wt.cast("long"))
      .withColumn("q", round(col(valueCol) * lit(1000000d)).cast("long"))
      .groupBy("b")
      .agg(sum("wt").as("n_eff"),
        (sum(col("wt") * col("q")).cast("double")
          / lit(1000000d) / sum(col("wt"))).as("boot_mean"))
  }
}
