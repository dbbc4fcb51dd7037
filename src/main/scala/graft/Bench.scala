package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Benchmark main. Runs every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query wall
  * seconds plus plan-shape metrics.
  *
  * Methodology (review findings from rounds 1-2):
  *
  *   - Queries are consumed through the `noop` DataSourceV2 sink, not
  *     `.count()`. Under count Catalyst is free to drop the final sort
  *     and narrow projections, so ORDER BY cost was under-measured;
  *     a write executes the full plan and materializes every column
  *     while still discarding rows executor-side (no driver collect).
  *   - Each query executes TWICE and reports the per-query minimum
  *     (steady state). Back-to-back full runs on this co-tenant host
  *     showed a 13-15 s stop-the-world stall landing on a *different*
  *     query every run (r_agg_rollup 14.8 s then 1.5 s; r_agg_cube
  *     2.6 s then 15.7 s) — one-off JIT/GC/host noise, not plan cost.
  *     The single-execution sum is still reported as `cold_total` for
  *     transparency.
  *   - Each query also reports node counts from its post-execution
  *     (AQE-final) physical plan: parquet scans, shuffle exchanges,
  *     broadcast exchanges, and cartesian/nested-loop joins. Plan
  *     shape is the stable signal on a noisy shared host — a
  *     regression from 1 exchange to 3 is visible even when
  *     wall-clock jitter is ±30%.
  */
object Bench {

  /** Node counts parsed from the formatted explain of an executed
    * plan. Formatted mode prints one numbered line per operator
    * ("(3) Exchange"), so counting name occurrences on those lines is
    * exact, and it reflects the AQE final plan once the query ran. */
  private[graft] def planMetrics(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val opLines = plan.linesIterator
      .map(_.trim)
      .filter(_.matches("""^\(\d+\) .*"""))
      .toSeq
    def count(p: String) = opLines.count(_.matches(s"""^\\(\\d+\\) $p.*"""))
    Map(
      "scans" -> count("(Scan|BatchScan)"),
      "exchanges" -> count("Exchange"),
      "broadcasts" -> count("BroadcastExchange"),
      // true O(n*m) pairing — must stay 0 everywhere
      "cartesian" -> count("CartesianProduct"),
      // broadcast-NLJ: linear in the streamed side; legitimate for
      // deliberate tiny-side grids (brute-force ANN baseline, lang-ID
      // profiles, IVF centroid assignment), a bug anywhere else
      "bnlj" -> count("BroadcastNestedLoopJoin"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def consume(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm up the JVM/codegen and the common table reads so startup cost
    // doesn't land on whichever query happens to run first
    try consume(SparkEntry.queries("f_star_join")(spark, sfDir))
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): (Double, Map[String, Int]) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        consume(df)
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, planMetrics(df))
      }
      val (cold, steady, plans) = try {
        val (t1, _) = once()
        spark.catalog.clearCache() // operator-persisted frames: bound memory
        val (t2, p2) = once()
        (t1, math.min(t1, t2), p2)
      } catch {
        case e: Throwable =>
          // a broken query must be visible, not a plausible timing
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (-1.0, -1.0, Map.empty[String, Int])
      }
      spark.catalog.clearCache()
      (name, cold, steady, plans)
    }.toSeq

    val qs = results.map { case (k, _, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val planJson = results.map { case (k, _, _, m) =>
      val inner = m.toSeq.sortBy(_._1)
        .map { case (n, c) => s"\"" + n + "\":" + c }.mkString("{", ",", "}")
      s"\"" + k + "\":" + inner
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, _, v, _) if v >= 0 => v }.sum
    val coldTotal = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"queries":$qs,"plans":$planJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
