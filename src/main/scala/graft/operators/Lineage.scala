package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Lineage truncation for iterative operators (connected components,
  * PageRank): both flavors of checkpoint cut the logical plan at a
  * materialized leaf — which is what keeps Catalyst from re-analyzing
  * a plan that grows by one round per iteration — but they differ in
  * fault tolerance:
  *
  *   - `localCheckpoint()` stores the partitions on the executors that
  *     computed them: zero extra I/O, but an executor loss kills the
  *     whole iterative computation (no lineage left to recompute from);
  *   - `checkpoint()` writes them to the SparkContext's checkpoint
  *     directory (HDFS/object store on a cluster): survives executor
  *     loss, at the cost of one write+read through durable storage per
  *     round.
  *
  * [[truncate]] picks reliably whenever the session has a checkpoint
  * directory configured — so a cluster deployment opts in with ONE line
  * (`spark.sparkContext.setCheckpointDir(...)`) and every iterative
  * operator upgrades together, while single-JVM runs (bench, verify,
  * local tests) keep the zero-I/O local form. Values are identical
  * either way; only the recovery story changes.
  */
object Lineage {

  /** Eagerly materialize `df` and truncate its lineage: reliable
    * `checkpoint()` if a checkpoint dir is set, `localCheckpoint()`
    * otherwise. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Scale-adaptive fan-out for a heavy ROW-LOCAL pass whose input
    * scan under-parallelizes the cluster. A parquet scan's task count
    * is bounded by the input's split structure (row groups / files);
    * when a corpus lands as few big splits, every per-row computation
    * chained before the first exchange (sketching, tokenizing,
    * resample weighting) runs on those few tasks while the rest of the
    * cluster idles. This helper repartitions up to the session's
    * default parallelism ONLY when the planned scan has fewer
    * partitions — at production scale a table has orders of magnitude
    * more splits than cores, the condition is false, and this is a
    * no-op (no exchange added). The partition-count read plans the
    * frame but runs no job.
    *
    * Use ONLY where the downstream per-row work measurably dominates
    * the shuffle this adds (see the `Probe fanout` negative result for
    * cheap-pass inputs: an exchange the pass doesn't amortize is a net
    * loss). Row order is not preserved; callers are aggregates/joins
    * whose results are order-independent. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** [[truncate]] plus observed aggregate metrics collected from the
    * SAME materialization job. Iterative loops need both "materialize
    * this round" and "did anything change" every round; running the
    * convergence aggregate as its own action doubles the round's job
    * count (and its fixed scheduling cost — the dominant cost of a
    * small round, and pure overhead at any scale). `observe` plants a
    * CollectMetrics node under the checkpoint, and both checkpoint
    * flavors execute through `withAction`, so the metrics arrive on the
    * listener bus as a side effect of the one job (verified on this
    * Spark version by `Probe obscheck`). The listener bus is async —
    * if the metrics somehow fail to arrive (a future Spark changing the
    * checkpoint action path), fall back to computing the same
    * aggregates from the materialized frame: one extra job, identical
    * values, never a hang. */
  def truncateObserved(
      df: DataFrame, metrics: Column*): (DataFrame, Map[String, Any]) = {
    val obs = new org.apache.spark.sql.Observation
    val cp = truncate(df.observe(obs, metrics.head, metrics.tail: _*))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val tWait = System.nanoTime()
    val m =
      try Await.result(Future(obs.get), 120.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          val row = cp.agg(metrics.head, metrics.tail: _*).head()
          row.schema.fieldNames.zipWithIndex
            .map { case (n, i) => n -> row.get(i) }.toMap
      }
    if (sys.env.contains("GRAFT_DEBUG_OBS"))
      System.err.println(f"[truncateObserved] wait ${(System.nanoTime() - tWait) / 1e6}%.0f ms")
    (cp, m)
  }
}
