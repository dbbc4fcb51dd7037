package graft.operators

import org.apache.spark.sql.DataFrame

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
}
