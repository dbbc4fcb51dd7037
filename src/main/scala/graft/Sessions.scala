package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the engine's mains (Verify, Bench,
  * PlanDump) — one place for the conventions every session needs:
  * shuffle partitions sized to cores (not the 200 default), UTC, UI
  * off. */
object Sessions {
  def localBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
