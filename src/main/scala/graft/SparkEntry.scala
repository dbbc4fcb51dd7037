package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory (SURVEY.md §2.2) is split across tier
  * objects; every entry here has a matching DuckDB oracle in [[oracleSql]]
  * unless the operation is not batch-SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way star join + denormalizing projection is the reference's one
    * declarative query (create_looker_data_table.sql) re-expressed on the
    * testdata star schema. */
  def entry(spark: SparkSession): DataFrame =
    queries("f_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TierF.queries ++ TierR.queries ++ TierP.queries ++ TierX.queries ++ TierS.queries ++ TierU.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for ops that are not
    * batch-SQL-expressible (driver records a rows-only check); see
    * [[oracleOmissions]]. */
  def oracleSql: Map[String, String] =
    TierF.oracle ++ TierR.oracle ++ TierP.oracle ++ TierX.oracle ++ TierS.oracle ++ TierU.oracle

  /** Queries intentionally shipped without a DuckDB oracle, with the
    * reason — the driver records a rows-only check for these. Empty as
    * of round 5: `x_stream_latedata` (the last omission) now pins its
    * microbatch order, making watermark eviction deterministic and
    * batch-oracle expressible. */
  def oracleOmissions: Map[String, String] = Map.empty
}
