package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Tier P — reshaping operators: pivot (long→wide) and unpivot
  * (wide→long). The reference's BI layer does this interactively in
  * Looker; here they are engine operators.
  *
  * Pivot values are DECLARED (the five known event types), not
  * discovered — `pivot(col)` without values triggers an extra
  * distinct-collect job and makes the output schema data-dependent,
  * which breaks at scale and in fixed-schema sinks. Unpivot uses the
  * native `unpivot` API (Spark's melt), which plans as a Generate —
  * one pass, no union of self-scans.
  */
object TierP {

  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Long→wide: per-user event counts, one column per event type. */
  private val rPivot: Q = (s, d) =>
    Tables(s, d, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .count()
      .na.fill(0L, eventTypes)
      .orderBy("user_id")

  /** Wide→long: melt the pivoted frame back to (user_id, event_type, n)
    * — round-trips [[rPivot]] minus the zero rows it manufactured. */
  private val rUnpivot: Q = (s, d) =>
    rPivot(s, d)
      .unpivot(
        Array(col("user_id")),
        eventTypes.map(col).toArray,
        "event_type", "n")
      .filter(col("n") > 0)
      .orderBy("user_id", "event_type")

  val queries: Map[String, Q] = Map(
    "r_pivot" -> rPivot,
    "r_unpivot" -> rUnpivot)

  private def caseSum(t: String) =
    s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\""

  val oracle: Map[String, String] = Map(
    "r_pivot" ->
      s"""SELECT user_id,
         |       ${eventTypes.map(caseSum).mkString(",\n       ")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "r_unpivot" ->
      """SELECT user_id, event_type, count(1) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin)
}
