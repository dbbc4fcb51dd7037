package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared shapes for the declared query tiers. */
package object queries {

  /** A declared query: (session, scale-factor dir) → result frame. */
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB oracle fragment for [[Conventions.moneySum]] — the exact,
    * order-independent scaled-integer decimal sum. Must stay textually
    * in sync with the Spark-side formula. */
  def moneySumSql(e: String): String =
    s"CAST(sum(CAST(round(($e) * 1e6) AS DECIMAL(28,0))) AS DOUBLE) / 1e6"
}
