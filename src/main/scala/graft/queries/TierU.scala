package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Aggregators

/** Tier U — user-defined function surface (SURVEY.md §2.2 UDF note):
  * one typed Aggregator (UDAF), one scalar UDF, one generator-style
  * explode. These exist to prove the extension surface; the scalar UDF
  * is deliberately something a native expression could do — and the
  * Scaladoc says so — because on this engine UDFs are the escape hatch,
  * not the default (they run outside codegen and block predicate
  * pushdown through them).
  */
object TierU {

  /** Typed Aggregator registered as a UDAF, grouped per return flag. */
  private val uUdafComposite: Q = (s, d) => {
    val stats = udaf(Aggregators.revenueStats)
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(stats(col("l_extendedprice"), col("l_discount")).as("st"))
      .select(
        col("l_returnflag"), col("st.avg_rev").as("avg_rev"),
        col("st.max_rev").as("max_rev"), col("st.n").as("n"))
      .orderBy("l_returnflag")
  }

  /** Scalar Scala UDF (revenue). A native column expression computes the
    * identical value inside codegen — the UDF exists to exercise the
    * surface. */
  private val uUdfScalar: Q = (s, d) => {
    val revenue = udf((p: Double, disc: Double) => p * (1d - disc))
    Tables(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(revenue(col("l_extendedprice"), col("l_discount")), 4)
          .as("revenue"))
      .orderBy("l_orderkey", "l_linenumber", "revenue")
  }

  /** Generator surface: posexplode over a computed array — one output
    * row per token with its position. */
  private val uGenExplode: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  val queries: Map[String, Q] = Map(
    "u_udaf_composite" -> uUdafComposite,
    "u_udf_scalar" -> uUdfScalar,
    "u_gen_explode" -> uGenExplode)

  val oracle: Map[String, String] = Map(
    "u_udaf_composite" ->
      """SELECT l_returnflag,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS DOUBLE)
        |        / 1e6 / count(1), 4) AS avg_rev,
        |  round(CAST(max(CAST(round(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS DOUBLE)
        |        / 1e6, 4) AS max_rev,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "u_udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "u_gen_explode" ->
      """SELECT doc_id,
        |       CAST(unnest(range(len(string_split(text, ' ')))) AS INT) AS pos,
        |       unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, pos""".stripMargin)
}
