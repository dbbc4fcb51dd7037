package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchStore

/** Theta sketch set algebra: exact in exact mode, split-merge
  * invariant, composable set ops, SQL surface wired. */
class ThetaSketchSpec extends SparkSpec {

  import spark.implicits._

  test("exact mode: estimate of 1000 distinct longs is exactly 1000") {
    val df = (1L to 1000L).toDF("v")
    val got = df.agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .select(SketchStore.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(got == 1000.0)
  }

  test("set algebra is exact in exact mode: intersect / a-not-b / union") {
    // A = 1..600, B = 401..1000 → |A∩B| = 200, |A∖B| = 400, |A∪B| = 1000
    val df = (1L to 600L).map(v => ("a", v))
      .++((401L to 1000L).map(v => ("b", v))).toDF("side", "v")
    val sks = df.groupBy("side")
      .agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
    val row = sks.agg(
        SketchStore.thetaUnionAgg(
          when(col("side") === "a", col("sk"))).as("ska"),
        SketchStore.thetaUnionAgg(
          when(col("side") === "b", col("sk"))).as("skb"),
        SketchStore.thetaUnionAgg(col("sk")).as("skall"))
      .select(
        SketchStore.thetaEstimate(
          SketchStore.thetaIntersect(col("ska"), col("skb"))).as("i"),
        SketchStore.thetaEstimate(
          SketchStore.thetaANotB(col("ska"), col("skb"))).as("d"),
        SketchStore.thetaEstimate(col("skall")).as("u"))
      .head()
    assert(row.getDouble(0) == 200.0)
    assert(row.getDouble(1) == 400.0)
    assert(row.getDouble(2) == 1000.0)
  }

  test("set ops COMPOSE on sketch bytes: (A ∩ B) ∖ C") {
    // A = 1..100, B = 51..150, C = 60..70 → (A∩B)∖C = 51..59 ∪ 71..100
    val df = ((1L to 100L).map(("a", _)) ++ (51L to 150L).map(("b", _)) ++
      (60L to 70L).map(("c", _))).toDF("side", "v")
    val got = df.groupBy("side")
      .agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .agg(
        SketchStore.thetaUnionAgg(
          when(col("side") === "a", col("sk"))).as("ska"),
        SketchStore.thetaUnionAgg(
          when(col("side") === "b", col("sk"))).as("skb"),
        SketchStore.thetaUnionAgg(
          when(col("side") === "c", col("sk"))).as("skc"))
      .select(SketchStore.thetaEstimate(
        SketchStore.thetaANotB(
          SketchStore.thetaIntersect(col("ska"), col("skb")),
          col("skc"))))
      .head().getDouble(0)
    assert(got == 39.0) // 9 + 30
  }

  test("union of split sketches == direct sketch (merge invariance)") {
    val df = (1L to 1000L).map(v => (v % 7, v)).toDF("part", "v")
    val direct = df.agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .select(SketchStore.thetaEstimate(col("sk"))).head().getDouble(0)
    val merged = df.groupBy("part")
      .agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .agg(SketchStore.thetaUnionAgg(col("sk")).as("sk"))
      .select(SketchStore.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(direct == merged)
  }

  test("all-null input yields an empty sketch with estimate 0") {
    val df = Seq[Option[Long]](None, None).toDF("v")
    val got = df.agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .select(SketchStore.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(got == 0.0)
  }

  test("string inputs sketch by value, not reference") {
    val df = Seq("x", "y", "x", "z").toDF("v")
    val got = df.agg(SketchStore.thetaSketchAgg(col("v")).as("sk"))
      .select(SketchStore.thetaEstimate(col("sk"))).head().getDouble(0)
    assert(got == 3.0)
  }

  test("SQL surface: theta_* functions end-to-end") {
    GraftFunctions.registerAll(spark)
    ((1L to 600L).map(("a", _)) ++ (401L to 1000L).map(("b", _)))
      .toDF("side", "v").createOrReplaceTempView("theta_vals")
    val got = spark.sql(
      """SELECT theta_estimate(theta_intersect(
        |         theta_union_agg(CASE WHEN side = 'a' THEN sk END),
        |         theta_union_agg(CASE WHEN side = 'b' THEN sk END))) AS i
        |FROM (SELECT side, theta_sketch_agg(v, 12) AS sk
        |      FROM theta_vals GROUP BY side)""".stripMargin)
      .head().getDouble(0)
    assert(got == 200.0)
  }
}
