package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchStore

/** KLL quantile sketches: exact in the small-n regime, merge ≡ direct
  * build under splits, in-bound at corpus scale, SQL surface wired. */
class KllSketchSpec extends SparkSpec {

  import spark.implicits._

  test("small-n regime is exact: p50 of 1..100 is the 50th order statistic") {
    // n = 100 < k = 200 — the sketch retains every value, so the
    // inclusive quantile is exactly the ceil(rank·n)-th smallest
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = df.agg(SketchStore.kllSketchAgg(col("v")).as("sk"))
      .select(
        SketchStore.kllQuantile(col("sk"), 0.5).as("p50"),
        SketchStore.kllQuantile(col("sk"), 1.0).as("p100"))
      .head()
    assert(got.getDouble(0) == 50.0)
    assert(got.getDouble(1) == 100.0)
  }

  test("union of split sketches == direct sketch in the exact regime") {
    val df = (1 to 100).map(i => (i % 4, i.toDouble)).toDF("part", "v")
    val direct = df.agg(SketchStore.kllSketchAgg(col("v")).as("sk"))
      .select(SketchStore.kllQuantile(col("sk"), 0.5)).head().getDouble(0)
    val merged = df.groupBy("part")
      .agg(SketchStore.kllSketchAgg(col("v")).as("sk"))
      .agg(SketchStore.kllUnionAgg(col("sk")).as("sk"))
      .select(SketchStore.kllQuantile(col("sk"), 0.5)).head().getDouble(0)
    assert(direct == merged)
    assert(direct == 50.0)
  }

  test("union at the store's k preserves accuracy above the 200 default") {
    // n = 1000 > k on both sides, so the sketch is in the estimating
    // regime; a k=400 store union-merged at k=400 must keep a k=400
    // buffer (KLL adapts DOWNWARD — a default k=200 union buffer
    // would silently cap the rollup at k=200 accuracy)
    val df = (1 to 1000).map(i => (i % 4, i.toDouble)).toDF("part", "v")
    val mergedBytes = df.groupBy("part")
      .agg(SketchStore.kllSketchAgg(col("v"), 400).as("sk"))
      .agg(SketchStore.kllUnionAgg(col("sk"), 400).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val merged = org.apache.datasketches.kll.KllDoublesSketch.wrap(
      org.apache.datasketches.memory.Memory.wrap(mergedBytes))
    assert(merged.getK == 400,
      s"union buffer degraded the store k: got ${merged.getK}")
    assert(merged.getN == 1000)
  }

  test("merged day sketches land within exact rank ± 5% on real data") {
    val ev = Tables(spark, sf, "events").select(
      to_date(col("ts")).as("event_date"),
      col("event_type"), col("value"))
    val store = SketchStore.buildQuantileSketches(
      ev, Seq("event_date", "event_type"), "value")
    val got = SketchStore
      .quantileRollup(store, Seq("event_type"), Seq(0.5, 0.95))
      .join(
        ev.groupBy("event_type").agg(expr(
          "percentile(value, array(0.45, 0.55, 0.90, 1.0))").as("q")),
        "event_type")
      .filter(
        !col("q_50").between(col("q")(0), col("q")(1)) ||
          !col("q_95").between(col("q")(2), col("q")(3)))
    assert(got.count() == 0)
  }

  test("empty sketch (all-null values) extracts NULL, not a crash") {
    val df = Seq[(Int, Option[Double])]((1, None), (1, None))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(SketchStore.kllSketchAgg(col("v")).as("sk"))
      .select(SketchStore.kllQuantile(col("sk"), 0.5).as("p"))
      .head()
    assert(out.isNullAt(0))
  }

  test("SQL surface: kll_sketch_agg / kll_union_agg / kll_quantile") {
    GraftFunctions.registerAll(spark)
    (1 to 100).map(i => (i % 4, i.toDouble)).toDF("part", "v")
      .createOrReplaceTempView("kll_vals")
    val got = spark.sql(
      """SELECT kll_quantile(kll_union_agg(sk), 0.5d) AS p50
        |FROM (SELECT part, kll_sketch_agg(v, 200) AS sk
        |      FROM kll_vals GROUP BY part)""".stripMargin)
      .head().getDouble(0)
    assert(got == 50.0)
  }

  test("quantile store round-trips through parquet") {
    val ev = Tables(spark, sf, "events").select(
      to_date(col("ts")).as("event_date"),
      col("event_type"), col("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kll_spec").toString
    SketchStore.writeStore(
      SketchStore.buildQuantileSketches(
        ev, Seq("event_date", "event_type"), "value"), dir)
    val back = SketchStore.readStore(spark, dir)
    // the store's sketches are bytes — rollup over the re-read store
    // must equal rollup over the in-memory frame (same merge inputs)
    val a = SketchStore.quantileRollup(back, Seq("event_type"), Seq(0.5))
      .select("event_type", "n_sketches", SketchStore.RowCountCol)
      .collect().toSet
    val b = SketchStore.quantileRollup(
        SketchStore.buildQuantileSketches(
          ev, Seq("event_date", "event_type"), "value"),
        Seq("event_type"), Seq(0.5))
      .select("event_type", "n_sketches", SketchStore.RowCountCol)
      .collect().toSet
    assert(a == b)
  }
}
