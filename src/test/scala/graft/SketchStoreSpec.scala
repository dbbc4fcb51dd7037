package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchStore

/** Mergeable-sketch store: union of per-group sketches estimates the
  * global distinct count, survives a parquet round-trip, and the
  * estimate is split-invariant (the monoid property the 100 TB
  * incremental pattern rests on). */
class SketchStoreSpec extends SparkSpec {

  private def events = Tables(spark, sf, "events").select(
    to_date(col("ts")).as("event_date"),
    col("event_type"), col("user_id"))

  test("rollup of day sketches matches exact distinct within tolerance") {
    val store = SketchStore.buildSketches(
      events, Seq("event_date", "event_type"), "user_id")
    val est = SketchStore.rollup(store, Seq("event_type"))
      .select("event_type", "approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, n) <- exact) {
      val e = est(t)
      assert(math.abs(e - n).toDouble / n <= 0.05, s"$t: est=$e exact=$n")
    }
  }

  test("estimate is split-invariant: day-sketch union == direct sketch") {
    // the same values sketched in one pass vs sketched per day and
    // merged — the HLL union monoid makes these the same register
    // state, so the ESTIMATES are identical, not merely close
    val direct = events
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), 14).as(SketchStore.SketchCol),
        count(lit(1)).as(SketchStore.RowCountCol))
    val viaDays = SketchStore.rollup(
      SketchStore.buildSketches(
        events, Seq("event_date", "event_type"), "user_id"),
      Seq("event_type"))
    val directEst = direct.select(col("event_type"),
        round(hll_sketch_estimate(col(SketchStore.SketchCol)))
          .cast("long").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mergedEst = viaDays.select(col("event_type"),
        col("approx_distinct").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(directEst == mergedEst)
  }

  test("store round-trips through parquet; rollup reads sketches only") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_spec").toString
    val store = SketchStore.buildSketches(
      events, Seq("event_date", "event_type"), "user_id")
    SketchStore.writeStore(store, dir)
    val back = SketchStore.readStore(spark, dir)
    // binary column survives the round trip bit-for-bit
    assert(back.schema(SketchStore.SketchCol).dataType.typeName == "binary")
    val a = SketchStore.rollup(store, Seq("event_type")).collect().toSet
    val b = SketchStore.rollup(back, Seq("event_type")).collect().toSet
    assert(a == b)
    // grand-total rollup from the same store: n_rows exactly the corpus
    val tot = SketchStore.rollup(back, Nil).head()
    assert(tot.getAs[Long](SketchStore.RowCountCol) == events.count())
  }

  test("streaming-maintained store == one-shot batch store") {
    // the x_stream_sketch contract: per-batch HLL partials union-merged
    // across micro-batches give the SAME register state as one pass, so
    // the maintained store's rollup rows (estimates included) are
    // identical to the batch store's — not merely within tolerance
    val maintained = graft.streaming.StreamOps
      .sketchStoreMaintainRun(spark, sf)
      .collect().toSet
    val batchStore = SketchStore.buildSketches(
      events, Seq("event_date", "event_type"), "user_id")
    val approx = SketchStore.rollup(batchStore, Seq("event_type"))
      .unionByName(SketchStore.rollup(batchStore, Nil)
        .withColumn("event_type", lit("__all__")))
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
      .unionByName(events.agg(countDistinct("user_id").as("n_users"))
        .withColumn("event_type", lit("__all__")))
    val batch = approx.join(exact, "event_type")
      .select(
        col("event_type"), col("n_sketches"),
        col(SketchStore.RowCountCol).as("n_events"), col("n_users"),
        (abs(col("approx_distinct") - col("n_users")).cast("double")
          / col("n_users") <= 0.05).as("approx_ok"))
      .collect().toSet
    assert(maintained == batch)
  }
}
