package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.ChangeCapture

/** CDC materialization specs: SCD2 interval semantics and tombstone-
  * aware current-state apply, on crafted logs + tiling invariants over
  * the events corpus. */
class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: A, A (collapses), B, A; user 2: one row
  private lazy val log = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
    (1L, ts("2024-01-01 11:00:00"), 2L, "A"),
    (1L, ts("2024-01-01 12:00:00"), 3L, "B"),
    (1L, ts("2024-01-01 13:00:00"), 4L, "A"),
    (2L, ts("2024-01-02 09:00:00"), 5L, "X")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("scd2: run-collapse + effective-dated intervals + current flag") {
    val out = ChangeCapture.scd2(log,
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      attrCols = Seq("event_type"))
      .orderBy("user_id", "eff_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00")), false),
      (1L, "B", ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 13:00:00")), false),
      (1L, "A", ts("2024-01-01 13:00:00"), None, true),
      (2L, "X", ts("2024-01-02 09:00:00"), None, true)))
  }

  test("scd2 on the corpus: intervals tile per user, one current row each") {
    val events = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val out = ChangeCapture.scd2(events,
      Seq("user_id"), Seq("ts", "event_id"), Seq("event_type")).cache()
    // exactly one open-ended current row per user
    val users = events.select("user_id").distinct().count()
    assert(out.filter(col("is_current")).count() == users)
    assert(out.filter(col("eff_to").isNull && !col("is_current")).count() == 0)
    // gap-free tiling: each row's eff_to equals the next row's eff_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("eff_from")
    val broken = out
      .withColumn("next_from", lead(col("eff_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("eff_to") =!= col("next_from"))
    assert(broken.count() == 0)
    // partition invariance
    val re = ChangeCapture.scd2(events.repartition(7),
      Seq("user_id"), Seq("ts", "event_id"), Seq("event_type"))
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  // ops log: k1 upserted then deleted; k2 deleted then re-upserted;
  // k3 upsert-only
  private lazy val opsLog = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "U", 10.0),
    (1L, ts("2024-01-01 11:00:00"), 2L, "D", 0.0),
    (2L, ts("2024-01-01 10:00:00"), 3L, "D", 0.0),
    (2L, ts("2024-01-01 11:00:00"), 4L, "U", 20.0),
    (3L, ts("2024-01-01 10:00:00"), 5L, "U", 30.0)
  ).toDF("user_id", "ts", "event_id", "op", "value")

  test("cdcApply: tombstone wins/loses by version order; n_versions audits all") {
    val out = ChangeCapture.cdcApply(opsLog,
      keyCols = Seq("user_id"), versionCols = Seq("ts", "event_id"),
      opCol = "op", payloadCols = Seq("value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("value"),
        r.getAs[Long]("n_versions")))
    // k1 deleted (absent), k2 re-created after tombstone, k3 plain
    assert(out.toSeq == Seq((2L, 20.0, 2L), (3L, 30.0, 1L)))
  }

  test("cross-operator: scd2's current row agrees with cdcApply's state") {
    // the two views of the same log must tell one story: for every key
    // cdcApply keeps (last op not a tombstone), its surviving attrs
    // equal the scd2 current interval's attrs
    val logC = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type"))
    val state = ChangeCapture.cdcApply(logC, Seq("user_id"),
      Seq("ts", "event_id"), "op", Seq("event_type"))
      .select(col("user_id"), col("event_type").as("state_type"))
    val current = ChangeCapture.scd2(
      logC.select("user_id", "ts", "event_id", "event_type"),
      Seq("user_id"), Seq("ts", "event_id"), Seq("event_type"))
      .filter(col("is_current"))
      .select(col("user_id"), col("event_type").as("hist_type"))
    val joined = state.join(current, "user_id")
    assert(joined.count() == state.count()) // every surviving key has history
    assert(joined.filter(col("state_type") =!= col("hist_type")).count() == 0)
  }

  test("cdcApply equals windowed recompute on the events corpus") {
    val logC = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type"), col("value"))
    val got = ChangeCapture.cdcApply(logC, Seq("user_id"),
      Seq("ts", "event_id"), "op", Seq("event_type", "value"))
      .select("user_id", "op", "event_type", "value", "n_versions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val exp = logC
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select("user_id", "op", "event_type", "value", "n_versions")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  test("snapshotDiff: added/removed/changed fates, unchanged dropped") {
    // older log: k1=10, k2=20, k3=30; newer log: k1=10 (unchanged),
    // k2=25 (changed), k4=40 (added); k3 absent from newer (removed)
    val older = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 09:00:00"), 0L, 99.0), // superseded version
      (2L, ts("2024-01-01 10:00:00"), 2L, 20.0),
      (3L, ts("2024-01-01 10:00:00"), 3L, 30.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val newer = Seq(
      (1L, ts("2024-01-02 10:00:00"), 4L, 10.0),
      (2L, ts("2024-01-02 10:00:00"), 5L, 25.0),
      (4L, ts("2024-01-02 10:00:00"), 6L, 40.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = ChangeCapture.snapshotDiff(older, newer,
      Seq("user_id"), Seq("ts", "event_id"), Seq("value"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // k1 unchanged (latest value equal despite version bump) -> absent
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // corpus: diff vs ITSELF is empty; diff against a prefix flags only
    // added/changed (append-only log can't lose keys)
    val ev = Tables(spark, sf, "events")
      .select("user_id", "event_type", "ts", "event_id", "value")
    val self = ChangeCapture.snapshotDiff(ev, ev,
      Seq("user_id", "event_type"), Seq("ts", "event_id"), Seq("value"))
    assert(self.count() == 0)
    val declared = SparkEntry.queries("x_snapshot_diff")(spark, sf)
    assert(declared.filter(col("status") === "removed").count() == 0)
  }

  test("snapshotDiff rejects reserved column names on EITHER input") {
    val clean = Seq((1L, 1L, 1.0)).toDF("k", "v", "value")
    val dirty = clean.withColumn("status", lit("x"))
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(dirty, clean, Seq("k"), Seq("v"), Seq("value"))
    }
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(clean, dirty, Seq("k"), Seq("v"), Seq("value"))
    }
  }
}
