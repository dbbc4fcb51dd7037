package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization operators: turning an append-only
  * change log into warehouse tables — the batch-side complement of the
  * streaming ingest path (`StreamOps.incrementalIngestRun`) and of the
  * snapshot compaction primitive ([[Dedup.latestByKey]]).
  *
  * The reference's stated future work is scheduled batch processing of
  * new matches into its star schema (reference README.md:156-160); these
  * operators are the two standard shapes that processing takes once a
  * log of changes exists: the *current-state* view ([[cdcApply]], with
  * delete/tombstone semantics) and the *full-history* view ([[scd2]],
  * effective-dated type-2 slowly-changing dimensions).
  *
  * Scale design:
  *  - [[cdcApply]] is one partial+final aggregate (`max(struct(...))`)
  *    — no per-key window sort, a hot key costs one combiner cell; the
  *    tombstone filter is a post-aggregate projection over one row per
  *    key, never over the log.
  *  - [[scd2]] needs per-key ordering, so it windows on the key — the
  *    partition count is |keys|, and each task sorts only its keys'
  *    rows. Run-collapse happens BEFORE effective-dating, so the second
  *    window pass sees only change rows (|changes| ≤ |log|, typically
  *    ≪).
  */
object ChangeCapture {

  /** Materialize the CURRENT state of a keyed entity set from a change
    * log with upsert/delete operations.
    *
    * Each log row carries an `op` column: "U" (upsert — the payload is
    * the new state of the key) or "D" (delete — a tombstone removing the
    * key). The winner per key is the row with the greatest
    * (versionCols...) tuple; keys whose winning op is a tombstone are
    * absent from the output — exactly `MERGE INTO` semantics replayed
    * over the full log.
    *
    * Implementation rides on [[Dedup.latestByKey]]'s single max-struct
    * aggregate; `n_versions` counts ALL log entries for the key
    * (including tombstones), which is the audit column a backfill job
    * wants.
    *
    * Output: keyCols ++ versionCols ++ (opCol) ++ payloadCols ++
    * n_versions, one row per surviving key. */
  def cdcApply(
      log: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String]): DataFrame =
    Dedup.latestByKey(log, keyCols, versionCols, opCol +: payloadCols)
      .filter(col(opCol) =!= lit("D"))

  /** Keyed diff between two snapshots, each given as a change log
    * compacted to latest-per-key — the regression check a pipeline runs
    * between yesterday's and today's build of a table: which keys were
    * added, which disappeared, which changed payload.
    *
    * Both sides ride [[Dedup.latestByKey]] (one max-struct aggregate
    * each), then a single full-outer join on the keys decides each
    * key's fate; `unchanged` keys are dropped (the overwhelming
    * majority at scale — output is |delta|, not |table|). Value
    * comparison uses null-safe equality, so a payload legitimately
    * transitioning to/from NULL reads as `changed`, not `unchanged`.
    *
    * Output: keyCols ++ (status, old_<v>..., new_<v>...), one row per
    * non-identical key. */
  def snapshotDiff(
      older: DataFrame,
      newer: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("_in_a", "_in_b", "status")
    // both inputs: a reserved name on the `newer` side would collide
    // with the flag/status columns just as fatally
    require(!older.columns.exists(reserved.contains) &&
        !newer.columns.exists(reserved.contains),
      s"snapshotDiff: inputs must not contain ${reserved.mkString("/")}")
    def side(log: DataFrame, tag: String, flag: String) =
      Dedup.latestByKey(log, keyCols, versionCols, valueCols)
        .select(keyCols.map(col) ++
          valueCols.map(c => col(c).as(s"${tag}_$c")) :+
          lit(true).as(flag): _*)
    val a = side(older, "old", "_in_a")
    val b = side(newer, "new", "_in_b")
    val changed = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    a.join(b, keyCols, "full_outer")
      .withColumn("status",
        when(col("_in_a").isNull, "added")
          .when(col("_in_b").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .drop("_in_a", "_in_b")
  }

  /** Build a type-2 slowly-changing dimension from a change log: one row
    * per (key, run of identical tracked attributes), effective-dated
    * [eff_from, eff_to) with `eff_to` NULL on the current row.
    *
    * Consecutive log rows whose `attrCols` tuple is unchanged collapse
    * into one validity interval (run-collapse via a null-safe
    * lag-compare), then `eff_to` is the NEXT change's `eff_from` — the
    * standard gaps-free SCD2 contract: intervals per key tile the time
    * axis from the first change to the open-ended current row.
    *
    * `orderCols` must totally order the log per key (e.g. ts + a
    * tie-breaking id). Output: keyCols ++ attrCols ++ (eff_from = first
    * orderCol of the run, eff_to, is_current). */
  def scd2(
      log: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(Seq("_attrs", "_prev", "eff_from", "eff_to", "is_current")
      .forall(r => !log.columns.contains(r)),
      "scd2 reserves _attrs/_prev/eff_from/eff_to/is_current")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    val changes = log
      .withColumn("_prev", lag(attrs, 1).over(byKey))
      // null-safe inequality: the first row per key (lag NULL) starts a run
      .filter(!(attrs <=> col("_prev")))
    val effFrom = col(orderCols.head)
    changes
      .withColumn("eff_to", lead(effFrom, 1).over(byKey))
      .select(
        (keyCols ++ attrCols).map(col) ++ Seq(
          effFrom.as("eff_from"),
          col("eff_to"),
          col("eff_to").isNull.as("is_current")): _*)
  }
}
