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

  /** Hash partition id of a key tuple: the persisted-state layout column
    * for [[writeCdcState]]/[[mergeIntoState]]. */
  private def partitionOf(keyCols: Seq[String], nBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  /** Materialize a change log's compacted state as a path-based table
    * MERGE can incrementally maintain.
    *
    * Layout: hash(key) % nBuckets partition directories (`_p=<k>`), so
    * a later merge prunes both its read and its rewrite to the
    * partitions its change batch touches. Tombstone winners are KEPT in
    * the table (LSM-style — op='D' rows survive compaction); that is
    * what makes the maintained state exactly replay-equivalent: a key
    * deleted in batch 1 and re-inserted in batch 2 still accumulates
    * the audit `n_versions` across both, which a filtered state table
    * would forget. Readers get current state via [[readCurrentState]]
    * (the tombstone filter applied at view time). */
  def writeCdcState(
      log: DataFrame,
      path: String,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      nBuckets: Int = 8): Unit =
    Dedup.latestByKey(log, keyCols, versionCols, opCol +: payloadCols)
      .withColumn("_p", partitionOf(keyCols, nBuckets))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("_p").parquet(path)

  /** MERGE a change batch into a [[writeCdcState]] table in place —
    * `MERGE INTO state USING changes ON key WHEN MATCHED ...` as a
    * read-modify-overwrite that touches ONLY the partitions the batch's
    * keys hash into:
    *
    *  1. the batch's distinct partition ids (≤ nBuckets scalars — the
    *     one piece of driver state) become a partition filter, so the
    *     state read scans only touched directories (PartitionFilters in
    *     the scan, pinned by SinkSpec);
    *  2. existing winners re-enter the same max-struct aggregate as the
    *     batch rows, weighted by their stored `n_versions`, so the new
    *     winner and audit count are exactly what a full-log replay
    *     computes (max is associative; the state row IS max(batch 1));
    *  3. the result overwrites via dynamic partition overwrite — only
    *     partitions present in the merged frame (the touched ones) are
    *     replaced, untouched directories are never rewritten (SinkSpec
    *     pins file-level identity).
    *
    * Scale: cost is |touched partitions| read + one aggregate over
    * (touched state ∪ batch) + |touched| rewrite — independent of the
    * table's total size when the batch is localized. */
  def mergeIntoState(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      nBuckets: Int = 8): Unit = {
    val dataCols = versionCols ++ (opCol +: payloadCols)
    val touched = changes
      .select(partitionOf(keyCols, nBuckets).as("_p"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val cur = spark.read.parquet(path)
      .filter(col("_p").isin(touched: _*))
    val unioned = cur
      .select(keyCols.map(col) ++ dataCols.map(col) :+
        col("n_versions").as("_w"): _*)
      .unionByName(changes.select(
        keyCols.map(col) ++ dataCols.map(col) :+ lit(1L).as("_w"): _*))
    unioned
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(dataCols.map(col): _*)).as("_latest"),
        sum("_w").as("n_versions"))
      .select(keyCols.map(col) ++
        dataCols.map(c => col(s"_latest.$c").as(c)) :+
        col("n_versions"): _*)
      .withColumn("_p", partitionOf(keyCols, nBuckets))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_p").parquet(path)
  }

  /** Current-state view of a [[writeCdcState]] table: tombstone winners
    * filtered at read time, layout column dropped. */
  def readCurrentState(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      opCol: String): DataFrame =
    spark.read.parquet(path).filter(col(opCol) =!= lit("D")).drop("_p")
}
