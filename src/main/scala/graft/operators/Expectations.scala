package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: a set of named constraints validated
  * against a frame in (almost) one pass, returning one row per
  * constraint — the admission check a pipeline runs before letting a
  * new batch into the warehouse (the reference pipeline trusts its
  * source blindly; any scheduled ingest grows this gate first). The
  * shape follows the published Deequ/"unit tests for data" pattern:
  * constraints compile to aggregate expressions over a SINGLE scan, so
  * adding a constraint adds a column to one aggregate row, not a new
  * job.
  *
  * Two constraint families:
  *  - aggregate-expressible ([[NotNull]], [[Unique]], [[InRange]],
  *    [[InSet]]): each becomes one `sum(when(...))`/`count_distinct`
  *    column of one `agg` — a map-side-combined single pass whatever
  *    the constraint count;
  *  - [[RefIntegrity]]: needs the reference table, so each adds one
  *    left-anti join (broadcast when the dimension is small, shuffled
  *    hash otherwise — Catalyst's choice, not hand-scheduled).
  *
  * Violation semantics: NULL fails [[InRange]] and [[InSet]] (an
  * unparseable value is not "in range"), and a NULL foreign key fails
  * [[RefIntegrity]] (it matches no reference row) — declare a
  * [[NotNull]] alongside when the distinction matters.
  *
  * Output: (check_name, violations, passed), one row per constraint.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** violations = rows where `column` IS NULL. */
  final case class NotNull(name: String, column: String) extends Check

  /** violations = n_rows − n_distinct(`column`) — 0 iff the column is
    * a key. (Exact distinct; swap for approx_count_distinct at the
    * 100 TB tier when a bounded answer is acceptable.) */
  final case class Unique(name: String, column: String) extends Check

  /** violations = rows where `column` is NULL or outside [lo, hi]. */
  final case class InRange(
      name: String, column: String, lo: Double, hi: Double) extends Check

  /** violations = rows whose value (or NULL) is not in `allowed`. */
  final case class InSet(
      name: String, column: String, allowed: Seq[String]) extends Check

  /** violations = rows whose `column` has no match in
    * `ref(refColumn)` — orphaned foreign keys (NULL included). */
  final case class RefIntegrity(
      name: String, column: String, ref: DataFrame, refColumn: String)
    extends Check

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    val (ri, agg) = checks.partition(_.isInstanceOf[RefIntegrity])
    // every aggregate-expressible constraint is one column of ONE
    // aggregate row over one scan
    val aggCols: Seq[Column] = agg.map {
      case NotNull(n, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(n)
      case Unique(n, c) =>
        (count(lit(1)) - count_distinct(col(c))).as(n)
      case InRange(n, c, lo, hi) =>
        sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
          .otherwise(0L)).as(n)
      case InSet(n, c, allowed) =>
        sum(when(col(c).isin(allowed: _*), 0L).otherwise(1L)).as(n)
      case other =>
        throw new IllegalArgumentException(s"not aggregate-expressible: $other")
    }
    val aggRows: Option[DataFrame] =
      if (agg.isEmpty) None
      else Some(df.agg(aggCols.head, aggCols.tail: _*)
        // 1 row × k metric columns → k (check_name, violations) rows;
        // inline of a literal-name struct array keeps it one projection
        .select(explode(array(agg.map(c => struct(
          lit(c.name).as("check_name"),
          col(c.name).cast("long").as("violations"))): _*)).as("kv"))
        .select(col("kv.check_name"), col("kv.violations")))
    val riRows: Seq[DataFrame] = ri.map {
      case RefIntegrity(n, c, ref, rc) =>
        // alias both sides: when the fact FK and reference key share a
        // name (the common case), unaliased refs are ambiguous at
        // analysis time
        df.select(col(c).as("_graft_fk"))
          .join(ref.select(col(rc).as("_graft_ref")),
            col("_graft_fk") === col("_graft_ref"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"),
            col("violations").cast("long").as("violations"))
      case other =>
        throw new IllegalStateException(s"unexpected check: $other")
    }
    (aggRows.toSeq ++ riRows)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
  }
}
