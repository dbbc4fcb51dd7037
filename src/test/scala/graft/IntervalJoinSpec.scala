package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Binned overlap join: identical to the naive predicate join, each
  * pair exactly once, any bin width, and the plan is an equi-join (no
  * nested loop / cartesian). */
class IntervalJoinSpec extends SparkSpec {

  // purchase windows [ts, ts+120s) over the whole corpus — no equi key
  private def purchases = Tables(spark, sf, "events")
    .filter(col("event_type") === "purchase")
    .select(
      col("event_id"),
      col("ts").cast("long").as("s"),
      (col("ts").cast("long") + 120L).as("e"))

  private def naivePairs = {
    val a = purchases.select(
      col("event_id").as("id1"), col("s").as("s1"), col("e").as("e1"))
    val b = purchases.select(
      col("event_id").as("id2"), col("s").as("s2"), col("e").as("e2"))
    a.crossJoin(b)
      .filter(col("s1") < col("e2") && col("s2") < col("e1") &&
        col("id1") < col("id2"))
      .select("id1", "id2")
  }

  test("matches the naive predicate join row-for-row") {
    val binned = IntervalJoin
      .overlapPairs(purchases, "event_id", "s", "e", binWidth = 120L)
      .select("id1", "id2")
    assert(binned.exceptAll(naivePairs).count() == 0)
    assert(naivePairs.exceptAll(binned).count() == 0)
  }

  test("bin width does not change the result (only the cost)") {
    val w120 = IntervalJoin
      .overlapPairs(purchases, "event_id", "s", "e", 120L)
      .select("id1", "id2").collect().toSet
    for (w <- Seq(7L, 60L, 3600L)) {
      val alt = IntervalJoin
        .overlapPairs(purchases, "event_id", "s", "e", w)
        .select("id1", "id2").collect().toSet
      assert(alt == w120, s"binWidth=$w diverged")
    }
  }

  test("each pair claimed exactly once — no duplicates even when an interval spans many bins") {
    // bin width far smaller than the interval length → every interval
    // explodes to ~18 bins and any overlapping pair co-occurs in many;
    // the max-start-bin claim must still emit it once
    val out = IntervalJoin
      .overlapPairs(purchases, "event_id", "s", "e", binWidth = 7L)
    assert(out.groupBy("id1", "id2").count().filter(col("count") > 1)
      .count() == 0)
  }

  test("overlap_start/overlap_len are the true intersection") {
    val row = IntervalJoin
      .overlapPairs(purchases, "event_id", "s", "e", 120L)
      .join(purchases.select(col("event_id").as("id1"), col("s").as("s1"),
        col("e").as("e1")), "id1")
      .join(purchases.select(col("event_id").as("id2"), col("s").as("s2"),
        col("e").as("e2")), "id2")
      .filter(col("overlap_start") =!= greatest(col("s1"), col("s2")) ||
        col("overlap_len") =!=
          least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")))
    assert(row.count() == 0)
    // and every overlap is positive by construction
    assert(IntervalJoin.overlapPairs(purchases, "event_id", "s", "e", 120L)
      .filter(col("overlap_len") <= 0).count() == 0)
  }

  test("plan is a shuffled equi-join on the bin — no nested loop, no cartesian") {
    val plan = IntervalJoin
      .overlapPairs(purchases, "event_id", "s", "e", 120L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("two-sided form: purchases overlapping error windows") {
    val errors = Tables(spark, sf, "events")
      .filter(col("event_type") === "error")
      .select(
        col("event_id").as("err_id"),
        col("ts").cast("long").as("es"),
        (col("ts").cast("long") + 300L).as("ee"))
    val got = IntervalJoin.overlapJoin(
      purchases, "s", "e", errors, "es", "ee", binWidth = 300L)
      .select("event_id", "err_id")
    val naive = purchases.crossJoin(errors)
      .filter(col("s") < col("ee") && col("es") < col("e"))
      .select("event_id", "err_id")
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }
}
