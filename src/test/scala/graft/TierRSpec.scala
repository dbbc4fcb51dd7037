package graft

import org.apache.spark.sql.functions._

/** Tier R per-operator specs: semantic invariants + physical plan shape
  * (the 100 TB story is in the plan, not the row counts). */
class TierRSpec extends SparkSpec {
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String) = q(name).queryExecution.executedPlan.toString

  test("r_agg_group: partial aggregation precedes the shuffle") {
    val p = plan("r_agg_group")
    assert(p.contains("HashAggregate"))
    // partial+final pair: two HashAggregate nodes around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("r_agg_group: filter is pushed to the parquet scan") {
    val p = plan("r_agg_group")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("r_agg_approx_distinct: exact counts carried, 5% tolerance holds") {
    val rows = q("r_agg_approx_distinct").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = q("r_agg_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      val (n, ok) = rows(k)
      assert(n == v, s"flag $k exact-in-query $n != $v")
      assert(ok, s"flag $k approx outside 5% of $v")
    }
  }

  test("r_agg_rollup/cube/gsets cardinalities are consistent") {
    val nNation = 25L
    val nPrio = 5L
    assert(q("r_agg_rollup").count() == nNation * nPrio + nNation + 1)
    assert(q("r_agg_cube").count() == nNation * nPrio + nNation + nPrio + 1)
    assert(q("r_agg_gsets").count() == nNation + nPrio + 1)
  }

  test("r_join_left keeps every customer") {
    assert(q("r_join_left").count() == Tables(spark, sf, "customer").count())
  }

  test("r_join_semi + r_join_anti partition the customers") {
    val total = Tables(spark, sf, "customer").count()
    assert(q("r_join_semi").count() + q("r_join_anti").count() == total)
  }

  test("r_join_range plans an equi join, not a cartesian product") {
    val p = plan("r_join_range")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join"))
  }

  test("r_join_range emits pairs and each pair is time-ordered") {
    val df = q("r_join_range")
    assert(df.count() > 0)
    // ts2 > ts1 by construction; event ids are assigned in ts order in
    // this corpus, so id1 >= id2 would indicate a broken band predicate
    assert(df.filter(col("id1") >= col("id2")).count() == 0)
  }

  test("as-of join: inclusive match, no-predecessor null, latest wins") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L), // before any right -> null
      (1L, ts("2024-01-01 10:00:00"), 101L), // simultaneous right matches
      (1L, ts("2024-01-01 12:00:00"), 102L), // latest of two rights
      (2L, ts("2024-01-01 10:30:00"), 200L)  // other key isolated
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 11L),
      (1L, ts("2024-01-01 11:00:00"), 12L),
      (2L, ts("2024-01-01 10:00:00"), 21L)
    ).toDF("user_id", "ts", "event_id")
    val res = graft.operators.AsOfJoin
      .asofJoin(left, right, "user_id", "ts", "event_id", "click_id")
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(res == Map(
      100L -> None, 101L -> Some(11L), 102L -> Some(12L), 200L -> Some(21L)))
  }

  test("nearest as-of: direction, side ties, value ties, tolerance") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:01:40"), 100L), // fwd at dt 5 beats bwd at dt 10
      (2L, ts("2024-01-01 10:00:00"), 200L), // dt 5 both sides -> backward
      (3L, ts("2024-01-01 10:00:00"), 300L), // two rights AT the ts -> min id
      (4L, ts("2024-01-01 10:00:00"), 400L)  // only right is outside tolerance
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:01:30"), 10L),
      (1L, ts("2024-01-01 10:01:45"), 20L),
      (2L, ts("2024-01-01 09:59:55"), 31L),
      (2L, ts("2024-01-01 10:00:05"), 32L),
      (3L, ts("2024-01-01 10:00:00"), 7L),
      (3L, ts("2024-01-01 10:00:00"), 3L),
      (4L, ts("2024-01-01 10:20:00"), 40L)
    ).toDF("user_id", "ts", "event_id")
    val res = graft.operators.AsOfJoin
      .asofNearest(left, right, "user_id", "ts", "event_id",
        "click_id", toleranceSec = 600L)
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("dt_s")).map(_.toLong))).toMap
    assert(res(100L) == ((Some(20L), Some(5L))))
    assert(res(200L) == ((Some(31L), Some(5L))))
    assert(res(300L) == ((Some(3L), Some(0L))))
    assert(res(400L) == ((None, None)))
  }

  test("argmax composite key: price ties resolve to the smallest orderkey") {
    import spark.implicits._
    val ties = Seq(
      (1L, "P", 500.0), (2L, "P", 500.0),  // tied max
      (3L, "P", 100.0), (4L, "P", 100.0)   // tied min
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val micro = round(col("o_totalprice") * 1e6).cast("long")
    val r = ties.groupBy("o_orderpriority").agg(
      max_by(col("o_orderkey"),
        micro * 10000000L + (lit(9999999L) - col("o_orderkey")))
        .as("best"),
      min_by(col("o_orderkey"), micro * 10000000L + col("o_orderkey"))
        .as("worst")).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L)
  }

  test("as-of join plans one shuffle, no range-join explosion") {
    val p = plan("r_join_asof")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"))
  }

  test("r_window_rank emits at most 3 rows per customer") {
    val over = q("r_window_rank").groupBy("o_custkey").count()
      .filter(col("count") > 3)
    assert(over.count() == 0)
  }

  test("r_window_running final value equals the independent supplier total") {
    val finals = q("r_window_running")
      .groupBy("l_suppkey").agg(max("running_rev").as("final_rev"))
    val totals = Tables(spark, sf, "lineitem")
      .groupBy("l_suppkey")
      .agg(Conventions.moneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_rev"))
    val mismatch = finals.join(totals, "l_suppkey")
      .filter(abs(col("final_rev") - col("total_rev")) > 0.001)
    assert(mismatch.count() == 0)
  }

  test("r_sort_topk plans TakeOrderedAndProject (no global sort)") {
    assert(plan("r_sort_topk").contains("TakeOrderedAndProject"))
  }

  test("set ops are set-semantic (no duplicates)") {
    val i = q("r_set_intersect")
    val e = q("r_set_except")
    assert(i.count() == i.dropDuplicates().count())
    assert(e.count() == e.dropDuplicates().count())
    // except ∩ intersect = ∅
    assert(e.intersect(i).count() == 0)
  }

  test("range frame: same-day peers share one total; differs from rows frame") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // two same-day rows: a RANGE frame gives both the day's full total,
    // a ROWS frame gives the first row only its own revenue
    val t = Seq((1L, 10, 100.0), (1L, 10, 50.0), (1L, 12, 30.0))
      .toDF("k", "day", "rev")
    val range = Window.partitionBy("k").orderBy("day")
      .rangeBetween(-6, Window.currentRow)
    val rows = Window.partitionBy("k").orderBy("day", "rev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = t.select(col("day"), col("rev"),
      sum("rev").over(range).as("range_sum"),
      sum("rev").over(rows).as("rows_sum")).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val day10 = out.filter(_._1 == 10)
    assert(day10.forall(_._3 == 150.0))           // peers see the day total
    assert(day10.map(_._4).sorted.toSeq == Seq(50.0, 150.0)) // rows don't
    assert(out.find(_._1 == 12).get._3 == 180.0)  // 7-day trailing window
    // declared query: the 7-day window total is >= the row's own revenue
    val q1 = q("r_window_range_frame")
    assert(q1.count() == Tables(spark, sf, "lineitem").count())
  }

  test("transitions: per-from probabilities sum to 1, counts conserve") {
    val out = q("r_transitions").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      // n sums to n_from within each from_type
      assert(rows.map(_._2).sum == rows.head._3)
      // probabilities sum to ~1 (rounding at 4 decimals)
      assert(math.abs(rows.map(_._4).sum - 1.0) < 0.001)
    }
    // every (from, to) pair count is positive
    assert(out.forall(_._2 > 0))
  }

  test("resample: continuous day grid per user, zero-fill + carry-forward") {
    val out = q("r_resample").cache()
    // grid is gap-free: per user, row count == day span
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    val bad = out.groupBy("user_id")
      .agg(fmin("day").as("d0"), fmax("day").as("d1"),
        count(lit(1)).as("n"))
      .filter(col("n") =!= col("d1") - col("d0") + 1).count()
    assert(bad == 0)
    // gap rows are zero-count but carry the last seen value
    val gaps = out.filter(col("n_events") === 0)
    if (gaps.count() > 0)
      assert(gaps.filter(col("value_ff") === 0d).count() < gaps.count() ||
        out.filter(col("n_events") > 0).count() > 0)
    // totals conserve: sum of n_events equals the event count
    assert(out.agg(sum("n_events")).head.getLong(0) ==
      Tables(spark, sf, "events").count())
    out.unpersist()
  }

  test("window dist: cume_dist in (0,1], quartiles balanced within 1") {
    val out = q("r_window_dist").cache()
    assert(out.filter(col("cd") <= 0 || col("cd") > 1).count() == 0)
    assert(out.filter(col("pr") < 0 || col("pr") > 1).count() == 0)
    // ntile(4) balance: per priority, quartile sizes differ by at most 1
    val sizes = out.groupBy("o_orderpriority", "quartile").count()
      .groupBy("o_orderpriority")
      .agg((org.apache.spark.sql.functions.max("count") -
        org.apache.spark.sql.functions.min("count")).as("spread"))
    assert(sizes.filter(col("spread") > 1).count() == 0)
    out.unpersist()
  }

  test("funnel: stages require strict ordering, counts monotone") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 completes in order; user 2 clicks BEFORE viewing (click
    // must not count); user 3 views only
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    // run the same chain as the declared query on the crafted frame
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    assert(s1.count() == 3 && s2.count() == 1)
    assert(s2.head.getLong(0) == 1L)
    // corpus: declared query's stage counts are monotone non-increasing
    // and pct starts at 1.0
    val out = q("r_funnel").collect()
    val byStage = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byStage(1L) >= byStage(2L) && byStage(2L) >= byStage(3L))
    assert(out.find(_.getLong(0) == 1L).get.getDouble(3) == 1.0)
  }

  test("retention: cohort 0-offset row counts every cohort member") {
    val out = q("r_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // offsets are non-negative; offset-0 exists for every cohort and is
    // the cohort's max (a user is always active in their first week)
    assert(out.forall(_._2 >= 0))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val zero = rows.find(_._2 == 0L)
      assert(zero.isDefined)
      assert(rows.forall(_._3 <= zero.get._3))
    }
    // cohort sizes sum to the distinct-user count
    val users = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(out.filter(_._2 == 0L).map(_._3).sum == users)
  }

  test("r_scd2_lookup resolves each purchase to the status in effect at its ts") {
    val ev = Tables(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type").collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
    val rows = q("r_scd2_lookup").collect()
    assert(rows.length == purchases.length) // left join: every purchase kept
    // brute-force expectation: a purchase's status is the type of the
    // latest non-purchase event of its user at or before its timestamp
    val tsById = ev.map(r => r.getLong(0) -> r.getTimestamp(2)).toMap
    val log = ev.filter(_.getString(3) != "purchase")
      .groupBy(_.getLong(1))
      .map { case (u, g) => u -> g.sortBy(r => (r.getTimestamp(2).getTime,
        r.getLong(0))) }
    rows.foreach { r =>
      val ts = tsById(r.getLong(0))
      val expected = log.getOrElse(r.getLong(1), Array.empty)
        .takeWhile(e => !e.getTimestamp(2).after(ts)).lastOption
        .map(_.getString(3))
      assert(Option(r.getAs[String]("status")) == expected,
        s"purchase ${r.getLong(0)}: got ${r.getAs[String]("status")}, " +
          s"expected $expected")
    }
  }

  test("r_scd2_chain: one window pass (no recursion) assigns dense versions") {
    val out = q("r_scd2_chain")
    // the chain walk is a single row_number window over the gaps-free
    // SCD2 tiling — no recursive-CTE operator, no per-level join rounds
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("UnionLoop"))
    assert("Window \\[".r.findAllIn(plan).nonEmpty)
    val df = out.persist()
    // versions are dense 1..n per user, no gaps or duplicates, capped
    // by the explicit depth guard
    val bad = df.groupBy("user_id")
      .agg(min("ver").as("mn"), max("ver").as("mx"),
        count(lit(1)).as("n"), countDistinct("ver").as("nd"))
      .filter(col("mn") =!= 1L || col("mx") =!= col("n") ||
        col("nd") =!= col("n") || col("mx") > 25L)
    assert(bad.count() == 0)
    // the walk visits exactly the SCD2 rows (within the depth guard):
    // every chain row matches a dimension row on (user_id, eff_from_s)
    val dim = q("r_scd2").select("user_id", "event_type", "eff_from_s")
    assert(df.select("user_id", "event_type", "eff_from_s")
      .exceptAll(dim).count() == 0)
    df.unpersist()
  }

  private def planShape(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    df.collect() // finalize the adaptive plan before reading its shape
    val s = df.queryExecution.executedPlan.toString
    // "Window \[" matches only the Window exec node (not
    // WindowGroupLimit); the AQE plan string holds a Final AND an
    // Initial section, so per-section counts appear up to twice
    Map(
      "window" -> "Window \\[".r.findAllIn(s).size,
      "bhj" -> "BroadcastHashJoin".r.findAllIn(s).size,
      "smj" -> "SortMergeJoin".r.findAllIn(s).size,
      "agg" -> "HashAggregate".r.findAllIn(s).size,
      "expand" -> "Expand \\[".r.findAllIn(s).size)
  }

  test("r_window_rank_sql is plan- and value-identical to the DataFrame form") {
    val sqlForm = q("r_window_rank_sql")
    val dfForm = q("r_window_rank")
    // the three OVER w functions must share ONE Window node per plan
    // section, exactly as the DataFrame form's shared WindowSpec does
    val shape = planShape(sqlForm)
    assert(shape == planShape(dfForm), s"shapes diverged: $shape")
    assert(shape("window") >= 1 && shape("window") <= 2)
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("r_agg_rollup_sql is plan- and value-identical to the DataFrame form") {
    val sqlForm = q("r_agg_rollup_sql")
    val dfForm = q("r_agg_rollup")
    // same dim broadcast, same Expand (the rollup), no extra exchanges
    val shape = planShape(sqlForm)
    assert(shape == planShape(dfForm), s"shapes diverged: $shape")
    assert(shape("expand") >= 1 && shape("expand") <= 2 && shape("bhj") >= 1)
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("lateral top-2 is row-identical to the window-rank formulation, no nested loops") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val lat = q("r_join_lateral")
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val win = Tables(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "o_orderkey", "o_totalprice")
    assert(lat.exceptAll(win).count() == 0 && win.exceptAll(lat).count() == 0)
    lat.collect()
    val plan = lat.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral did not decorrelate:\n$plan")
  }

  test("quantile binning partitions the table into 4 orderly bins") {
    val bins = q("r_quantile_bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // the bins PARTITION the table: counts sum to the row count, and
    // quartile boundaries keep each bin near a quarter of the mass
    val total = Tables(spark, sf, "orders").count()
    assert(bins.map(_.getLong(1)).sum == total)
    bins.foreach { r =>
      val share = r.getLong(1).toDouble / total
      assert(share > 0.15 && share < 0.35, s"bin ${r.getInt(0)}: $share")
    }
    // avg price is strictly increasing across bins
    val avgs = bins.map(_.getDouble(3))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a < b })
  }

  test("r_interval_merge: islands tile the events, gap-separated, ≥ 300 s") {
    val out = q("r_interval_merge").collect()
    val nEvents = Tables(spark, sf, "events").count()
    assert(out.map(_.getLong(4)).sum == nEvents,
      "every event must land in exactly one island")
    out.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) - r.getLong(2))
      assert(r.getLong(5) >= 300000000L,
        "an island is at least one full interval long")
    }
    out.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.size).toSeq,
        s"user $u islands not consecutively numbered")
      sorted.iterator.sliding(2).withPartial(false).foreach { pair =>
        assert(pair(1).getLong(2) > pair(0).getLong(3),
          s"user $u islands overlap — merge failed")
      }
    }
  }

  test("r_interval_merge: brute-force re-merge matches for every user") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val span = 300000000L
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // start, end, n
      ts.foreach { t =>
        if (islands.nonEmpty && t <= islands.last._2) {
          val (s0, e0, n0) = islands.last
          islands(islands.size - 1) = (s0, math.max(e0, t + span), n0 + 1)
        } else islands += ((t, t + span, 1L))
      }
      islands.zipWithIndex.map { case ((s0, e0, n0), i) =>
        (u, i + 1L, s0, e0, n0)
      }
    }.toSet
    val got = q("r_interval_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("session_window boundary: an event at exactly prev+gap MERGES (probed)") {
    import spark.implicits._
    // probed empirically against Spark 4.1.2: session windows are
    // closed-boundary on merge — an event at exactly prev_ts + gap
    // still joins the session (merge when t <= prev_end), exactly the
    // touching-intervals-coalesce semantics of r_interval_merge; the
    // oracle's islands formulation must use the same boundary
    val df = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1120))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1180))))
      .toDF("user_id", "ts")
    val out = df
      .groupBy(col("user_id"), session_window(col("ts"), "120 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"), col("n"))
      .orderBy("s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1000000000L, 1300000000L, 3L)))
  }

  test("r_session_window_fn: native session_window matches an islands re-merge") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gap = 120000000L
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)] // start, end, n, e6 value sum
      sorted.foreach { case (_, t, v) =>
        val e6 = Math.round(v * 1e6)
        if (islands.nonEmpty && t <= islands.last._2) {
          val (s0, e0, n0, v0) = islands.last
          islands(islands.size - 1) =
            (s0, math.max(e0, t + gap), n0 + 1, v0 + e6)
        } else islands += ((t, t + gap, 1L, e6))
      }
      islands.map { case (s0, e0, n0, v0) => (u, s0, e0, n0, v0 / 1e6) }
    }.toSet
    val got = q("r_session_window_fn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("r_window_fill: IGNORE NULLS lag/lead match a driver-side scan") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getString(3) == "error") None else Some(r.getDouble(4))))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.map { i =>
        val prev = sorted.take(i).reverse.collectFirst {
          case (_, _, _, Some(v)) => v
        }
        val next = sorted.drop(i + 1).collectFirst {
          case (_, _, _, Some(v)) => v
        }
        (u, sorted(i)._2, sorted(i)._4, prev, next)
      }
    }.toSet
    val got = q("r_window_fill").collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1), opt(2), opt(3), opt(4))
    }.toSet
    assert(got == expected)
    // the injection produced genuine nulls AND genuine bridges
    assert(got.exists(_._3.isEmpty) && got.exists(r =>
      r._3.isEmpty && r._4.nonEmpty && r._5.nonEmpty))
  }

  test("r_interp_linear: interpolation matches a driver-side replay") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getString(3) == "error") None else Some(r.getDouble(4))))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.map { i =>
        val (_, eid, t, v) = sorted(i)
        val prev = sorted.take(i).reverse.collectFirst {
          case (_, _, pt, Some(pv)) => (pt, pv)
        }
        val next = sorted.drop(i + 1).collectFirst {
          case (_, _, nt, Some(nv)) => (nt, nv)
        }
        val filledV = (v, prev, next) match {
          case (Some(x), _, _)          => Some(x)
          case (None, None, None)       => None
          case (None, None, Some((_, nv))) => Some(nv)
          case (None, Some((_, pv)), None) => Some(pv)
          case (None, Some((pt, pv)), Some((nt, nv))) =>
            if (nt == pt) Some(r6((pv + nv) / 2))
            else Some(r6(pv + (nv - pv) * (t - pt).toDouble / (nt - pt)))
        }
        (u, eid, v, filledV, v.isEmpty && (prev.nonEmpty || next.nonEmpty))
      }
    }.toSet
    val got = q("r_interp_linear").collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1), opt(2), opt(3), r.getBoolean(4))
    }.toSet
    assert(got == expected)
    // the injection produced genuine interpolated rows strictly
    // BETWEEN their neighbors (not just boundary copies)
    assert(got.exists { case (_, _, v, f, filled) =>
      filled && v.isEmpty && f.nonEmpty
    })
  }

  test("scalar suites evaluate inside whole-stage codegen") {
    Seq("r_str_fns", "r_date_fns", "r_math_fns").foreach { n =>
      val df = q(n)
      df.collect() // materialize THIS plan: AQE only inserts codegen
      // wrappers once the final plan exists (count() would plan afresh)
      val p = df.queryExecution.executedPlan.toString
      // codegen spans render as "*(n) Op" in the final adaptive plan
      assert(p.contains("*(") || p.contains("WholeStageCodegen"),
        s"$n not codegen'd")
    }
  }
}
