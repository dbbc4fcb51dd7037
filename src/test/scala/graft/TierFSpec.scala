package graft

import org.apache.spark.sql.functions._

/** Per-operator unit tests for Tier F (SURVEY.md §5.2) at sf0.001.
  * The DuckDB hash-match is the primary gate (driver-run); these specs pin
  * structural invariants cheaply and run in CI via `sbt test`. */
class TierFSpec extends SparkSpec {
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("every declared query has an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = noOracle -- SparkEntry.oracleOmissions.keySet
    assert(undocumented.isEmpty, s"missing oracles: $undocumented")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("f_scan_project projects and prunes") {
    val df = q("f_scan_project")
    assert(df.columns.toSeq == Seq("order_key", "line_no", "qty", "price", "flag"))
    assert(df.count() == 6000)
    // column pruning must reach the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_shipdate"))
  }

  test("f_filter_clean rewrites only the targeted value") {
    val vals = q("f_filter_clean").select("n_name_clean")
      .collect().map(_.getString(0)).toSet
    assert(vals.contains("NATION_ZERO") && !vals.contains("NATION_0"))
    assert(vals.contains("NATION_1"))
  }

  test("f_surrogate_key ids are dense 0-based") {
    val ids = q("f_surrogate_key").select("priority_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until ids.length).toSeq)
  }

  test("f_union_dedup has no duplicate rows") {
    val df = q("f_union_dedup")
    assert(df.count() == df.dropDuplicates().count())
  }

  test("f_star_build join keys resolve for every fact row") {
    val df = q("f_star_build")
    assert(df.count() == 6000)
    assert(df.filter(col("rf_id").isNull || col("ls_id").isNull).count() == 0)
  }

  test("f_star_join broadcasts the small dims") {
    val plan = q("f_star_join").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("f_star_join preserves fact cardinality (no fan-out)") {
    assert(q("f_star_join").count() == 6000)
  }

  test("f_explode_json extracts nested ints above threshold") {
    val df = q("f_explode_json")
    assert(df.filter(col("k") <= 50).count() == 0)
    assert(df.count() > 0)
  }

  test("f_star_join_sql is plan- and value-identical to the DataFrame form") {
    val sqlForm = q("f_star_join_sql")
    val dfForm = q("f_star_join")
    // same physical shape: the SQL surface must not plan extra exchanges
    // or lose the dim broadcasts
    def shape(p: org.apache.spark.sql.DataFrame): Map[String, Int] = {
      val s = p.queryExecution.executedPlan.toString
      Map(
        "bhj" -> "BroadcastHashJoin".r.findAllIn(s).size,
        "smj" -> "SortMergeJoin".r.findAllIn(s).size,
        "exch" -> "Exchange".r.findAllIn(s).size)
    }
    assert(shape(sqlForm) == shape(dfForm))
    // and value-identical, row for row, in the declared output order
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("f_csv_ingest quarantines exactly the corrupted rows") {
    val df = q("f_csv_ingest").collect()
    val expectedBad = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 100 === 0).count()
    assert(df.map(_.getAs[Long]("n_quarantined")).toSet == Set(expectedBad))
    val goodTotal = df.map(_.getAs[Long]("n_good")).sum
    val totalRows = Tables(spark, sf, "orders").count()
    assert(goodTotal == totalRows - expectedBad)
  }

  test("f_schema_merge unions both generations and nulls the added column") {
    val rows = q("f_schema_merge").collect()
    val orders = Tables(spark, sf, "orders")
    // every row accounted for across the two generations
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.count())
    // pre-evolution count = even order keys (generation v=1, no price col)
    assert(rows.map(_.getAs[Long]("n_pre_evolution")).sum ==
      orders.filter(col("o_orderkey") % 2 === 0).count())
    // merged read must surface the evolved column for v=2 rows: the summed
    // price over the merged layout equals the odd-key sum on the original
    val evolved = rows.map(_.getAs[Double]("sum_price_evolved")).sum
    val expected = orders.filter(col("o_orderkey") % 2 =!= 0)
      .agg(Conventions.moneySum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(math.abs(evolved - expected) < 1e-6)
  }

  test("f_json_ingest: JSONL round-trip is value-exact vs parquet") {
    val viaJson = q("f_json_ingest").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 1000d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Conventions.moneySum(col("o_totalprice")).as("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaJson.keySet == direct.keySet)
    direct.foreach { case (k, (n, s)) =>
      val (nj, sj) = viaJson(k)
      assert(nj == n, s"$k count drifted through JSON")
      // doubles survive Spark's JSON shortest-round-trip representation
      assert(sj == s, s"$k sum drifted through JSON text round-trip")
    }
  }
}
