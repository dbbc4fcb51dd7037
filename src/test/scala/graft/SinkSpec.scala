package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Sinks

/** Sink-surface + scale-utility specs: write-mode semantics (K1/K2),
  * partition pruning, bucketed shuffle-free joins, salted skew joins. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("K1 write-once: second write fails loudly") {
    val dir = tmp() + "/t"
    val df = Seq((1L, "a")).toDF("k", "v")
    Sinks.writeTable(df, dir)
    intercept[Exception] { Sinks.writeTable(df, dir) }
    // K2 overwrite succeeds where K1 refuses
    Sinks.overwriteTable(df, dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = tmp() + "/p"
    Sinks.writePartitioned(
      Tables(spark, sf, "orders"), dir, Seq("o_orderpriority"))
    val scan = spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderpriority"))
    // pruned scan reads only the matching directory
    val all = spark.read.parquet(dir).count()
    assert(scan.count() < all)
  }

  test("x_part_prune declared query: partition filters reach its scan") {
    val df = SparkEntry.queries("x_part_prune")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1-URGENT"),
      s"no partition pruning in:\n$plan")
  }

  test("z-ordered layout: box predicate reads only covering tiles, loses no rows") {
    import graft.operators.Layout
    // column Morton code agrees with the driver-side twin bit-for-bit
    val probe = Seq((0L, 0L), (7L, 7L), (5L, 2L), (65535L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton16(col("x"), col("y")).as("z"))
      .collect()
    probe.foreach(r =>
      assert(r.getLong(2) == Layout.mortonLocal(r.getLong(0), r.getLong(1))))
    // the declared query executes with partition pruning on zb
    val df = SparkEntry.queries("x_zorder_prune")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zb"),
      s"no tile pruning in:\n$plan")
    // covering set is a strict subset of the 64 tiles, and the pruned
    // read returns exactly the raw-table box aggregate (no lost rows)
    val li = Tables(spark, sf, "lineitem")
    val mm = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val (mnx, mxx, mny, mxy) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val (lox, hix) = (mnx + (mxx - mnx) / 4, mnx + (mxx - mnx) / 2)
    val (loy, hiy) = (mny + (mxy - mny) / 4, mny + (mxy - mny) / 2)
    val tiles = Layout.coveringTiles(
      Layout.binLocal(lox, mnx, mxx, 3), Layout.binLocal(hix, mnx, mxx, 3),
      Layout.binLocal(loy, mny, mxy, 3), Layout.binLocal(hiy, mny, mxy, 3))
    assert(tiles.nonEmpty && tiles.size < 64, s"covering=${tiles.size}")
    val expected = li
      .filter(col("l_partkey").between(lox, hix) &&
        col("l_suppkey").between(loy, hiy))
      .count()
    assert(df.select(sum("n_rows")).head().getLong(0) == expected)
  }

  test("f_orc_ingest: ORC round-trip pushes the price filter into the scan") {
    val df = SparkEntry.queries("f_orc_ingest")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("orc") || plan.contains("Orc"),
      s"no ORC scan in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice)" +
      ", GreaterThan(o_totalprice,1000.0)]"),
      s"price filter not pushed into the ORC scan:\n$plan")
  }

  test("x_join_bucket declared query: only the final sort exchanges") {
    val df = SparkEntry.queries("x_join_bucket")(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // an executed adaptive plan prints final + initial trees; count
    // only the final one
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    // bucketed join + same-key aggregate shuffle nothing; the single
    // Exchange is the ORDER BY range partitioning
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (final sort), got $exchanges in:\n$plan")
  }

  test("equal-bucketed tables join without a shuffle exchange") {
    Sinks.writeBucketed(
      Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "b_orders", 4, Seq("o_orderkey"))
    Sinks.writeBucketed(
      Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "b_lineitem", 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("MERGE into CDC state rewrites only touched partitions, replay-equivalent") {
    import graft.operators.ChangeCapture
    val dir = tmp() + "/cdc"
    val keys = Seq("k"); val versions = Seq("v"); val payload = Seq("x")
    // 64 keys spread over 8 hash partitions
    val init = (1L to 64L).map(k => (k, 1L, "U", s"init$k"))
      .toDF("k", "v", "op", "x")
    ChangeCapture.writeCdcState(init, dir, keys, versions, "op", payload)
    // a batch touching exactly 3 keys (⇒ ≤3 partitions)
    val batch = Seq((7L, 2L, "U", "upd7"), (13L, 2L, "D", "gone13"),
      (65L, 1L, "U", "new65")).toDF("k", "v", "op", "x")
    val touchedP = batch
      .select(pmod(hash(col("k")), lit(8)).as("p")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(touchedP.size <= 3 && touchedP.size < 8,
      "test shape needs untouched partitions to exist")
    // snapshot file listing per partition before the merge
    def files(p: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/_p=$p")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before = (0 until 8).map(p => p -> files(p)).toMap
    ChangeCapture.mergeIntoState(
      spark, dir, batch, keys, versions, "op", payload)
    // untouched partition directories are file-identical after MERGE
    (0 until 8).filterNot(touchedP).foreach { p =>
      assert(files(p) == before(p), s"untouched partition $p was rewritten")
    }
    touchedP.foreach { p =>
      assert(files(p) != before(p), s"touched partition $p was not rewritten")
    }
    // the partition-pruned read carries a PartitionFilters entry
    val pruned = spark.read.parquet(dir)
      .filter(col("_p").isin(touchedP.toSeq: _*))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("_p"),
      s"expected partition-pruned scan:\n$scan")
    // replay equivalence: maintained state == full-log compaction
    val full = graft.operators.Dedup.latestByKey(
      init.unionByName(batch), keys, versions, "op" +: payload)
      .filter(col("op") =!= "D")
    val got = ChangeCapture.readCurrentState(spark, dir, "op")
    assert(got.count() == 64) // 64 init + new 65 - deleted 13
    assert(got.exceptAll(full).count() == 0 && full.exceptAll(got).count() == 0)
    // the merged winner carries the accumulated audit count
    assert(got.filter(col("k") === 7L).head().getAs[Long]("n_versions") == 2L)
  }

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of rows share one key — the classic straggler shape
    val large = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)).toDF("k", "payload")
    val small = Seq((42L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedJoin(large, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name")
      .except(plain.select("k", "payload", "name")).count() == 0)
    assert(plain.select("k", "payload", "name")
      .except(salted.select("k", "payload", "name")).count() == 0)
  }
}
