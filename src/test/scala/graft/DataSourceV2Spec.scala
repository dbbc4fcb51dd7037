package graft

import org.apache.spark.sql.functions._

import graft.fidelity.FotmobPipeline

/** Custom DataSourceV2 source specs: schema declaration, partition
  * planning, determinism, and end-to-end composition with the fidelity
  * pipeline. */
class DataSourceV2Spec extends SparkSpec {

  private def read(matches: Int, partitions: Int) =
    spark.read.format("graft.sources.v2.FotmobMatchSource")
      .option("matches", matches.toString)
      .option("partitions", partitions.toString)
      .load()

  test("source declares the match-document schema without data access") {
    assert(read(10, 2).schema == FotmobPipeline.matchDocSchema)
  }

  test("partition planning honors the requested fan-out") {
    val df = read(100, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 100)
    // uneven split still covers every match exactly once
    val df7 = read(100, 7)
    assert(df7.count() == 100)
    assert(df7.select("matchId").distinct().count() == 100)
  }

  test("reads are deterministic") {
    val a = read(50, 4).collect().map(_.toString).sorted
    val b = read(50, 2).collect().map(_.toString).sorted
    assert(a.sameElements(b)) // partitioning must not change content
  }

  test("composes with the fidelity pipeline end-to-end") {
    val matches = read(38 * 10, 8) // a full season's worth
    val shots = FotmobPipeline.shots(matches)
    assert(shots.count() > 380) // 2-4 shots per match
    val fact = FotmobPipeline.factTable(shots)
    assert(fact.count() >= shots.count()) // fan-out quirk may add rows
    // the Tottenham quirk manifests from generated data too
    val td = FotmobPipeline.teamDim(shots)
    assert(td.filter(col("team_name") === "Tottenham Hotspur").count() == 1)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("column pruning reaches the scan's readSchema") {
    val pruned = scanOf(read(20, 4).select("matchId"))
    assert(pruned.scan.readSchema().fieldNames.toSeq == Seq("matchId"),
      s"expected matchId-only read schema, got ${pruned.scan.readSchema()}")
    // a projection that never touches the shot array must not serialize it
    val noShots = scanOf(read(20, 4)
      .select(col("matchId"), col("general.homeTeam.name")))
    assert(!noShots.scan.readSchema().fieldNames.contains("content"),
      s"content leaked into ${noShots.scan.readSchema()}")
  }

  test("matchId predicates prune partition planning") {
    val eq = read(100, 8).filter(col("matchId") === "m7")
    assert(scanOf(eq).inputRDD.getNumPartitions <= 1)
    assert(eq.count() == 1)
    val in = read(100, 8).filter(col("matchId").isin("m1", "m55", "m99"))
    assert(scanOf(in).inputRDD.getNumPartitions <= 3)
    assert(in.count() == 3)
    // an unparseable / out-of-range id plans nothing and returns nothing
    assert(read(100, 8).filter(col("matchId") === "m12345").count() == 0)
    assert(read(100, 8).filter(col("matchId") === "zzz").count() == 0)
  }

  test("pushdown never changes results") {
    val full = read(50, 4).collect().filter(_.getString(0) == "m7")
    val pushed = read(50, 4).filter(col("matchId") === "m7").collect()
    assert(pushed.map(_.toString).sorted.sameElements(
      full.map(_.toString).sorted))
  }

  test("invalid options fail loudly") {
    intercept[Exception] { read(0, 4).count() }
    intercept[Exception] { read(10, -1).count() }
  }
}
