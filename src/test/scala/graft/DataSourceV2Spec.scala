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

  test("invalid options fail loudly") {
    intercept[Exception] { read(0, 4).count() }
    intercept[Exception] { read(10, -1).count() }
  }
}
