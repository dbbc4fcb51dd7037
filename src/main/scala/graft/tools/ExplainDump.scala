package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Writes the `formatted` physical plan of each named registry query
  * to `<outDir>/<query>_<tag>.txt` — the before/after plan evidence
  * the optimization rounds commit under `plans/rNN/`.
  *
  *   sbt "runMain graft.tools.ExplainDump plans/r15 after q1,q2,..."
  *
  * Plans are captured at sf0.001 (plan SHAPE is scale-free; the bench
  * numbers carry the timing evidence).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir =
      if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.localBuilder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(
        Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
