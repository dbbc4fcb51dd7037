package graft.tools

import org.apache.spark.sql.DataFrame

/** Scratch timing probe for per-query optimization work — NOT part of
  * the driver contract. Add named variants of a currently-slow query
  * under alternate plans/confs and print per-variant wall seconds
  * (min of `reps`), so plan decisions are made on measurement, not
  * guesses. Variants live here until one wins; the winner moves into
  * the query registry and the probe entry is deleted — decided
  * experiments (scd2 frontier broadcast, session-window forms,
  * simhash distinct placement, bootstrap lanes) are recorded in
  * SCALING.md/BASELINE.md, not kept as dead code here. */
object Probe {

  private def time(reps: Int)(f: () => DataFrame): Double = {
    (0 until reps).map { _ =>
      val t = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.headOption.getOrElse("all")
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // current open experiments: (none)
    val _ = (sfDir, which, time(1) _)

    spark.stop()
  }
}
