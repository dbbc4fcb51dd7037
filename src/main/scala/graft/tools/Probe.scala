package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing probe for per-query optimization work — NOT part of
  * the driver contract. Runs named variants of the currently-slow
  * queries under alternate plans/confs and prints per-variant wall
  * seconds (min of `reps`), so plan decisions are made on measurement,
  * not guesses. Variants live here until one wins; the winner moves
  * into the query registry and the probe entry is deleted. */
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

    def scd2Dim() = {
      graft.operators.ChangeCapture.scd2(
        graft.Tables(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        keyCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"),
        attrCols = Seq("event_type"))
    }

    def chainSql(hint: String) = s"""
      WITH RECURSIVE chain(user_id, event_type, eff_from, eff_to, ver) AS (
        SELECT s.user_id, s.event_type, s.eff_from, s.eff_to, 1
        FROM graft_scd2_dim s
        JOIN (SELECT user_id, min(eff_from) AS f0
              FROM graft_scd2_dim GROUP BY user_id) h
          ON s.user_id = h.user_id AND s.eff_from = h.f0
        UNION ALL
        SELECT $hint n.user_id, n.event_type, n.eff_from, n.eff_to, c.ver + 1
        FROM chain c JOIN graft_scd2_dim n
          ON n.user_id = c.user_id AND n.eff_from = c.eff_to
        WHERE c.ver < 25)
      SELECT user_id, CAST(ver AS BIGINT) AS ver, event_type,
             date_format(eff_from, 'yyyy-MM-dd HH:mm:ss') AS eff_from_s,
             date_format(eff_to, 'yyyy-MM-dd HH:mm:ss') AS eff_to_s
      FROM chain ORDER BY user_id, ver"""

    if (which == "all" || which == "scd2") {
      val dim = scd2Dim().localCheckpoint()
      dim.createOrReplaceTempView("graft_scd2_dim")
      println(s"[probe] dim rows=${dim.count()} users=${dim.select("user_id").distinct().count()}")
      println(f"[probe] chain plain        ${time(2)(() => spark.sql(chainSql("")))}%.2f s")
      println(f"[probe] chain bcast-chain  ${time(2)(() => spark.sql(chainSql("/*+ BROADCAST(c) */")))}%.2f s")
      println(f"[probe] chain bcast-dim    ${time(2)(() => spark.sql(chainSql("/*+ BROADCAST(n) */")))}%.2f s")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      println(f"[probe] chain 8-parts      ${time(2)(() => spark.sql(chainSql("")))}%.2f s")
      println(f"[probe] chain 8p+bcast-c   ${time(2)(() => spark.sql(chainSql("/*+ BROADCAST(c) */")))}%.2f s")
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    if (which == "all" || which == "session") {
      val ev = graft.Tables(spark, sfDir, "events")
      println(f"[probe] session_window x3  ${time(3)(() => graft.streaming.StreamOps.sessionized(ev).orderBy("user_id", "s_start"))}%.2f s")
      println(f"[probe] tumbling x3        ${time(3)(() => graft.streaming.StreamOps.tumbling(ev).orderBy("w_start", "event_type"))}%.2f s")
      println(f"[probe] sliding x3         ${time(3)(() => graft.streaming.StreamOps.sliding(ev).orderBy("w_start", "event_type"))}%.2f s")
    }

    if (which == "all" || which == "cluster") {
      val q = graft.SparkEntry.queries("x_dedup_cluster")
      println(f"[probe] x_dedup_cluster x3 ${time(3)(() => q(spark, sfDir))}%.2f s")
    }

    spark.stop()
  }
}
