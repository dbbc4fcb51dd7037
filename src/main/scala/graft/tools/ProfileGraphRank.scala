package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the x_graph_rank cost breakdown
  * (round-8 VERDICT item: make the iteration adaptive). Times each
  * stage of the query separately so the fix targets the real cost. */
object ProfileGraphRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t) / 1e9}%.2f s")
      r
    }
    import graft.operators.{GraphRank, SimilaritySearch}
    val vecs = graft.Tables(spark, sfDir, "embeddings")
    // warm the table read
    vecs.count()
    (1 to 2).foreach { round =>
      println(s"-- pass $round --")
      spark.catalog.clearCache()
      val pairs = time("pairs(lsh)") {
        val p = SimilaritySearch
          .cosinePairsLsh(vecs, threshold = 0.4, nBits = 16, rowsPerBand = 2)
          .persist()
        p.count()
        p
      }
      val edges = SimilaritySearch.knnGraph(pairs, k = 3).select("src", "dst")
      time("edges(knn)")(consume(edges))
      time("pagerank(3)")(consume(
        GraphRank.pageRank(edges, iterations = 3).orderBy("id")))
      time("full query")(consume(
        graft.SparkEntry.queries("x_graph_rank")(spark, sfDir)))
      pairs.unpersist()
    }
    spark.stop()
  }
}
