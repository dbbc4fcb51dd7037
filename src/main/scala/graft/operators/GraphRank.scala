package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge frame — the link-analysis pass a dedup/QA
  * pipeline runs over its similarity graph to find hub documents
  * (documents similar to many others are prime near-dup/template
  * suspects; Page et al. 1999).
  *
  * ALL arithmetic is integer fixed-point so every engine replays the
  * ranks bit-for-bit:
  *
  *   r₀       = 10⁹ div N
  *   rₜ₊₁(v)  = (0.15·10⁹ div N)  +  (85 · Σ_{u→v} (rₜ(u) div deg(u))) div 100
  *
  * — integer floor-division everywhere (no doubles until the final
  * display column), so partial aggregation order cannot perturb
  * anything. The deliberate floor drift vs real-valued PageRank is
  * ≤ deg·1e-9 per node per round — irrelevant for ranking, decisive
  * for cross-engine determinism.
  *
  * Scale shape: each iteration is one equi-join (edges ⋈ ranks on src
  * — both sides shuffle-partitioned on src, and the partitioning is
  * reused across rounds) plus one groupBy(dst) partial+final sum; the
  * iteration count is a fixed constant (a convergence-probed variant
  * would use the [[Dedup]] fused-probe pattern). No driver state, no
  * lineage blowup at 3 rounds (beyond ~10 rounds, localCheckpoint per
  * round as the CC operators do).
  *
  * Callers pass DIRECTED edges; nodes with no out-edges must not exist
  * (symmetrized similarity graphs satisfy this by construction — every
  * node in the graph has at least its reciprocal edge).
  *
  * Output: (id, r_e9, rank). */
object GraphRank {

  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"invalid iterations=$iterations")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .persist()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr("1000000000L div n_nodes").as("r_e9"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("r_e9 div deg").as("c"))
        .groupBy("id").agg(sum("c").as("in_e9"))
      ranks = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (expr("150000000L div n_nodes")
            + expr("(85 * coalesce(in_e9, 0L)) div 100")).as("r_e9"))
    }
    ranks.select(col("id"), col("r_e9"),
      (col("r_e9").cast("double") / 1e9).as("rank"))
  }
}
