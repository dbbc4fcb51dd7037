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
  * Scale shape: each iteration is one equi-join (degree-tagged edges ⋈
  * ranks on src) plus one groupBy(dst) partial+final sum plus the node
  * left-join. The loop-invariant node universe and per-edge out-degree
  * appear identically in every round, and the whole-chain job dedupes
  * their shuffles via ReusedExchange — so they are NOT re-paid per
  * round despite being lazy (verified in the executed plan; see the
  * measurement note inline).
  *
  * With `probeFixpoint` the iteration count is adaptive UP TO
  * `iterations`: each round's ranks are materialized with the previous
  * round's riding along ([[Dedup.clusters]]' fused-probe shape — the
  * convergence check is a join-free filter-count on the checkpointed
  * frame), and the loop stops at the first EXACT integer fixpoint.
  * Early stop is hash-identical to running all `iterations` rounds by
  * construction: the update is a deterministic function of the ranks,
  * so a round that changes nothing proves every later round changes
  * nothing. The probe is OFF by default on a MEASUREMENT: at 3 rounds
  * over the sf0.1 similarity graph the per-round barrier + count cost
  * 1.85 s steady vs 0.7-1.0 s for the lazy whole-chain plan (the
  * probe's materialization dominates rounds this cheap), and no early
  * fixpoint exists to harvest. Flip it on when `iterations` is large
  * enough that (a) the plan would need per-round truncation anyway
  * (~10+, see below) and (b) a fixpoint plausibly lands early — then
  * each skipped round saves a full join+agg, and the probe is the same
  * barrier the truncation already pays.
  *
  * Callers pass DIRECTED edges; nodes with no out-edges must not exist
  * (symmetrized similarity graphs satisfy this by construction — every
  * node in the graph has at least its reciprocal edge).
  *
  * Output: (id, r_e9, rank). */
object GraphRank {

  def pageRank(edges: DataFrame, iterations: Int = 3,
      probeFixpoint: Boolean = false): DataFrame = {
    require(iterations >= 1, s"invalid iterations=$iterations")
    // LINEAGE truncation, not just caching: the edge frame's logical
    // plan enters every round's join 2-3 times, so by round 3 the
    // composed plan holds ~9 copies of whatever produced the edges —
    // with an LSH-pairing upstream, ANALYSIS/OPTIMIZATION of those
    // copies dominated the query (measured ~4 s of pure planning per
    // run with the edges cached but un-truncated; ~0.5 s with the
    // checkpoint leaf). Same defense the connected-components loops
    // use. Values are unchanged — only the plan boundary moves.
    val e = Lineage.truncate(edges)
    // nodes and per-edge degree stay LAZY off the checkpointed edge
    // leaf: their subplans are identical in every round, so the
    // whole-chain job dedupes them via ReusedExchange — materializing
    // them with their own checkpoints was MEASURED SLOWER (1.61 s vs
    // 0.98 s steady at sf0.1: two extra barrier jobs of fixed overhead
    // against shuffles the reuse already made free)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
    // the two per-round constants depend only on the node COUNT — one
    // bounded driver scalar (the IVF-centroid-count pattern), not a
    // 1-row broadcast crossed onto every round's frame (which cost a
    // broadcast-materialization job + a BNLJ per use — 7 extra jobs
    // for 3 rounds)
    val nNodes = nodes.count()
    // empty graph: no nodes, no ranks (the per-row division form got
    // this for free; the scalar form must short-circuit)
    if (nNodes == 0)
      return nodes.select(col("id"), lit(0L).as("r_e9"),
        lit(0d).as("rank"))
    val r0 = 1000000000L / nNodes       // floor — same as SQL div
    val base = 150000000L / nNodes
    // loop-invariant per-edge out-degree — lazy for the same
    // ReusedExchange reason as nodes
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), col("deg"))
    var ranks = nodes.select(col("id"), lit(r0).as("r_e9"))
    def round(r: DataFrame): DataFrame = {
      val contrib = eDeg
        .join(r.select(col("id").as("src"), col("r_e9")), "src")
        .select(col("dst").as("id"), expr("r_e9 div deg").as("c"))
        .groupBy("id").agg(sum("c").as("in_e9"))
      nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(in_e9, 0L)) div 100"))
            .as("r_e9"))
    }
    if (!probeFixpoint) {
      // rounds chain lazily off the three checkpoint leaves — one
      // whole-chain job at the action, no per-round barriers; past ~10
      // rounds Lineage.truncate each round's ranks as the CC loops do
      for (_ <- 1 to iterations) ranks = round(ranks)
    } else {
      var iter = 0
      var converged = false
      while (iter < iterations && !converged) {
        // prev rides into the checkpoint and the fixpoint probe is an
        // OBSERVED aggregate of the checkpoint job itself (the
        // Dedup.clusters shape, [[Lineage.truncateObserved]]): 1 job
        // per round, not a barrier + a separate tiny count
        val (probed, m) = Lineage.truncateObserved(
          round(ranks)
            .join(ranks.withColumnRenamed("r_e9", "prev"), "id")
            .select(col("id"), col("r_e9"), col("prev")),
          sum(when(col("r_e9") =!= col("prev"), 1L).otherwise(0L))
            .as("changed"))
        converged = m("changed") == null || m("changed") == 0L
        ranks = probed.select("id", "r_e9")
        iter += 1
      }
    }
    ranks.select(col("id"), col("r_e9"),
      (col("r_e9").cast("double") / 1e9).as("rank"))
  }

  /** Degree-oriented triangle counting + local clustering coefficient
    * over an undirected pair frame — the graph-quality probe a dedup
    * pipeline runs on its similarity graph (high clustering = dense
    * template families; triangles are the unit of edge transitivity
    * that [[Dedup.clusters]] exploits).
    *
    * `pairs` must be canonical undirected edges (d1 < d2, no
    * duplicates). Every edge is ORIENTED toward the higher key
    * k(v) = deg(v)·10⁹ + v, and wedges enumerate only at each edge's
    * lower-key endpoint with both spokes outgoing — so every triangle
    * is generated exactly once and per-vertex wedge fan-out is bounded
    * by orientation out-degree, O(√|E|) (the arboricity bound; Suri &
    * Vassilvitskii, "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11). A hub of degree d costs its NEIGHBORS' small
    * out-degrees, not d² — the standard scale defense. The orientation
    * key is a (deg, id) STRUCT (lexicographic order), so it is a total
    * order for ANY id range — no composite-integer overflow hazard.
    *
    * Scale shape: two degree joins onto the edge list, one
    * wedge self-join on the low endpoint, one closing equi-join on
    * (x, y) — all shuffled equi-joins, no vertex ever enumerates a
    * quadratic neighborhood. The edge frame enters the plan four
    * times, so its lineage is truncated once ([[pageRank]]'s defense).
    *
    * Output: (doc_id, deg, n_tri, clustering) for every vertex of the
    * graph, clustering = 2·tri / (deg·(deg−1)). */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val edges = Lineage.truncate(
      pairs.select(col("d1").as("a"), col("d2").as("b")))
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withK = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"),
        struct(col("da").as("deg"), col("a").as("id")).as("ka"),
        struct(col("db").as("deg"), col("b").as("id")).as("kb"))
    val oriented = withK.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
      greatest(col("ka"), col("kb")).as("kv"))
    val w1 = oriented.select(col("u"), col("v").as("x"), col("kv").as("kx"))
    val w2 = oriented.select(col("u"), col("v").as("y"), col("kv").as("ky"))
    val wedges = w1.join(w2, "u").filter(col("kx") < col("ky"))
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
    val tris = wedges.join(closing, Seq("x", "y"))
    val perVertex = tris
      .select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(when(col("deg") >= 2,
          lit(2d) * coalesce(col("n_tri"), lit(0L))
            / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0d)), 4).as("clustering"))
  }
}
