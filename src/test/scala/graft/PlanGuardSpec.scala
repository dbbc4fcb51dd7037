package graft

import org.apache.spark.sql.execution.ExplainMode

/** Global plan-shape guard over the ENTIRE declared query inventory:
  * no query may plan a `CartesianProduct`, and `BroadcastNestedLoopJoin`
  * may appear only at the documented deliberate tiny-side broadcasts.
  * This is the executable form of the scaling contract (SCALING.md) —
  * a regression that re-introduces an O(n·m) pairing fails CI before it
  * reaches the bench.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a BNLJ, all with a
    * provably tiny broadcast side (see Bench.planMetrics notes):
    * ANN query sets, lang-ID profile grid, IVF centroid grid, TF-IDF
    * scalar corpus count. */
  private val bnljAllowed = Set(
    "x_sim_topk", "x_sim_ann_lsh", "x_sim_ivf", "x_dedup_embed",
    "x_lang_id", "x_tfidf_topterms")

  test("no declared query plans a CartesianProduct; BNLJ only where documented") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !bnljAllowed.contains(name)
        (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
          (if (bnlj) Seq(s"$name: undocumented BroadcastNestedLoopJoin") else Nil)
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
