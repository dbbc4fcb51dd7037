package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity matching: join two tables on NAME SIMILARITY rather
  * than key equality — the entity-resolution step a pipeline runs when
  * joining third-party data with no shared identifier.
  *
  * Similarity is character-k-gram Jaccard (set semantics). Candidates
  * come from a gram-blocking equi-join — left and right explode their
  * distinct grams and meet on the gram value — so the pairing is
  * Σ_grams |left bucket|·|right bucket|, never |L|×|R|. At corpus
  * scale the standard refinement is blocking on each name's RAREST
  * grams only (the [[Dedup.nearDupJaccard]] prefix-filter trick, which
  * needs one extra document-frequency aggregate); the blocking
  * structure — and this operator's plan shape — is unchanged.
  *
  * Jaccard is computed as inter / (|A| + |B| − inter) from exact
  * integer set sizes (one IEEE division, then round 4) — deterministic
  * in any engine. Best match per left row ties on (similarity desc,
  * right id asc).
  *
  * Output: (leftId, leftName, rightId, rightName, jacc) — the best
  * right-side match per left row at or above `threshold`; left rows
  * with no candidate above threshold are absent (an anti-join recovers
  * them when the caller needs the unmatched set). */
object FuzzyMatch {

  private def gramsExpr(name: String, k: Int): String =
    s"array_distinct(transform(sequence(1, greatest(length($name) - ${k - 1}, 1)), " +
      s"i -> substring($name, CAST(i AS INT), $k)))"

  def bestMatch(
      left: DataFrame,
      right: DataFrame,
      leftId: String, leftName: String,
      rightId: String, rightName: String,
      k: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    require(k >= 1 && threshold > 0 && threshold <= 1,
      s"invalid fuzzy match: k=$k threshold=$threshold")
    // the candidate/score joins carry both sides' columns side by side
    require(leftId != rightId && leftName != rightName,
      s"fuzzy match requires distinct column names across sides " +
        s"(got id $leftId/$rightId, name $leftName/$rightName) — " +
        "alias one side first")
    val l = left.select(col(leftId), col(leftName),
      expr(gramsExpr(leftName, k)).as("_lg"))
    val r = right.select(col(rightId), col(rightName),
      expr(gramsExpr(rightName, k)).as("_rg"))
    val cand = l.select(col(leftId), explode(col("_lg")).as("gram"))
      .join(r.select(col(rightId), explode(col("_rg")).as("gram")), "gram")
      .select(leftId, rightId).distinct()
    val w = Window.partitionBy(leftId)
      .orderBy(col("jacc").desc, col(rightId))
    cand
      .join(l, leftId).join(r, rightId)
      .withColumn("inter",
        size(array_intersect(col("_lg"), col("_rg"))).cast("double"))
      .withColumn("jacc", round(
        col("inter") / (size(col("_lg")) + size(col("_rg"))
          - col("inter")), 4))
      .filter(col("jacc") >= threshold)
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col(leftId), col(leftName), col(rightId), col(rightName),
        col("jacc"))
  }

  /** Symmetric self-match: every UNORDERED record pair (id₁ < id₂)
    * whose name Jaccard is at or above `threshold` — the pair
    * generator for entity-resolution clustering
    * ([[Dedup.clusters]] over the result assigns canonical entity
    * ids). Same gram-blocking candidate structure as [[bestMatch]]:
    * explode distinct k-grams, equi-join on the gram value with an
    * id-order predicate, so the pairing is Σ_grams C(|bucket|, 2),
    * never C(|records|, 2).
    *
    * Output: (d1, d2, jacc) with d1 < d2 — the column contract
    * [[Dedup.clusters]] expects. */
  def matchPairs(
      records: DataFrame,
      id: String, name: String,
      k: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    require(k >= 1 && threshold > 0 && threshold <= 1,
      s"invalid fuzzy match: k=$k threshold=$threshold")
    val g = records.select(col(id), expr(gramsExpr(name, k)).as("_g"))
    val ex = g.select(col(id), explode(col("_g")).as("gram"))
    val cand = ex.as("a")
      .join(ex.as("b"),
        col("a.gram") === col("b.gram") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("d1"), col(s"b.$id").as("d2"))
      .distinct()
    // the gram-array verify sides are PINNED shuffled-hash joins, for
    // both of the verifyJaccard reasons: (a) determinism — leaving the
    // choice to AQE measured a run-to-run 4-vs-6-exchange flip in
    // x_entity_resolve (the record frame sits right at the broadcast
    // threshold), exactly the plan nondeterminism the bench merge
    // protocol excludes; (b) scale — the record side of an entity-
    // resolution pass is corpus-sized in production, so a broadcast
    // plan would be the wrong shape to rehearse anyway.
    cand
      .join(g.select(col(id).as("d1"), col("_g").as("_ga"))
        .hint("shuffle_hash"), "d1")
      .join(g.select(col(id).as("d2"), col("_g").as("_gb"))
        .hint("shuffle_hash"), "d2")
      .withColumn("inter",
        size(array_intersect(col("_ga"), col("_gb"))).cast("double"))
      .withColumn("jacc", round(
        col("inter") / (size(col("_ga")) + size(col("_gb"))
          - col("inter")), 4))
      .filter(col("jacc") >= threshold)
      .select("d1", "d2", "jacc")
  }
}
