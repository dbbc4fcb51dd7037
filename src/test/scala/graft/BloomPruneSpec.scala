package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom semi-join pruning: result-identical to the plain join, with a
  * pre-shuffle large-side row count near the true match count. */
class BloomPruneSpec extends SparkSpec {

  test("pruned join is row-identical to the plain join") {
    val orders = Tables(spark, sf, "orders")
    // a selective small side: 5% of customers
    val vips = Tables(spark, sf, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = orders.join(vips, "o_custkey")
    val pruned = BloomPrune.prunedJoin(orders, vips, "o_custkey",
      expectedItems = 10000L, fpp = 0.01)
    assert(pruned.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(pruned).count() == 0)
  }

  test("pruning shrinks the shuffled side to near the match count") {
    val orders = Tables(spark, sf, "orders")
    val vips = Tables(spark, sf, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("o_custkey"))
    val total = orders.count()
    val matches = orders.join(vips, "o_custkey").count()
    val kept = BloomPrune.pruneLarge(orders, vips, "o_custkey",
      expectedItems = 10000L, fpp = 0.01).count()
    // no false negatives; false positives bounded well under the
    // non-matching volume at fpp=1% (allow 10x slack for a small corpus)
    assert(kept >= matches)
    assert(kept - matches <= math.max(50L, (total - matches) / 10),
      s"kept=$kept matches=$matches total=$total")
  }

  test("probe is the native codegen'd predicate, not a Scala UDF") {
    val orders = Tables(spark, sf, "orders")
    val vips = Tables(spark, sf, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("o_custkey"))
    val pruned = BloomPrune.pruneLarge(orders, vips, "o_custkey", 10000L, 0.01)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected native probe in:\n$plan")
    assert(!plan.contains("UDF"), s"UDF node leaked into:\n$plan")
    // the sketch rides as a scalar subquery (InjectRuntimeFilter's
    // shape), never as a serialized plan literal
    assert(plan.toLowerCase.contains("subquery"),
      s"expected the sketch build as a scalar subquery in:\n$plan")
  }

  test("null keys never survive the prune") {
    import spark.implicits._
    val large = Seq(Some(1L), None, Some(2L), Some(99L))
      .toDF("k")
    val small = Seq(1L, 2L).toDF("k")
    val kept = BloomPrune.pruneLarge(large, small, "k", 100L, 0.01)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(Set(1L, 2L, 99L)) && Set(1L, 2L).subsetOf(kept))
  }
}
