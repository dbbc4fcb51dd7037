package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProductFloat
import graft.functions.Similarity

/** Specs for the custom Catalyst expression layer. */
class ExpressionSpec extends SparkSpec {

  private lazy val vecs = Tables(spark, sf, "embeddings")

  test("DotProductFloat is bit-identical to the composable form") {
    val df = vecs.limit(200).select(
      DotProductFloat(col("embedding"), col("embedding")).as("fused"),
      Similarity.dotComposable(col("embedding"), col("embedding")).as("composed"))
    // exact double equality — same ops in the same order
    assert(df.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("DotProductFloat runs inside whole-stage codegen") {
    val df = vecs.select(
      DotProductFloat(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"))
    // and no fallback marker for our expression
    assert(!plan.toLowerCase.contains("codegenfallback"))
  }

  test("DotProductFloat null semantics: null array -> null result") {
    val df = vecs.select(
      DotProductFloat(lit(null).cast("array<float>"), col("embedding")).as("d"))
    assert(df.filter(col("d").isNotNull).count() == 0)
  }

  test("array<double> input is rejected at analysis time, not at runtime") {
    // without ExpectsInputTypes this would ClassCastException (or read
    // garbage 4-byte slices) deep inside execution
    val bad = vecs.select(col("embedding").cast("array<double>").as("d"))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(DotProductFloat(col("d"), col("d"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
  }

  test("interpreted eval path agrees with codegen path") {
    // force interpreted evaluation via an eval on literal rows
    val row = vecs.select("embedding").head()
    val arr = row.getSeq[Float](0)
    val manual = arr.map(x => x.toDouble * x.toDouble).sum
    val fromExpr = vecs.filter(col("vec_id") === 0)
      .select(DotProductFloat(col("embedding"), col("embedding"))).head().getDouble(0)
    val fromVec = vecs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val expected = fromVec.map(x => x.toDouble * x.toDouble).sum
    assert(math.abs(fromExpr - expected) < 1e-12)
  }
}
