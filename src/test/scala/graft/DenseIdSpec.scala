package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DenseId

/** The zipWithIndex dense-id scale path must assign EXACTLY the ids the
  * single-partition window form assigns — same total order, same
  * density — so swapping it in past the single-task threshold changes
  * the plan, never the data. */
class DenseIdSpec extends SparkSpec {
  import spark.implicits._

  test("zipWithIndex ids equal row_number ids on the surrogate-key input") {
    val dims = Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("name")).distinct()
    val viaWindow = dims.withColumn("id",
      (row_number().over(Window.orderBy("name")) - 1).cast("long"))
    val viaZip = DenseId.withDenseId(dims, "id", Seq(col("name")))
    assert(viaZip.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaZip).count() == 0)
  }

  test("ids stay dense and order-faithful under repartitioning") {
    val df = (0 until 97).map(i => (s"k${i % 13}", i)).toDF("k", "v")
      .repartition(11)
    val out = DenseId.withDenseId(df, "id", Seq(col("v").desc))
      .collect().sortBy(_.getLong(2))
    assert(out.map(_.getLong(2)).toSeq == (0L until 97L))
    // order-faithful: id ascends exactly as v descends
    assert(out.map(_.getInt(1)).toSeq == (0 until 97).reverse)
  }

  test("existing id column and empty sort order are rejected") {
    val df = Seq(("a", 1)).toDF("k", "id")
    intercept[IllegalArgumentException](
      DenseId.withDenseId(df, "id", Seq(col("k"))))
    intercept[IllegalArgumentException](
      DenseId.withDenseId(df, "id2", Seq.empty))
  }
}
