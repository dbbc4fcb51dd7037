package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated testdata parquet tables
  * (TESTDATA.md / FIXTURES.md §2).
  *
  * Each table is a single parquet file under the scale-factor dir; schemas
  * are declared in the parquet footers, so `spark.read.parquet` needs no
  * explicit `StructType` — but every consumer projects the columns it needs
  * so Catalyst prunes the scan (`ReadSchema` in `.explain`).
  *
  * At cluster scale these would be directories of many files (one per
  * partition); nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL confs every session that reads these tables needs.
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    * read as a raw long (nanosAsLong); [[apply]] converts it back to a
    * microsecond TimestampType. */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // floor-truncate nanos -> micros (integer div), matching how DuckDB
      // casts TIMESTAMP_NS to TIMESTAMP in the oracle.
      df.withColumn(
        "ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}

/** Shared conventions that keep Spark results hash-identical to the DuckDB
  * oracle (SURVEY.md §2.2 determinism rules):
  *
  *  - money sums: `sum(expr.cast(decimal(18,2)))` — decimal addition is
  *    exact and therefore order-independent, so partial aggregation /
  *    shuffle order can't change the result (double sums would differ in
  *    the last ulps between engines);
  *  - doubles that are per-row deterministic (ratios, avgs over big
  *    divisors, cosines) are `round(_, 4)`;
  *  - surrogate keys: `row_number() over (order by natural_key) - 1`, cast
  *    to long (DuckDB row_number is BIGINT, Spark's is INT);
  *  - every query ends with an ORDER BY over a unique key;
  *  - temporal outputs are formatted as strings (`yyyy-MM-dd`) so DATE vs
  *    TIMESTAMP physical types can't mismatch.
  */
object Conventions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact money sum: order-independent across partitions. */
  def moneySum(e: Column): Column = sum(e.cast("decimal(18,2)"))

  /** Deterministic 4-decimal rounding for per-row doubles. */
  def r4(e: Column): Column = round(e, 4)

  /** yyyy-MM-dd string for a date/timestamp column. */
  def dstr(e: Column): Column = date_format(e, "yyyy-MM-dd")
}
