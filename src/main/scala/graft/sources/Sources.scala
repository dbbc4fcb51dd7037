package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source surface (SURVEY.md §2.1 S1-S3).
  *
  * The reference's sources are scrape loops (S1/S2: enumerate round
  * pages, collect match ids with a manual in-loop dedup,
  * `fotmob-dag.py:25-37`) and a per-id REST fetch (S3). In a query
  * engine those become: path discovery over an input layout, a
  * `distinct()` on the id column, and schema-declared JSON ingestion —
  * network fetching is orchestration, not query processing.
  */
object Sources {

  /** S3: JSON-lines ingestion with a DECLARED schema — no inference
    * scan, malformed rows fail loudly (FAILFAST) rather than silently
    * nulling. */
  def readJsonLines(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Permissive variant keeping malformed records for quarantine:
    * `_corrupt_record` carries the raw line. */
  def readJsonLinesPermissive(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV ingestion with a DECLARED schema, same contract as the JSON
    * pair: FAILFAST (malformed rows abort, never silently null). */
  def readCsv(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Permissive CSV variant quarantining malformed rows via
    * `_corrupt_record`, mirroring [[readJsonLinesPermissive]]. */
  def readCsvPermissive(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** S1: input enumeration — one row per discovered file with its row
    * count, from the same distributed scan (no driver-side listing
    * loop). */
  def listInputs(df: DataFrame): DataFrame =
    df.groupBy(input_file_name().as("path")).agg(count(lit(1)).as("rows"))

  /** S2: id-stream dedup — the engine-side form of the reference's
    * `if match_id not in match_ids` loop; a hash aggregate, not a
    * driver-side set. */
  def distinctIds(df: DataFrame, idCol: String): DataFrame =
    df.select(idCol).dropDuplicates()
}
