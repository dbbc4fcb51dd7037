package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fidelity.FotmobPipeline
import graft.sources.Sources

/** Source-surface specs: declared-schema JSON ingestion, malformed-row
  * handling, input enumeration, id dedup, format round-trips, and the
  * SQL registration of custom expressions. */
class SourceSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = "src/test/resources/fotmob_matches.jsonl"

  test("FAILFAST json ingestion rejects malformed rows loudly") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.writeString(Paths.get(s"$dir/bad.jsonl"),
      """{"matchId":"ok","general":null,"content":null}
        |this is not json
        |""".stripMargin)
    intercept[Exception] {
      Sources.readJsonLines(spark, s"$dir/bad.jsonl",
        FotmobPipeline.matchDocSchema).collect()
    }
    // Spark refuses to query only the corrupt-record column of a raw
    // file scan — cache first (documented JSON datasource restriction)
    val permissive = Sources.readJsonLinesPermissive(
      spark, s"$dir/bad.jsonl", FotmobPipeline.matchDocSchema).cache()
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter(col("matchId") === "ok").count() == 1)
  }

  test("declared-schema csv ingestion: FAILFAST aborts, permissive quarantines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(Paths.get(s"$dir/rows.csv"),
      """id,name,score
        |1,alpha,0.5
        |not_a_number,beta,0.7
        |3,gamma,0.9
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    intercept[Exception] {
      Sources.readCsv(spark, s"$dir/rows.csv", schema).collect()
    }
    val permissive = Sources.readCsvPermissive(spark, s"$dir/rows.csv", schema)
      .cache()
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter(col("_corrupt_record").isNull).count() == 2)
    assert(permissive.filter(col("id") === 3L)
      .select("name").head().getString(0) == "gamma")
  }

  test("input enumeration runs in the scan, not on the driver") {
    val inputs = Sources.listInputs(
      FotmobPipeline.readMatches(spark, fixture))
    val rows = inputs.collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 3)
  }

  test("distinctIds reproduces the reference's manual in-loop dedup") {
    val ids = Seq("m1", "m2", "m1", "m3", "m2").toDF("match_id")
    assert(Sources.distinctIds(ids, "match_id").count() == 3)
  }

  test("csv, json, and orc round-trips preserve data") {
    val dir = Files.createTempDirectory("graft_rt").toString
    val src = Tables(spark, sf, "nation")
    src.write.option("header", "true").csv(s"$dir/csv")
    src.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$dir/csv")
    val json = spark.read.schema(src.schema).json(s"$dir/json")
    src.write.orc(s"$dir/orc")
    val orc = spark.read.schema(src.schema).orc(s"$dir/orc")
    assert(csv.except(src).count() == 0 && src.except(csv).count() == 0)
    assert(json.except(src).count() == 0 && src.except(json).count() == 0)
    assert(orc.except(src).count() == 0 && src.except(orc).count() == 0)
  }

  test("graft_hash32 from SQL matches the DuckDB-portable definition") {
    GraftFunctions.registerAll(spark)
    val h = spark.sql("SELECT graft_hash32('hello') AS h").collect().head.getLong(0)
    assert(h == 1564557354L) // == CAST('0x'||substr(md5('hello'),1,8) AS BIGINT)
  }

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("graft_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, round(dot_f32(embedding, embedding), 4) AS n2
        |FROM graft_emb ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    val viaApi = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        round(graft.expressions.DotProductFloat(
          col("embedding"), col("embedding")), 4).as("n2"))
      .orderBy("vec_id").limit(5).collect()
    assert(viaSql.map(_.toString).toSeq == viaApi.map(_.toString).toSeq)
  }

  test("gram_fingerprint from SQL agrees with the Column API") {
    GraftFunctions.registerAll(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("graft_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, gram_fingerprint(text, 5).fp AS fp
        |FROM graft_docs WHERE length(text) >= 5
        |ORDER BY doc_id LIMIT 10""".stripMargin).collect()
    val viaApi = Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        graft.expressions.GramFingerprint.of(col("text"), 5)
          .getField("fp").as("fp"))
      .orderBy("doc_id").limit(10).collect()
    assert(viaSql.map(_.toString).toSeq == viaApi.map(_.toString).toSeq)
    // non-literal k is rejected with a clear message
    val ex = intercept[Exception] {
      spark.sql("SELECT gram_fingerprint(text, CAST(doc_id AS INT)) FROM graft_docs")
        .collect()
    }
    assert(ex.getMessage.contains("integer literal"))
  }
}
