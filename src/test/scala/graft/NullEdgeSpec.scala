package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Edge-case semantics (SURVEY.md §5.2): empty inputs, null join keys,
  * null handling in conditionals and aggregates — pinned explicitly so
  * SQL-null surprises can't hide inside the oracle-checked happy path. */
class NullEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", StringType, nullable = true)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

  test("null join keys never match (inner, semi, anti)") {
    val a = df(Seq(Row(1L, "a"), Row(null, "an"), Row(2L, "b")))
    val b = df(Seq(Row(1L, "x"), Row(null, "bn")))
    assert(a.join(b, Seq("k")).count() == 1)
    assert(a.join(b, Seq("k"), "left_semi").count() == 1)
    // anti keeps the null-key row: null fails the equality, so it has
    // no match and survives NOT EXISTS
    assert(a.join(b, Seq("k"), "left_anti").count() == 2)
  }

  test("when/otherwise: null comparisons fall through to otherwise") {
    val d = df(Seq(Row(1L, "x"), Row(2L, null)))
      .withColumn("c",
        when(col("v") === "x", "hit").otherwise("miss"))
    val byK = d.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byK(1L) == "hit")
    assert(byK(2L) == "miss") // null === "x" is null -> otherwise
  }

  test("aggregates over empty input") {
    val empty = df(Seq.empty)
    // global agg on empty input: one row, count 0, null sum
    val g = empty.agg(count(lit(1)).as("n"), sum("k").as("s")).collect().head
    assert(g.getLong(0) == 0L && g.isNullAt(1))
    // grouped agg on empty input: zero rows
    assert(empty.groupBy("v").count().count() == 0)
  }

  test("count ignores nulls, count(*) does not; avg skips nulls") {
    val d = df(Seq(Row(1L, "a"), Row(null, "b"), Row(3L, "c")))
    val r = d.agg(
      count(col("k")).as("ck"), count(lit(1)).as("call"),
      avg(col("k")).as("ak")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0) // (1+3)/2, null skipped
  }

  test("dedup operators tolerate empty corpora") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(Dedup.exact(empty).count() == 0)
    assert(Dedup.nearDupJaccard(empty).count() == 0)
    assert(Dedup.nearDupMinHash(empty).count() == 0)
    assert(Dedup.simHash(empty).count() == 0)
    assert(Dedup.simHash64(empty).count() == 0)
    import graft.operators.{Curation, TextAnalysis}
    assert(Curation.hashSplit(empty).count() == 0)
    assert(Curation.quotaCap(empty).count() == 0)
    assert(TextAnalysis.chunkSplit(empty).count() == 0)
    assert(TextAnalysis.tfIdfTopTerms(empty).count() == 0)
    assert(TextAnalysis.fingerprints(empty).count() == 0)
    assert(Dedup.simHash64Combi(empty).count() == 0)
    assert(Curation.stratifiedSample(empty, Map("en" -> 200), 500).count() == 0)
    assert(TextAnalysis.tokenHistogram(empty).count() == 0)
    // the composed pipeline end-to-end on nothing: the cluster loop must
    // still reach its fixpoint and every stage must pass empties through
    assert(Curation.curate(empty).count() == 0)
    val emptyVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    assert(graft.operators.SimilaritySearch.quantizeInt8(emptyVecs).count() == 0)
    // round-4 operators: empty corpora / empty change logs pass through
    assert(Dedup.sharedSpans(empty).count() == 0)
    assert(Curation.domainMix(empty).count() == 0)
    assert(TextAnalysis.unigramLmScore(empty).count() == 0)
    val emptyLog = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("event_id", LongType),
        StructField("op", StringType),
        StructField("event_type", StringType))))
    import graft.operators.ChangeCapture
    assert(ChangeCapture.scd2(emptyLog, Seq("user_id"),
      Seq("ts", "event_id"), Seq("event_type")).count() == 0)
    assert(ChangeCapture.cdcApply(emptyLog, Seq("user_id"),
      Seq("ts", "event_id"), "op", Seq("event_type")).count() == 0)
    // round-4b operators on empty inputs
    assert(TextAnalysis.winnow(empty).count() == 0)
    assert(TextAnalysis.boilerplateStrip(empty).count() == 0)
    assert(TextAnalysis.buildVocab(empty).count() == 4) // specials only
    assert(TextAnalysis.encodeIds(empty).count() == 0)
    assert(TextAnalysis.dataCard(empty).count() == 0)
    assert(TextAnalysis.heavyHittersCms(empty).count() == 0)
    assert(Curation.corpusShuffle(empty).count() == 0)
    assert(Curation.perplexityFilter(empty).count() == 0)
    assert(graft.operators.SimilaritySearch
      .signProject(emptyVecs, inDim = 64).count() == 0)
    assert(ChangeCapture.snapshotDiff(emptyLog, emptyLog, Seq("user_id"),
      Seq("ts", "event_id"), Seq("event_type")).count() == 0)
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("v1", LongType), StructField("v2", LongType),
        StructField("cos", org.apache.spark.sql.types.DoubleType))))
    assert(graft.operators.SimilaritySearch
      .knnGraph(emptyPairs).count() == 0)
    assert(graft.operators.GraphRank.pageRank(
      emptyPairs.select(col("v1").as("src"), col("v2").as("dst")))
      .count() == 0)
  }

  test("distinct treats null as a value (one null group)") {
    val d = df(Seq(Row(null, "a"), Row(null, "b"), Row(1L, "c")))
    assert(d.select("k").dropDuplicates().count() == 2)
  }

  test("round-7 operators survive empty and null-text inputs") {
    import spark.implicits._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = false)))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c", "en", "s", 5L),
        Row(2L, null, "en", "s", 0L))), docSchema)
    // null text: metrics row carries nulls, no crash, clean row intact
    val spans = Dedup.withinDocSpanDedup(withNull).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(spans == Map(1L -> false, 2L -> true))
    // incrementalExact null/survivor semantics, asserted on the actual
    // survivor SET (not just "doesn't crash"). Batch membership is
    // hash-fated (hash32("incr:" + id) % 10 == 0), so pick ids whose
    // fate we can compute with the same driver-side hash:
    val bucket = (id: Long) =>
      graft.functions.Hashing.hash32Local(s"incr:$id") % 10
    val batchIds = (1L to 200L).filter(bucket(_) == 0L)
    val corpusIds = (1L to 200L).filter(bucket(_) != 0L)
    assert(batchIds.size >= 3 && corpusIds.size >= 2)
    val Seq(bNull, bDup, bFresh) = batchIds.take(3)
    val Seq(cNull, cSeen) = corpusIds.take(2)
    val incr = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(bNull, null, "en", "s", 0L),   // batch, null text
        Row(bDup, "seen text", "en", "s", 9L),  // batch, corpus-known
        Row(bFresh, "fresh text", "en", "s", 10L), // batch, unseen
        Row(cNull, null, "en", "s", 0L),   // corpus, null text
        Row(cSeen, "seen text", "en", "s", 9L))), docSchema) // corpus
    val survivors = Dedup.incrementalExact(incr).collect()
    // the null-digest batch row survives even though the CORPUS also
    // holds a null digest: SQL null keys never equi-match, so the LEFT
    // ANTI join cannot drop it (documented exact-dedup semantics);
    // corpus-known content is dropped, unseen content survives
    assert(survivors.map(_.getAs[Long]("doc_id")).toSet ==
      Set(bNull, bFresh))
    assert(survivors.find(_.getAs[Long]("doc_id") == bNull)
      .exists(_.isNullAt(0))) // content_hash column is the null digest
    // empty similarity graph: no vertices, no triangles, no crash
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("d1", LongType), StructField("d2", LongType))))
    assert(graft.operators.GraphRank.triangleCounts(emptyPairs).count() == 0)
  }
}
