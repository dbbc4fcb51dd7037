package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProductFloat
import graft.functions.Similarity

/** Specs for the custom Catalyst expression layer. */
class ExpressionSpec extends SparkSpec {

  private lazy val vecs = Tables(spark, sf, "embeddings")

  test("hash32Local equals the hash32 column form on varied strings") {
    import spark.implicits._
    import graft.functions.Hashing
    val samples = Seq("", "a", "proj:0:0", "proj:7:63", "shuffle:12345",
      "multi word string", "ünïcodé ✓")
    val viaColumn = samples.toDF("s")
      .select(col("s"), Hashing.hash32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(Hashing.hash32Local(s) == viaColumn(s), s"mismatch on '$s'")
    }
  }

  test("SimHashWords is bit-identical to the aggregate form on the corpus") {
    import graft.operators.Dedup
    val docs = Tables(spark, sf, "documents")
    val fused64 = Dedup.simHashes64(docs)
    val agg64 = Dedup.simHashes64Agg(docs)
    assert(fused64.exceptAll(agg64).count() == 0 &&
      agg64.exceptAll(fused64).count() == 0)
    val fused32 = Dedup.simHashes(docs)
    val agg32 = Dedup.simHashesAgg(docs)
    assert(fused32.exceptAll(agg32).count() == 0 &&
      agg32.exceptAll(fused32).count() == 0)
  }

  test("SimHashWords: split keep-empties semantics, null input, codegen") {
    import spark.implicits._
    import graft.expressions.SimHashWords
    import graft.operators.Dedup
    // consecutive/trailing spaces and the empty string produce empty
    // tokens in split(text, ' ') — the fused form must match exactly
    val tricky = Seq((0L, "a  b "), (1L, ""), (2L, "solo"))
      .toDF("doc_id", "text")
    val fused = Dedup.simHashes64(tricky)
    val agg = Dedup.simHashes64Agg(tricky)
    assert(fused.exceptAll(agg).count() == 0 &&
      agg.exceptAll(fused).count() == 0)
    // null text -> null fingerprint
    val withNull = Seq((0L, Option("x")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = withNull.select(SimHashWords.of(col("text")).as("w")).collect()
    assert(out.count(_.isNullAt(0)) == 1)
    // runs inside whole-stage codegen (parquet scan source — a local
    // relation would fold to LocalTableScan and prove nothing)
    val df = Tables(spark, sf, "documents")
      .select(SimHashWords.of(col("text")).as("w"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"))
  }

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

  test("DotProductFloat foldable-side path is bit-identical to the column path") {
    // the primitive-copy fast path for literal probe vectors must not
    // change a single result bit vs joining the same vector in as data
    val probe = vecs.orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getSeq[Float](0)
    val df = vecs.limit(200).select(
      DotProductFloat(col("embedding"), typedlit(probe)).as("lit_side"),
      Similarity.dotComposable(col("embedding"), typedlit(probe)).as("composed"))
    assert(df.filter(col("lit_side") =!= col("composed")).count() == 0)
  }

  test("SignBitsPacked equals the composed per-probe sign bits, in codegen") {
    val probes = vecs.orderBy("vec_id").limit(64)
      .select("embedding").collect().map(_.getSeq[Float](0)).toSeq
    val composed = probes.zipWithIndex.map { case (p, i) =>
      when(DotProductFloat(col("embedding"), typedlit(p)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val df = vecs.select(
      graft.expressions.SignBitsPacked(col("embedding"), probes).as("fused"),
      composed.as("composed"))
    assert(df.filter(col("fused") =!= col("composed")).count() == 0)
    val fusedOnly = vecs.select(
      graft.expressions.SignBitsPacked(col("embedding"), probes).as("b"))
    fusedOnly.collect()
    val plan = fusedOnly.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"))
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

  test("GramFingerprint is bit-identical to the composable HOF form") {
    val docs = Tables(spark, sf, "documents").filter(length(col("text")) >= 5)
    val composable = docs.select(
      col("doc_id"),
      expr("array_min(transform(sequence(1, length(text) - 4), " +
        s"i -> ${graft.functions.Hashing.hash32Sql("substr(text, i, 5)")}))")
        .as("fp"),
      expr("size(array_distinct(transform(sequence(1, length(text) - 4), " +
        "i -> substr(text, i, 5))))").cast("long").as("n_kgrams"))
    val fused = docs
      .withColumn("g", graft.expressions.GramFingerprint.of(col("text"), 5))
      .select(col("doc_id"), col("g.fp").as("fp"),
        col("g.n_kgrams").as("n_kgrams"))
    assert(fused.exceptAll(composable).count() == 0)
    assert(composable.exceptAll(fused).count() == 0)
  }

  test("GramFingerprint handles multi-byte code points like substr does") {
    import spark.implicits._
    // é, 漢, emoji: substr indexes CODE POINTS, so grams must too
    val df = Seq("héllo wörld", "漢字かな交じり文テスト", "a😀b😀c😀d😀e")
      .toDF("text").filter(length(col("text")) >= 5)
    val composable = df.select(
      col("text"),
      expr("array_min(transform(sequence(1, length(text) - 4), " +
        s"i -> ${graft.functions.Hashing.hash32Sql("substr(text, i, 5)")}))")
        .as("fp"),
      expr("size(array_distinct(transform(sequence(1, length(text) - 4), " +
        "i -> substr(text, i, 5))))").cast("long").as("n_kgrams"))
    val fused = df
      .withColumn("g", graft.expressions.GramFingerprint.of(col("text"), 5))
      .select(col("text"), col("g.fp").as("fp"),
        col("g.n_kgrams").as("n_kgrams"))
    assert(fused.exceptAll(composable).count() == 0)
    assert(composable.exceptAll(fused).count() == 0)
  }

  test("GramFingerprint: null and too-short inputs yield null") {
    import spark.implicits._
    val df = Seq(Some("abcd"), Some(""), None)
      .toDF("text")
      .select(graft.expressions.GramFingerprint.of(col("text"), 5).as("g"))
    assert(df.filter(col("g").isNotNull).count() == 0)
  }

  test("GramFingerprint: non-string input rejected at analysis time") {
    val docs = Tables(spark, sf, "documents")
    val ex = intercept[Exception] {
      docs.select(graft.expressions.GramFingerprint.of(col("doc_id"), 5))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }

  test("GramFingerprint evaluates once per row when both fields project") {
    val docs = Tables(spark, sf, "documents").filter(length(col("text")) >= 5)
    val df = docs
      .withColumn("g", graft.expressions.GramFingerprint.of(col("text"), 5))
      .select(col("doc_id"), col("g.fp"), col("g.n_kgrams"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // projection collapse must not have inlined the expression twice
    assert("gram_?fingerprint".r.findAllIn(plan.toLowerCase).size <= 1,
      s"GramFingerprint duplicated in plan:\n$plan")
  }

  test("NfcNormalize: composes decomposed runs, identity on NFC, null") {
    import spark.implicits._
    import graft.expressions.NfcNormalize
    val rows = Seq(
      (0L, Option("Café")), // e + U+0301 -> é
      (1L, Option("Ångström")), // ring + diaeresis fold in
      (2L, Option("plain ascii")),
      (3L, Option.empty[String]))
      .toDF("id", "s")
      .select(col("id"), NfcNormalize.of(col("s")).as("n"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(0L) == "Café")
    assert(rows(1L) == "Ångström")
    assert(rows(2L) == "plain ascii")
    assert(rows(3L) == null)
  }

  test("NfcNormalize: ASCII corpus is a fixed point, runs in codegen") {
    import graft.expressions.NfcNormalize
    val docs = Tables(spark, sf, "documents")
    val changed = docs
      .filter(NfcNormalize.of(col("text")) =!= col("text")).count()
    assert(changed == 0, "NFC must be identity on the ASCII corpus")
    val df = docs.select(NfcNormalize.of(col("text")).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      "NfcNormalize fell out of whole-stage codegen")
  }

  test("XxHash64SortedSet equals the composed builtin form on the corpus") {
    import graft.expressions.XxHash64SortedSet
    val sh = graft.operators.Dedup.shingles(
      Tables(spark, sf, "documents"), k = 3)
    // the composed reference: per-element xxhash64 (same seed-42
    // builtin), distinct, ascending sort
    val composed = sh.select(col("doc_id"),
      sort_array(array_distinct(
        expr("transform(shingles, s -> xxhash64(s))"))).as("hs"))
    val fused = sh.select(col("doc_id"),
      XxHash64SortedSet.column(col("shingles")).as("hs"))
    assert(fused.exceptAll(composed).count() == 0 &&
      composed.exceptAll(fused).count() == 0)
  }

  test("XxHash64SortedSet dedups hash collisions; empty array; codegen") {
    import spark.implicits._
    import graft.expressions.XxHash64SortedSet
    // duplicate strings inside one array collapse to one hash
    val out = Seq((0L, Seq("a", "b", "a", "c", "b")))
      .toDF("id", "arr")
      .select(XxHash64SortedSet.column(col("arr")).as("hs"))
      .head().getSeq[Long](0)
    assert(out.length == 3 && out == out.sorted)
    val empty = Seq((0L, Seq.empty[String])).toDF("id", "arr")
      .select(XxHash64SortedSet.column(col("arr")).as("hs"))
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
    val df = Tables(spark, sf, "documents")
      .select(XxHash64SortedSet.column(split(col("text"), " ")).as("hs"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      "XxHash64SortedSet fell out of whole-stage codegen")
  }

  test("SortedLongIntersectCount equals size(array_intersect) on sorted sets") {
    import spark.implicits._
    import graft.expressions.{SortedLongIntersectCount, XxHash64SortedSet}
    val sh = graft.operators.Dedup.shingles(
      Tables(spark, sf, "documents"), k = 3)
      .select(col("doc_id"),
        XxHash64SortedSet.column(col("shingles")).as("hs"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") % 7 === col("b.doc_id") % 7 &&
          col("a.doc_id") < col("b.doc_id"))
      .limit(2000)
      .select(
        SortedLongIntersectCount.column(col("a.hs"), col("b.hs")).as("m"),
        size(array_intersect(col("a.hs"), col("b.hs"))).cast("double").as("r"))
    assert(pairs.filter(col("m") =!= col("r")).count() == 0)
    // edge shapes: one empty side, disjoint, identical
    val edges = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0d),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0d),
      (Seq(-9L, 0L, 4L), Seq(-9L, 0L, 4L), 3d),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue), 2d))
      .toDF("a", "b", "want")
      .select(SortedLongIntersectCount.column(col("a"), col("b")).as("got"),
        col("want"))
    assert(edges.filter(col("got") =!= col("want")).count() == 0)
  }

  test("skinny hash verify matches string-array Jaccard end-to-end") {
    import graft.operators.Dedup
    val docs = Tables(spark, sf, "documents")
    val got = Dedup.nearDupJaccard(docs, k = 3, threshold = 0.8)
    // reference: the pre-round-11 string-array verify over the SAME
    // candidate set (candidate generation is untouched)
    val cand = Dedup.jaccardCandidates(docs, k = 3, threshold = 0.8)
    val sh = Dedup.shingles(docs, k = 3)
    val ref = cand
      .join(sh.select(col("doc_id").as("d1"), col("shingles").as("sh1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shingles").as("sh2")), "d2")
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jac") >= 0.8)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jac"))
    assert(got.exceptAll(ref).count() == 0 &&
      ref.exceptAll(got).count() == 0)
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
