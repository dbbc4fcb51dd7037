package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the dedup / connected-components / contamination
  * family: the cheapest evidence that the 100× story is real before the
  * operators meet a cluster.
  *
  * What it does (SCALING.md records the standing result):
  *   - synthesizes a 10× corpus from the sf0.1 `documents` and
  *     `embeddings` tables — replicas 0..4 keep the text/vector verbatim
  *     (so every source row becomes a 5-member duplicate cluster: the
  *     worst case for pair generation and CC), replicas 5..9 get
  *     perturbed content (distinct mass, keeps selectivity realistic);
  *   - sets `spark.sql.shuffle.partitions` to a cluster-like count
  *     (default 200 — the Spark default a 1000-executor job would start
  *     from) instead of the local 32;
  *   - runs exact dedup, MinHash-LSH, PPJoin near-dup, Hash-Min CC,
  *     large/small-star CC, cross-corpus contamination, and the
  *     embedding LSH→CC composition over the synthetic volume;
  *   - captures EVERY execution fired along the way (iterative CC rounds
  *     included) through a listener and fails loudly if any plan
  *     contains a `CartesianProduct` or an undocumented
  *     `BroadcastNestedLoopJoin`;
  *   - prints one JSON line with per-op wall seconds + final-plan node
  *     counts, and writes it to `SCALE_REHEARSAL.json`.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.ScaleRehearsal"` (optional SPARK_GRAFT_REHEARSAL_PARTS to
  * change the partition count).
  */
object ScaleRehearsal {

  private object Captured
      extends org.apache.spark.sql.util.QueryExecutionListener {
    val plans = scala.collection.mutable.Buffer[String]()
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      synchronized { plans += qe.executedPlan.toString }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        e: Exception): Unit = ()
    def drain(): Seq[String] = {
      Thread.sleep(300) // async bus; let stragglers land
      synchronized { val out = plans.toSeq; plans.clear(); out }
    }
  }

  /** 10× documents: 5 verbatim replicas (dense duplicate clusters) + 5
    * perturbed ones (distinct mass). doc_id spaces are disjoint by
    * replica stripe. Replication is a GENERATOR (explode of a literal
    * sequence), not a crossJoin — a join-free row multiplier, so the
    * synthetic input adds zero join nodes to any captured plan. */
  private def docs10x(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("*"),
        explode(sequence(lit(0L), lit(9L))).as("replica"))
      .select(
        (col("doc_id") + col("replica") * lit(10000000L)).as("doc_id"),
        when(col("replica") < 5, col("text"))
          .otherwise(concat(col("text"), lit(" uniq"), col("replica")))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))

  /** 100× documents with BOUNDED duplicate clusters: replicas whose
    * stripe residue is < 5 (0-4 and 50-54 — five in each contamination
    * half) stay verbatim, so every source doc forms one 10-member
    * near-dup cluster whose pair count C(10,2) is CONSTANT in corpus
    * scale; the other 90 replicas get every odd word suffixed with a
    * replica tag, which breaks every 3-shingle (any 3 consecutive words
    * contain a tagged one) and makes their shingle sets mutually
    * disjoint. Pair fan-out per document must therefore FALL as the
    * corpus grows — the sub-linear property the 100× run asserts.
    * (The 10× synthesis keeps the all-replicas-near-dup worst case; at
    * 100× that shape would measure the data's quadratic duplicate mass,
    * not the operators.) */
  private def docs100x(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("*"),
        explode(sequence(lit(0L), lit(99L))).as("replica"))
      .select(
        (col("doc_id") + col("replica") * lit(10000000L)).as("doc_id"),
        when(col("replica") % 50 < 5, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+) (\\S+)"),
            concat(lit("$1u"), col("replica"), lit(" $2"))))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))

  /** 100× embeddings, same bounded-cluster principle: stripe residue
    * < 5 keeps the vector verbatim (10-member cosine-1 clusters), the
    * rest become deterministic random directions via iid hash-uniform
    * components (xxhash64 of (vec_id, replica, position) → [-1, 1]).
    * Pairwise cosine of such vectors concentrates at 0 with sd 1/√dim
    * (≈0.125 at dim 64), so essentially no random pair clears an LSH
    * threshold like 0.4 — pair mass stays linear in the corpus.
    * (A sinusoid family sin(phase + c·i) would NOT work here: those
    * vectors span a 2-D subspace and their pairwise cosine is
    * cos(Δphase), putting ~37% of pairs over 0.4 — quadratic blow-up.) */
  private def vecs100x(spark: SparkSession, vecs: DataFrame): DataFrame =
    vecs.select(col("*"),
        explode(sequence(lit(0L), lit(99L))).as("replica"))
      .select(
        (col("vec_id") + col("replica") * lit(10000000L)).as("vec_id"),
        when(col("replica") % 50 < 5, col("embedding"))
          .otherwise(expr(
            "cast(transform(embedding, (x, i) -> " +
              "(pmod(xxhash64(vec_id, replica, i), 2001) - 1000) / 1000.0" +
              ") as array<float>)"))
          .as("embedding"),
        col("label"))

  /** 10× embeddings: verbatim + slightly scaled copies (pure scaling
    * preserves direction, so cosine stays 1 and LSH still pairs the
    * replicas — CC load stays maximal). Cast back to array<float>: the
    * similarity expressions type-check on FloatType. */
  private def vecs10x(spark: SparkSession, vecs: DataFrame): DataFrame =
    vecs.select(col("*"),
        explode(sequence(lit(0L), lit(9L))).as("replica"))
      .select(
        (col("vec_id") + col("replica") * lit(10000000L)).as("vec_id"),
        when(col("replica") < 5, col("embedding"))
          .otherwise(transform(col("embedding"),
            x => x * (lit(1.0) + col("replica").cast("double") / lit(1000d)))
            .cast("array<float>"))
          .as("embedding"),
        col("label"))

  /** Time each op, drain every captured plan it fired, count guard
    * violations. `keepResident` re-pins shared inputs after the per-op
    * cache clear. */
  private def runOps(
      spark: SparkSession,
      ops: Seq[(String, () => DataFrame)],
      keepResident: () => Unit): Seq[(String, Double, Long, Int, Int)] = {
    Captured.drain()
    ops.map { case (name, f) =>
      val t0 = System.nanoTime()
      val df = f()
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val all = Captured.drain()
      val cartesian = all.count(_.contains("CartesianProduct"))
      val bnlj = all.count(_.contains("BroadcastNestedLoopJoin"))
      val rows = df.count()
      System.err.println(
        f"[rehearsal] $name: ${secs}%.1f s, $rows rows") // progress marker
      spark.catalog.clearCache()
      keepResident()
      Captured.drain()
      (name, secs, rows, cartesian, bnlj)
    }
  }

  /** Merge this run's block into SCALE_REHEARSAL.json under its mode
    * key (`{"10x": {...}, "100x": {...}}`), migrating the legacy flat
    * single-object layout if present. */
  private def writeBlock(mode: String, line: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val path = java.nio.file.Paths.get("SCALE_REHEARSAL.json")
    val root: com.fasterxml.jackson.databind.node.ObjectNode =
      if (java.nio.file.Files.exists(path)) {
        val old = mapper.readTree(java.nio.file.Files.readString(path))
        old match {
          case o: com.fasterxml.jackson.databind.node.ObjectNode
              if o.has("rehearsal") => // legacy flat 10x object
            mapper.createObjectNode().set[
              com.fasterxml.jackson.databind.node.ObjectNode]("10x", o)
          case o: com.fasterxml.jackson.databind.node.ObjectNode => o
          case _ => mapper.createObjectNode()
        }
      } else mapper.createObjectNode()
    root.set[com.fasterxml.jackson.databind.JsonNode](
      mode, mapper.readTree(line))
    java.nio.file.Files.write(path,
      (root.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_MODE", "10x")
    val parts = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_PARTS",
      if (mode == "100x") "400" else "200")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.listenerManager.register(Captured)
    if (mode == "100x") { run100x(spark, sfDir, parts); return }

    val docs = docs10x(spark, graft.Tables(spark, sfDir, "documents"))
      .persist() // shared input of every text op — synthesize once
    val vecs = vecs10x(spark, graft.Tables(spark, sfDir, "embeddings")).persist()
    val nDocs = docs.count() // materialize before timing the operators
    val nVecs = vecs.count()
    // contamination halves: replica stripes 0-4 vs 5-9 share no doc_id
    val corpusA = docs.filter(col("doc_id") < 50000000L)
    val corpusB = docs.filter(col("doc_id") >= 50000000L)
      .select((col("doc_id") - 50000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))

    import graft.operators.{Dedup, SimilaritySearch}
    val ops: Seq[(String, () => DataFrame)] = Seq(
      "exact" -> (() => Dedup.exact(docs)),
      "minhash" -> (() => Dedup.nearDupMinHash(docs, k = 3,
        numHashes = 32, bands = 8, threshold = 0.8)),
      "ppjoin" -> (() => Dedup.nearDupJaccard(docs, k = 3, threshold = 0.8)),
      "cluster_hashmin" -> (() => Dedup.clusters(
        Dedup.nearDupMinHash(docs, k = 3, numHashes = 32, bands = 8,
          threshold = 0.8).select("d1", "d2").persist())),
      "cluster_star" -> (() => Dedup.clustersStar(
        Dedup.nearDupMinHash(docs, k = 3, numHashes = 32, bands = 8,
          threshold = 0.8).select("d1", "d2").persist())),
      "contamination" -> (() => Dedup.crossDupMinHash(corpusA, corpusB,
        k = 3, numHashes = 32, bands = 8, threshold = 0.8)),
      // scale-sized LSH: 8-bit band keys (the operator's documented
      // rule — band bits ~ log2(corpus) for O(1) bucket occupancy).
      // The declared sf0.01 query keeps 2-bit bands for its
      // threshold-hugging tail; at 20k vectors 2-bit bands mean 4
      // buckets/band and quadratic candidates (first rehearsal run
      // measured 765 s) — the knob, not the shape, is what changes
      "embed_cluster" -> (() => Dedup.clusters(
        SimilaritySearch.cosinePairsLsh(vecs, threshold = 0.4,
          nBits = 64, rowsPerBand = 8)
          .select(col("v1").as("d1"), col("v2").as("d2")).persist())),
      // the span pairing join is the newest quadratic-potential site:
      // 5 verbatim replicas per source doc push every span's df to ≥5,
      // so the rehearsal exercises the df-cap doing real work — spans
      // shared beyond maxDf docs (corpus templates) must die BEFORE
      // the self-join, keeping fan-out ≤ maxDf² per span
      "shared_spans" -> (() =>
        Dedup.sharedSpans(docs, k = 8, maxDf = 10, minShared = 3)),
      // row-local winnowing at 10× volume: guards the lambda-binding fix
      // (an InferFiltersFromGenerate regression would blow this up
      // ~100×, not ~10%)
      "winnow" -> (() =>
        graft.operators.TextAnalysis.winnow(docs, k = 3, w = 4)),
      // boilerplate strip under maximal template pressure: 5 verbatim
      // replicas push every gram's df ≥ 5, so nearly every position is
      // covered — the covered-set aggregate does its worst-case work
      "boilerplate_strip" -> (() =>
        graft.operators.TextAnalysis.boilerplateStrip(docs, n = 3,
          minDocs = 4)),
      // k-NN graph over the scale-sized LSH pairs: per-vector degree
      // stays bucket-bounded even with 5-member duplicate clusters
      "knn_graph" -> (() =>
        SimilaritySearch.knnGraph(
          SimilaritySearch.cosinePairsLsh(vecs, threshold = 0.4,
            nBits = 64, rowsPerBand = 8).persist(), k = 3)),
      // exact n-gram decontamination at 10×: the df cap and the
      // eval-side Bloom prune both do real work — 5 verbatim replicas
      // per source doc push every gram's df toward ≥10 (so the cap
      // kills template grams BEFORE pairing), and the Bloom filter
      // shrinks the train-side gram stream ahead of the exchange
      "ngram_overlap" -> (() => Dedup.ngramOverlap(corpusA, corpusB,
        n = 5, minShared = 3, maxDf = 20,
        bloomExpectedItems = 1L << 21)),
      // composed tokenize at 10×: the vocab aggregate + broadcast
      // encode + prefix-sum packing must keep their shapes when the
      // corpus is 10× and partitions are cluster-like — the packing
      // driver state stays O(partitions) scalars by construction
      "tokenize_pack" -> (() =>
        graft.operators.Curation.tokenize(docs, vocabSize = 50,
          budget = 256)),
      // PQ at 10× vectors: training stays bounded-driver (m × iters
      // jobs), encoding must remain one shuffle-free projection
      "pq_encode" -> (() =>
        SimilaritySearch.pqEncode(vecs, m = 2, codebookSize = 16,
          iters = 2)),
      // iterative PageRank over the 10× similarity graph: the
      // localCheckpoint lineage cut + scalar constants must hold at
      // cluster-like partition counts (3 join+agg rounds, no BNLJ)
      "graph_rank" -> (() =>
        graft.operators.GraphRank.pageRank(
          SimilaritySearch.knnGraph(
            SimilaritySearch.cosinePairsLsh(vecs, threshold = 0.4,
              nBits = 64, rowsPerBand = 8).persist(), k = 3)
            .select("src", "dst"),
          iterations = 3)),
      // composed IVF+PQ at 10× vectors with scale-sized cells (16
      // cells ⇒ ~1.25k vectors/cell): training stays bounded-driver
      // (3 k-means runs), candidates come from the broadcast equi-join
      // on cell — candidate mass ≈ nProbe/nCentroids of the corpus per
      // query regardless of corpus size
      "ivf_pq" -> (() =>
        SimilaritySearch.ivfPqTopK(vecs, nQueries = 5, k = 5,
          nCentroids = 16, nProbe = 4, m = 2, codebookSize = 16,
          iters = 2)))

    val results = runOps(spark, ops, () => {
      docs.persist(); vecs.persist() // keep the shared inputs resident
      docs.count(); vecs.count()
    })

    // documented tiny-broadcast BNLJ sites (mirrors PlanGuardSpec's
    // allowlist): tokenize's encode stage crosses the 1-row <unk>-id
    // scalar onto the token stream; ivf_pq inherits the nCentroids-row
    // centroid-grid broadcast — both bounded by construction
    val bnljAllowed = Set("tokenize_pack", "ivf_pq")
    val bad = results.filter { case (n, _, _, c, b) =>
      c > 0 || (b > 0 && !bnljAllowed.contains(n)) }
    val qs = results.map { case (n, s, r, c, b) =>
      s"""\"$n\":{"sec":${math.round(s * 100) / 100.0},"rows":$r,"cartesian":$c,"bnlj":$b}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"rehearsal":"10x","sf":"$sfDir","n_docs":$nDocs,"n_vecs":$nVecs,"partitions":$parts,"ops":$qs,"plan_guard":"${if (bad.isEmpty) "PASS" else "FAIL"}"}"""
    println(line)
    writeBlock("10x", line)
    require(bad.isEmpty,
      s"plan guard violated at 10x scale: ${bad.map(_._1).mkString(", ")}")
    spark.stop()
  }

  /** The 100× block: 500k docs / 200k vectors at a 400-partition
    * cluster-like layout, running the three heaviest 10× ops. Beyond
    * the zero-cartesian/zero-BNLJ guard, this run asserts SUB-LINEAR
    * pair fan-out: with bounded 10-member duplicate clusters
    * ([[docs100x]]), candidate/verified pairs per input row must stay
    * below a constant (10) — a quadratic pairing path would blow
    * through it immediately (500k docs all-pairs ≈ 250k pairs/doc). */
  private def run100x(spark: SparkSession, sfDir: String, parts: String): Unit = {
    import graft.operators.{Dedup, SimilaritySearch}
    val docs = docs100x(spark, graft.Tables(spark, sfDir, "documents"))
      .persist()
    val vecs = vecs100x(spark, graft.Tables(spark, sfDir, "embeddings"))
      .persist()
    val nDocs = docs.count()
    val nVecs = vecs.count()
    // contamination halves: replica stripes 0-49 vs 50-99; each holds
    // five verbatim replicas of every source doc, so real cross-corpus
    // duplicate mass exists (5×5 pairs per source) while staying linear
    val corpusA = docs.filter(col("doc_id") < 500000000L)
    val corpusB = docs.filter(col("doc_id") >= 500000000L)
      .select((col("doc_id") - 500000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    // LSH knob at 200k vectors: 16-bit band keys (~ log2(corpus)), the
    // operator's documented bucket-occupancy rule — shape unchanged
    val embedPairs = () => SimilaritySearch.cosinePairsLsh(
      vecs, threshold = 0.4, nBits = 64, rowsPerBand = 16)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    val ops: Seq[(String, () => DataFrame)] = Seq(
      "ppjoin" -> (() => Dedup.nearDupJaccard(docs, k = 3, threshold = 0.8)),
      "embed_pairs" -> (() => embedPairs()),
      "embed_cluster" -> (() => Dedup.clusters(embedPairs().persist())),
      "ngram_overlap" -> (() => Dedup.ngramOverlap(corpusA, corpusB,
        n = 5, minShared = 3, maxDf = 20,
        bloomExpectedItems = 1L << 24)))
    val results = runOps(spark, ops, () => {
      docs.persist(); vecs.persist()
      docs.count(); vecs.count()
    })
    val denom = Map("ppjoin" -> nDocs, "embed_pairs" -> nVecs,
      "embed_cluster" -> nVecs, "ngram_overlap" -> nDocs)
    val fanoutCap = 10.0
    val pairOps = Set("ppjoin", "embed_pairs", "ngram_overlap")
    val bad = results.filter { case (n, _, r, c, b) =>
      c > 0 || b > 0 ||
        (pairOps(n) && r.toDouble / denom(n) > fanoutCap)
    }
    val qs = results.map { case (n, s, r, c, b) =>
      val fo = math.round(r.toDouble / denom(n) * 1000) / 1000.0
      s"""\"$n\":{"sec":${math.round(s * 100) / 100.0},"rows":$r,"per_row_fanout":$fo,"cartesian":$c,"bnlj":$b}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"rehearsal":"100x","sf":"$sfDir","n_docs":$nDocs,"n_vecs":$nVecs,"partitions":$parts,"fanout_cap":$fanoutCap,"ops":$qs,"plan_guard":"${if (bad.isEmpty) "PASS" else "FAIL"}"}"""
    println(line)
    writeBlock("100x", line)
    require(bad.isEmpty,
      s"plan/fan-out guard violated at 100x scale: ${bad.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
