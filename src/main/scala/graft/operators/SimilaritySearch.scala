package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.storage.StorageLevel

import graft.functions.Similarity

/** Approximate & exact nearest-neighbor search over embedding columns
  * (`ArrayType(FloatType)`).
  *
  * Two paths:
  *  - [[bruteTopK]] — exact: broadcast the (small) query set against the
  *    corpus, cosine per pair, per-query top-k via window. Scales
  *    linearly in |corpus| × |queries|; the corpus is never shuffled.
  *  - [[lshTopK]] — random-hyperplane LSH: bucket every vector by the
  *    sign pattern of its dot products with a fixed probe set, search
  *    only within the query's bucket. At scale this turns a full scan
  *    into a bucket-local scan (expected |corpus| / 2^probes candidates);
  *    buckets are a plain column, so the bucket join shuffles on a
  *    short string key.
  *
  * Probes here are drawn deterministically from the corpus itself (the
  * lowest vec_ids) so results are reproducible across engines without a
  * shared RNG. A production deployment would use fixed random
  * hyperplanes; the plumbing is identical.
  *
  * [[cosinePairs]] is the embedding-space near-dup operator (all pairs
  * above a cosine threshold).
  */
object SimilaritySearch {

  /** Vectors annotated with their L2 norm — computed once per vector so
    * pairwise cosine needs only the cross dot product. Numerically
    * identical to recomputing norms per pair (norms are per-vector
    * deterministic). */
  private def withNorm(vecs: DataFrame, id: String, vec: String): DataFrame =
    vecs.select(
      col("vec_id").as(id), col("embedding").as(vec),
      sqrt(Similarity.norm2(col("embedding"))).as(s"${id}_nrm"))

  /** Exact top-k neighbors for each query vector (queries = vec_id <
    * nQueries), excluding self. Output: (q_id, vec_id, rank, cos). */
  def bruteTopK(vecs: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = withNorm(vecs, "vec_id", "embedding")
    val queries = withNorm(vecs.filter(col("vec_id") < nQueries), "q_id", "q_vec")
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_raw").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        Similarity.dot(col("embedding"), col("q_vec"))
          / (col("vec_id_nrm") * col("q_id_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("q_id"), col("vec_id"), col("rank"),
        round(col("cos_raw"), 4).as("cos"))
  }

  /** Embedding near-dup: all pairs (v1 < v2) with cosine ≥ threshold.
    * Norms precomputed per vector; the pairwise work is one fused dot
    * product per pair. */
  def cosinePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(vecs, "v1", "e1")
    val b = withNorm(vecs, "v2", "e2")
    a.crossJoin(b)
      .filter(col("v1") < col("v2"))
      .withColumn("cos_raw",
        Similarity.dot(col("e1"), col("e2"))
          / (col("v1_nrm") * col("v2_nrm")))
      .filter(col("cos_raw") >= threshold)
      .select(col("v1"), col("v2"), round(col("cos_raw"), 4).as("cos"))
  }

  /** Sign-pattern bucket id for every vector: bit p = 1 iff
    * dot(vec, probe_p) ≥ 0, probes = the nProbes lowest vec_ids
    * actually present (derived, not assumed — a corpus whose ids don't
    * start at 0 would otherwise produce NULL buckets for everything). */
  def lshBuckets(vecs: DataFrame, nProbes: Int = 4): DataFrame = {
    val probes = vecs.orderBy("vec_id").limit(nProbes)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).as("p_id"),
        col("embedding").as("p_vec"))
    val bits = vecs.crossJoin(broadcast(probes))
      .select(
        col("vec_id"), col("p_id"),
        when(Similarity.dot(col("embedding"), col("p_vec")) >= 0, lit("1"))
          .otherwise(lit("0")).as("bit"))
    // one agg column per probe keeps the concat order deterministic
    // (collect_list order is not)
    val bitCols = (0 until nProbes)
      .map(p => max(when(col("p_id") === p, col("bit"))).as(s"b$p"))
    bits.groupBy("vec_id")
      .agg(bitCols.head, bitCols.tail: _*)
      .select(
        col("vec_id"),
        concat((0 until nProbes).map(p => col(s"b$p")): _*).as("bucket"))
  }

  /** IVF coarse quantizer: assign every vector to its nearest centroid
    * cell. Centroids are the nCentroids lowest vec_ids (a deterministic,
    * training-free stand-in — production would run k-means; the
    * assignment/probe plumbing is identical). Output: (vec_id, cell). */
  def ivfCells(vecs: DataFrame, nCentroids: Int = 8): DataFrame =
    ivfAssignments(vecs, nCentroids).filter(col("c_rank") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))

  /** Per-vector centroid ranking (rank 1 = nearest). Cosine against
    * each centroid needs only the centroid norm — the vector's own norm
    * is constant within its argmax. */
  private def ivfAssignments(vecs: DataFrame, nCentroids: Int): DataFrame = {
    val centroids = vecs.orderBy("vec_id").limit(nCentroids)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).as("c_id"),
        col("embedding").as("c_vec"))
      .withColumn("c_nrm", sqrt(Similarity.norm2(col("c_vec"))))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("c_sim").desc, col("c_id"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        Similarity.dot(col("embedding"), col("c_vec")) / col("c_nrm"))
      .withColumn("c_rank", row_number().over(w))
  }

  /** IVF top-k: search only the nProbe cells nearest to each query
    * vector. At scale the corpus is partitioned by cell (each probe
    * touches |corpus|/nCentroids vectors), while the centroid table is
    * a broadcast constant. Exact recall is bounded by the probe count —
    * the standard IVF trade. */
  def ivfTopK(
      vecs: DataFrame,
      nQueries: Int = 5,
      k: Int = 5,
      nCentroids: Int = 8,
      nProbe: Int = 2): DataFrame = {
    // one persisted assignment pass serves both the corpus cells
    // (rank 1) and the query probes (rank <= nProbe) — the
    // vecs x centroids cross join is the operator's dominant cost
    val assignments = ivfAssignments(vecs, nCentroids)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cells = assignments.filter(col("c_rank") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
    val corpus = vecs.join(cells, "vec_id")
      .withColumn("nrm", sqrt(Similarity.norm2(col("embedding"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val queryProbes = assignments
      .filter(col("vec_id") < nQueries && col("c_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(
        col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("nrm").as("q_nrm"))
      .join(queryProbes, "q_id")
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_raw").desc, col("vec_id"))
    corpus.join(broadcast(queries), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        Similarity.dot(col("embedding"), col("q_vec"))
          / (col("nrm") * col("q_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("q_id"), col("vec_id"), col("cell"), col("rank"),
        round(col("cos_raw"), 4).as("cos"))
  }

  /** LSH-bucketed top-k: like [[bruteTopK]] but candidates are only the
    * vectors in the query's own bucket. */
  def lshTopK(
      vecs: DataFrame,
      nQueries: Int = 5,
      k: Int = 5,
      nProbes: Int = 4): DataFrame = {
    val withBuckets = vecs.join(lshBuckets(vecs, nProbes), "vec_id")
      .withColumn("nrm", sqrt(Similarity.norm2(col("embedding"))))
      .persist(StorageLevel.MEMORY_AND_DISK) // read by query + candidate sides
    val queries = withBuckets.filter(col("vec_id") < nQueries)
      .select(
        col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("bucket"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_raw").desc, col("vec_id"))
    withBuckets.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        Similarity.dot(col("embedding"), col("q_vec"))
          / (col("nrm") * col("q_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("q_id"), col("vec_id"), col("bucket"), col("rank"),
        round(col("cos_raw"), 4).as("cos"))
  }
}
