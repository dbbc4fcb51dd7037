package graft

/** Partition-invariance: declared queries must produce identical rows
  * regardless of `spark.sql.shuffle.partitions` — the property that
  * makes results reproducible between local[4] and a 1000-executor
  * cluster. Exercises the order-sensitive suspects: exact decimal
  * sums, window frames, sketch pipelines, surrogate keys. */
class DeterminismSpec extends SparkSpec {

  private val sample = Seq(
    "r_agg_group",       // decimal money sums across merge orders
    "r_window_running",  // frame accumulation
    "f_surrogate_key",   // row_number density
    "x_dedup_minhash",   // sketch + LSH + verify chain
    "x_stream_session",  // session assembly
    "x_dedup_cluster",   // iterative fixpoint over shuffled joins
    "x_quota_cap",       // two-phase top-N (partition-dependent prune)
    "x_tfidf_topterms",  // rank over rounded scores
    "x_dedup_simhash64", // two-word sketch, 64-column bit-sum agg
    "x_pipeline_curate", // the composed lineage: every suspect at once
    "x_join_bucket",     // bucketed distribution vs shuffle conf
    "x_corpus_shuffle",  // zipWithIndex offsets across partition counts
    "x_graph_rank",      // iterative join+agg rounds, integer fixed-point
    "x_quality_filter",  // rank window over cross-engine double scores
    "x_heavy_cms",       // sketch counter grid across merge orders
    "x_pipeline_prepare", // the composed quality lineage end to end
    "x_join_fuzzy",      // blocked candidates + rank across partitionings
    "r_resample",        // span grids + carry-forward frames
    "x_split_leakage",   // CC labels + window audit across partitionings
    "x_entity_resolve",  // blocked pairs -> CC entity ids
    "x_sim_ivf_pq",      // 3 k-means trainings + probe-join + LUT sums
    "x_zorder_prune",    // layout write + covering-tile pruned read
    "x_bootstrap_ci",    // hash-fated weights, fixed-point weighted means
    "x_inverted_index",  // two-phase posting cap across partitionings
    "x_negative_sample", // dense-id draws (zipWithIndex offsets)
    "x_mmr_rerank",      // greedy integer argmax chain over joins/windows
    "x_mmr_serving",     // IVF+PQ pool + exact refine + greedy argmax
    "x_ann_recall_curve", // kmeans + PQ + per-probe grading aggregates
    "x_quality_rrf",     // per-lang rank windows + integer fusion
    "r_join_interval",   // bin explode + equi-join + exactly-once claim
    "x_sketch_rollup",   // HLL register merge across partition orders
    // KLL compaction across merge orders. NOTE: datasketches KLL
    // compaction draws from a shared non-seeded Random once a group
    // exceeds k=200 values, so the merged-sketch ESTIMATE is not
    // structurally deterministic — this invariance holds because the
    // query's approx_ok verdict uses a ±5% rank margin that dwarfs
    // the ~1.65% k=200 error bound (margin-dependent, by design;
    // a near-boundary dataset could flake where this one cannot)
    "x_quantile_rollup",
    "x_sketch_setops",   // theta union/intersect across merge orders
    // MG counter merge across partition orders: exact mode at test
    // scale (vocab << maxMapSize, no purges), so counts — not just
    // the item set — are structurally partition-invariant
    "x_freq_rollup",
    "x_stream_sketch")   // streamed store maintenance vs shuffle conf

  sample.foreach { name =>
    test(s"$name is invariant to shuffle partitioning (2 vs 16)") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val a = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        val b = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
        assert(a.length == b.length)
        assert(a.sameElements(b), s"$name diverged across partition counts")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
