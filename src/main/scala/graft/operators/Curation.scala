package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Hashing

/** Dataset-curation operators for training-data pipelines: deterministic
  * sampling/splitting and per-group quota enforcement.
  *
  * Both avoid RNG state entirely — at 100 TB a split must be
  * reproducible across reruns, engines, and partitionings, which rules
  * out `rand()` (seed × partition-placement dependent). Hash-based
  * assignment gives every row a stable fate derived only from its key.
  */
object Curation {

  /** Canonical form of a URL column — the equivalence key web-corpus
    * curation dedups on before any content hashing (the same page is
    * crawled as http/https, with/without default port, with tracking
    * params, with a trailing slash — content-identical fetches that
    * naive exact-dedup treats as distinct):
    *
    *  - scheme and host lowercase (case-insensitive per RFC 3986);
    *  - port dropped (`parse_url HOST` excludes it — correct for the
    *    default-port duplicates this key targets);
    *  - trailing path slashes stripped;
    *  - `utm_*` tracking params dropped, the rest SORTED (param order
    *    is transport noise) and rejoined.
    *
    * Pure row-local projection over codegen'd builtins (`parse_url`,
    * `filter`/`array_sort` HOFs) — composes with the scan at zero plan
    * cost, like [[graft.expressions.NfcNormalize]]. Path case is
    * preserved (paths are case-sensitive). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val host = lower(parse_url(url, lit("HOST")))
    val path = regexp_replace(parse_url(url, lit("PATH")), lit("/+$"), lit(""))
    val kept = array_join(
      array_sort(filter(split(parse_url(url, lit("QUERY")), "&"),
        // literal-prefix test, NOT `like("utm_%")`: LIKE's `_` is a
        // single-char wildcard, so the pattern would also drop
        // non-tracking params such as `utma=1`/`utmx=...`
        p => !startswith(p, lit("utm_")))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Deterministic train/val/test split by key hash.
    *
    * bucket = hash32(salt ':' doc_id) mod 100 — uniform over keys,
    * stable under repartitioning, re-derivable by any engine with md5
    * (see [[Hashing]]). Changing `salt` draws an independent split.
    * Output: (doc_id, bucket, split).
    */
  def hashSplit(
      docs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10,
      salt: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = Hashing.hash32(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 100
    docs.select(
      col("doc_id"),
      bucket.cast("int").as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Per-group quota cap: keep the `quota` highest-quality documents per
    * `lang` (ties broken by doc_id — fully deterministic).
    *
    * Two-phase top-N so a hot group cannot serialize into one task: a
    * first row_number over (lang, input partition) prunes each shuffle
    * partition to its local top-`quota` (keeping any global-top-N row is
    * guaranteed: a row in the global top N of its lang is in the top N
    * of every subset containing it), then the final row_number over
    * `lang` ranks only the <= quota x partitions survivors. With few
    * groups and unbounded group size, the single-phase window is exactly
    * the skew shape that dies at scale.
    *
    * Output: (doc_id, lang, quality, qrank).
    */
  /** Deterministic per-group (stratified) downsampling: keep a row iff
    * hash32(salt ':' doc_id) mod 1000 falls under its language's
    * per-mille rate — the way a corpus is rebalanced (e.g. cap the
    * dominant language) without RNG state. Same stability contract as
    * [[hashSplit]]: the keep/drop fate of a document depends only on
    * its key, never on partitioning or visit order, and composes with
    * hashSplit under a different salt as an independent draw.
    *
    * Output: (doc_id, lang, bucket) for kept rows. */
  def stratifiedSample(
      docs: DataFrame,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int,
      salt: String = "strat"): DataFrame = {
    require((defaultPerMille +: ratesPerMille.values.toSeq)
      .forall(r => r >= 0 && r <= 1000),
      s"per-mille rates must be in [0, 1000]")
    val bucket = Hashing.hash32(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 1000
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("lang"), bucket.cast("int").as("bucket"),
        rate.as("rate"))
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")
  }

  /** Temperature-weighted domain mixture resampling: rebalance a corpus
    * so the per-group sampled counts follow n^alpha with alpha = 0.5
    * (the common "T = 2" multilingual setting) instead of the raw,
    * typically head-heavy n — downsampling only, never replicating.
    *
    * Per group g with n_g rows and n_min = min over groups:
    * keep-rate_g = (n_min / n_g)^(1-alpha) = sqrt(n_min / n_g), so the
    * smallest group is kept whole and sampled sizes are proportional to
    * sqrt(n_g) * sqrt(n_min) ∝ n_g^alpha. The rate is materialized in
    * per-mille via floor(1000 * sqrt(...)) — sqrt and double division
    * are IEEE-exact in every engine, so the rate table (and therefore
    * every row's fate) is bit-reproducible cross-engine; row fate itself
    * is the same hash32-bucket draw as [[hashSplit]] under its own salt.
    *
    * Scale shape: the rate table is one tiny aggregate (|groups| rows)
    * cross-broadcast with the 1-row n_min aggregate, then broadcast-
    * joined onto the corpus — the corpus itself never shuffles.
    *
    * Output: (doc_id, group, bucket, rate) for kept rows. */
  def domainMix(
      docs: DataFrame,
      groupCol: String = "lang",
      salt: String = "mix"): DataFrame = {
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val minN = counts.agg(min(col("n")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(groupCol),
        floor(lit(1000) * sqrt(col("n_min").cast("double") / col("n")))
          .as("rate"))
    val bucket = Hashing.hash32(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 1000
    docs
      .join(broadcast(rates), groupCol)
      .select(col("doc_id"), col(groupCol),
        bucket.cast("int").as("bucket"), col("rate"))
      .filter(col("bucket") < col("rate"))
  }

  /** Deterministic fractional UPSAMPLING — the epoch-style complement
    * of [[domainMix]] (which only downsamples): low-resource groups
    * REPEAT. Repeat factor r_g = min(sqrt(n_max / n_g), maxRepeat) in
    * e3 fixed-point (the α = 0.5 temperature convention): the largest
    * group keeps rate 1.0×, smaller groups repeat up to maxRepeat×. A
    * document emits floor(r) copies plus one more iff its hash bucket
    * falls under frac(r) — expectation exactly r per doc, RNG-free,
    * and every engine derives the same copy set (the [[hashSplit]]
    * argument).
    *
    * Scale shape: the rate table is one tiny aggregate cross-broadcast
    * with the 1-row max; the corpus never shuffles — copies come from
    * a row-local `explode(sequence(...))` generator (a join-free row
    * multiplier), and output volume is bounded by maxRepeat × |docs|.
    *
    * Output: one row per emitted copy (doc_id, group, copy_id,
    * rate_e3). */
  def domainUpsample(
      docs: DataFrame,
      groupCol: String = "lang",
      maxRepeat: Int = 4,
      salt: String = "up"): DataFrame = {
    require(maxRepeat >= 1, s"invalid maxRepeat=$maxRepeat")
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val maxN = counts.agg(max(col("n")).as("n_max"))
    val rates = counts.crossJoin(broadcast(maxN))
      .select(col(groupCol),
        least(
          floor(lit(1000) * sqrt(col("n_max").cast("double") / col("n"))),
          lit(1000L * maxRepeat)).as("rate_e3"))
    val bucket = Hashing.hash32(
      concat(lit(s"$salt:"), col("doc_id").cast("string"))) % 1000
    docs
      .join(broadcast(rates), groupCol)
      .select(col("doc_id"), col(groupCol), col("rate_e3"),
        (floor(col("rate_e3") / 1000) +
          when(bucket < col("rate_e3") % 1000, 1L).otherwise(0L))
          .as("copies"))
      .select(col("doc_id"), col(groupCol), col("rate_e3"),
        explode(sequence(lit(1L), col("copies"))).as("copy_id"))
      .select("doc_id", groupCol, "copy_id", "rate_e3")
  }

  /** Token-budget corpus selection — "fill N tokens per group with the
    * best documents": rank by [[TextAnalysis.qualityScore]] descending
    * (doc_id tie-break), keep the greedy prefix whose RUNNING token sum
    * stays within the budget. The data-selection step a
    * budget-constrained training run makes after curation.
    *
    * Scale shape: one window cumsum per group partition. At corpus
    * scale the refinement mirrors [[quotaCap]]'s two-phase top-N:
    * partition-local pruning of documents that cannot make the budget
    * boundary before the global ranked cumsum — the cutoff semantics
    * here are identical either way.
    *
    * Output: (doc_id, group, n_tokens, quality, cum_tokens), kept rows
    * only. */
  def budgetSelect(
      docs: DataFrame,
      groupCol: String = "lang",
      tokenBudget: Long = 3000L): DataFrame = {
    require(tokenBudget >= 1, s"invalid tokenBudget=$tokenBudget")
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col(groupCol))
      .join(q, "doc_id")
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col(groupCol), col("n_tokens"),
        col("quality"), col("cum_tokens"))
  }

  /** The composed end-to-end curation pipeline — the operators above and
    * the dedup family chained into ONE lineage, the way a real
    * training-data job runs them:
    *
    *   exact dedup → near-dup MinHash pairs → connected-component
    *   clusters → keep only cluster representatives → quality score +
    *   per-lang quota → deterministic hash split → token chunking.
    *
    * Stage interactions this exercises that no isolated query does:
    * the iterative [[Dedup.clusters]] loop runs DURING construction
    * (its localCheckpoints truncate lineage mid-pipeline), the
    * survivor/kept frames each feed multiple downstream branches (so
    * they are persisted — without that the exact-dedup aggregate and
    * the anti-join re-execute once per branch), and the final
    * assembly joins a per-doc frame (quota) against a per-chunk
    * generator output without column collisions.
    *
    * Scale shape: every stage is the already-audited operator — no new
    * shuffle structure appears from composition; the final join
    * broadcasts the quota side (bounded by quota × |langs|).
    *
    * Output: one row per (kept ∧ quota-winning doc, chunk):
    * (doc_id, lang, quality, qrank, split, chunk_id, n_chunk_tokens,
    * chunk_text). */
  def curate(
      docs: DataFrame,
      k: Int = 3,
      threshold: Double = 0.8,
      quota: Int = 50,
      trainPct: Int = 80,
      valPct: Int = 10,
      maxTokens: Int = 50,
      stride: Int = 25): DataFrame = {
    // stage 1: exact dedup — survivors are the canonical copy per hash
    val canonical = Dedup.exact(docs).select("doc_id")
    val survivors = docs.join(canonical, "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // stage 2: near-dup pairs + clusters; drop non-representatives.
    // clusters() iterates real jobs here, mid-lineage — its output
    // frame starts from a materialized fixpoint.
    val pairs = Dedup.nearDupMinHash(survivors, k, threshold)
    val dropped = Dedup.clusters(pairs)
      .filter(col("doc_id") =!= col("rep_id"))
      .select("doc_id")
    val kept = survivors.join(dropped, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // stage 3-5: quota (quality-ranked), split, chunks — three branches
    // off the kept frame, reassembled on doc_id
    val quotaed = quotaCap(kept, quota)
    val splits = hashSplit(kept, trainPct, valPct).select("doc_id", "split")
    val chunks = TextAnalysis.chunkSplit(kept, maxTokens, stride)
    quotaed
      .join(splits, "doc_id")
      .join(chunks, "doc_id")
      .select("doc_id", "lang", "quality", "qrank", "split",
        "chunk_id", "n_chunk_tokens", "chunk_text")
  }

  /** Perplexity-quantile quality filter (the CCNet shape: score every
    * document against a language model, keep the best fraction per
    * language): scores come from [[TextAnalysis.unigramLmScore]]; within
    * each language documents rank by score (ties: doc_id asc) and the
    * top ceil(keepFrac·n) survive.
    *
    * The rank cutoff is an ORDER STATISTIC, not an interpolated
    * percentile — pure integer logic over scores that are already
    * bit-identical cross-engine (fixed-point sums), so row fate is
    * exactly re-derivable. The per-language window is the exactness
    * contract of the declared query; at corpus scale the standard
    * production swap is an approx-percentile cutoff VALUE broadcast
    * against the scan (one pass, no window), trading exact boundary
    * rows for flatness.
    *
    * Output: (doc_id, lang, n_tokens, sum_logp_e4, avg_logp, lang_rank).
    */
  def perplexityFilter(
      docs: DataFrame,
      vocabSize: Int = 20,
      keepFrac: Double = 0.75): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"invalid keepFrac=$keepFrac")
    val scores = TextAnalysis.unigramLmScore(docs, vocabSize)
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_logp").desc, col("doc_id"))
    val wn = Window.partitionBy("lang")
    docs.select("doc_id", "lang")
      .join(scores, "doc_id")
      .withColumn("lang_rank", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(wn))
      .filter(col("lang_rank") <= ceil(col("n_lang") * keepFrac))
      .select("doc_id", "lang", "n_tokens", "sum_logp_e4", "avg_logp",
        "lang_rank")
  }

  /** Composed PREPARATION pipeline — the second end-to-end lineage next
    * to [[curate]], chaining the quality-side operators: perplexity
    * quality filter ([[perplexityFilter]]) → cross-document boilerplate
    * stripping ([[graft.operators.TextAnalysis.boilerplateStrip]], with
    * the gram document-frequency computed over the FILTERED corpus —
    * composition changes the df denominator, which is exactly what a
    * staged pipeline does) → context-window chunking of the cleaned
    * text ([[graft.operators.TextAnalysis.chunkSplit]]).
    *
    * The filtered frame feeds the strip's gram stream, its df
    * aggregate, and the reassembly projection — persisted once so the
    * quality scoring runs once, not once per branch (the [[curate]]
    * pattern). No new shuffle structure beyond the audited component
    * operators.
    *
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text). */
  def prepare(
      docs: DataFrame,
      vocabSize: Int = 20,
      keepFrac: Double = 0.75,
      n: Int = 3,
      minDocs: Int = 4,
      maxTokens: Int = 30,
      stride: Int = 30): DataFrame = {
    val kept = perplexityFilter(docs, vocabSize, keepFrac).select("doc_id")
    val filtered = docs.join(kept, "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stripped = TextAnalysis.boilerplateStrip(filtered, n, minDocs)
    TextAnalysis.chunkSplit(
      stripped.select(col("doc_id"), col("clean_text").as("text")),
      maxTokens, stride)
  }

  /** Composed tokenization pipeline: vocabulary build → per-document
    * token-id encoding → context-window sequence packing, ONE lineage
    * over one input — the encode-and-pack step that turns curated text
    * into a model-ready training layout (the stage after [[curate]] /
    * [[prepare]] in a real run).
    *
    * Scale shape, mirroring the other composed pipelines: the input
    * persists because three passes scan it (the vocab aggregate, the
    * encode explode, the packing prefix sum); the vocab
    * (vocabSize + specials rows, bounded) rides a broadcast into the
    * encode join; [[Packing.packSequences]] contributes its documented
    * O(partitions) driver scalars and nothing else; the final
    * stats-to-layout join is doc_id-keyed equi-join — no new shuffle
    * structure beyond the audited component operators.
    *
    * Output: (doc_id, n_tokens, n_oov, ids_sum, pack_id, pack_off). */
  def tokenize(
      docs: DataFrame,
      vocabSize: Int = 50,
      budget: Int = 256): DataFrame = {
    val d = docs.persist(StorageLevel.MEMORY_AND_DISK)
    val enc = TextAnalysis.encodeIdsWith(
      d, TextAnalysis.buildVocab(d, vocabSize))
    val packed = Packing.packSequences(d, budget)
      .select("doc_id", "pack_id", "pack_off")
    enc.join(packed, Seq("doc_id"))
      .select("doc_id", "n_tokens", "n_oov", "ids_sum",
        "pack_id", "pack_off")
  }

  /** Deterministic corpus shuffle: assign every document a stable
    * pseudo-random training order. order key = hash32(salt ':' doc_id)
    * (tie-broken by doc_id), position = dense 0..n-1 rank in that
    * order — the "shuffle the corpus once, reproducibly" step before
    * sequence packing / epoch sharding.
    *
    * Same RNG-free rationale as [[hashSplit]]: the permutation depends
    * only on keys, never on partition placement, so reruns and engines
    * agree. Dense positions come from [[DenseId.withDenseId]] — a
    * range-partitioned parallel sort + per-partition offsets, NOT a
    * single-partition row_number window — so the pass has no
    * one-task stage at any corpus size.
    *
    * Output: (doc_id, shuf_key, position). */
  def corpusShuffle(docs: DataFrame, salt: String = "shuffle"): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      Hashing.hash32(concat(lit(s"$salt:"), col("doc_id").cast("string")))
        .as("shuf_key"))
    DenseId.withDenseId(
      keyed, "position", Seq(col("shuf_key"), col("doc_id")))
      .select("doc_id", "shuf_key", "position")
  }

  def quotaCap(docs: DataFrame, quota: Int = 100): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val local = Window.partitionBy(col("lang"), spark_partition_id())
      .orderBy(desc("quality"), asc("doc_id"))
    val global = Window.partitionBy("lang")
      .orderBy(desc("quality"), asc("doc_id"))
    scored
      .withColumn("r0", row_number().over(local))
      .filter(col("r0") <= quota)
      .withColumn("qrank", row_number().over(global).cast("long"))
      .filter(col("qrank") <= quota)
      .select("doc_id", "lang", "quality", "qrank")
  }

  /** Deterministic negative sampling — the contrastive-training data
    * prep step (dense retrieval, embedding training): each document
    * draws `k` "random" negatives from the corpus, with the draw a pure
    * hash function of (doc_id, slot) instead of an RNG, so the sample
    * is partition-invariant, reproducible by any engine, and stable
    * across re-runs (the same properties as [[hashSplit]]'s fates).
    *
    * Shape: dense ids via the no-single-partition scale path
    * ([[DenseId.withDenseId]]), negative id = hash32("neg:doc:slot")
    * mod corpus size, then ONE equi-join against the dense-id corpus to
    * materialize the negatives — no RNG, no sampling pass, no skew (the
    * hash spreads draws uniformly). Self-draws (a doc sampling itself)
    * are dropped rather than re-rolled, keeping the contract pure
    * per-row arithmetic; the expected loss is k/N rows.
    *
    * Output: (doc_id, slot, neg_doc_id, neg_lang). */
  def negativeSample(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, s"negativeSample: k must be >= 1, got $k")
    val dense = DenseId.withDenseId(
      docs.select(col("doc_id"), col("lang")), "did", Seq(col("doc_id")))
    val n = dense.count()
    val draws = dense
      .select(col("doc_id"), col("did"),
        explode(expr(s"sequence(0, ${k - 1})")).as("slot"))
      .withColumn("neg_did",
        Hashing.hash32(concat(lit("neg:"), col("doc_id").cast("string"),
          lit(":"), col("slot").cast("string"))) % n)
      .filter(col("neg_did") =!= col("did"))
    val corpus = dense.select(col("did").as("neg_did"),
      col("doc_id").as("neg_doc_id"), col("lang").as("neg_lang"))
    draws.join(corpus, "neg_did")
      .select(col("doc_id"), col("slot"), col("neg_doc_id"), col("neg_lang"))
  }

  /** CCNet-shaped curation (Wenzek et al. 2020, "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): the
    * three-stage web-corpus pipeline — exact dedup → language ID →
    * LM scoring — with survivors bucketed into per-language
    * HEAD / MIDDLE / TAIL tertiles by score, CCNet's signature output
    * shape (downstream consumers train on head+middle and drop tail).
    *
    * Composed entirely from the verified stage operators
    * ([[Dedup.exact]], [[TextAnalysis.langId]],
    * [[TextAnalysis.unigramLmScore]]) as ONE lineage, the
    * [[curate]]/[[prepare]] pattern. Tertiles come from ntile(3) over
    * (score DESC, doc_id) per predicted language — the SQL-standard
    * ntile both engines share.
    *
    * Scale shape: the stage shapes are unchanged (digest dedup,
    * broadcast profiles/LM, one grouped aggregate); the only addition
    * is a per-language window over the per-DOC frame (corpus-sized
    * but one row per doc, partitioned by language).
    *
    * Output: (doc_id, pred_lang, n_tokens, avg_logp, bucket). */
  def ccnet(docs: DataFrame, vocabSize: Int = 20): DataFrame = {
    val kept = docs.join(Dedup.exact(docs).select("doc_id"), "doc_id")
    val lid = TextAnalysis.langId(kept)
      .select(col("doc_id"), col("pred_lang"))
    val lm = TextAnalysis.unigramLmScore(kept, vocabSize)
      .select(col("doc_id"), col("n_tokens"), col("avg_logp"))
    val w = Window.partitionBy("pred_lang")
      .orderBy(col("avg_logp").desc, col("doc_id").asc)
    lid.join(lm, "doc_id")
      .withColumn("tertile", ntile(3).over(w))
      .select(col("doc_id"), col("pred_lang"), col("n_tokens"),
        col("avg_logp"),
        when(col("tertile") === 1, "head")
          .when(col("tertile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws u ∈ (0, 1) from the hash fate and
    * ranks by the key u^(1/w) — taking the top k yields exactly the
    * distribution of sequential weighted draws without replacement,
    * with heavier documents proportionally likelier. The log transform
    * ln(u)/w is order-equivalent and avoids pow entirely.
    *
    * The RNG-free [[hashSplit]] rationale, plus the DSIR determinism
    * contract: u = (hash32 + 0.5) / 2³² is exact (offset keeps
    * u > 0 so ln never sees 0), ln(u) rounds to integer micro-nats per
    * row, and the sort key is ONE IEEE division of two exactly-
    * representable integers — deterministic across engines; ranking
    * happens on the unrounded key with a doc_id tie-break.
    *
    * Scale shape: per-row arithmetic plus one global top-k. The rank
    * is a window here (it appears in the output); at corpus scale it
    * refines to the [[quotaCap]] two-phase top-N.
    *
    * Output: (doc_id, weight, score, rnk) for the k winners. */
  def weightedSample(
      docs: DataFrame,
      k: Int = 50,
      weightCol: String = "n_chars",
      salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (Hashing.hash32(
      concat(lit(s"$salt:"), col("doc_id").cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296d)
    docs
      // E-S requires strictly positive weights: w = 0 would make the
      // key 0/0 = NaN, which Spark sorts FIRST and DuckDB's NULL sorts
      // last — a zero-weight row is simply not in the draw
      .filter(col(weightCol) > 0)
      .select(col("doc_id"), col(weightCol).cast("long").as("weight"),
        round(log(u) * lit(1000000d)).cast("long").as("ku"))
      .withColumn("skey", col("ku").cast("double") / col("weight"))
      .withColumn("rnk", row_number().over(
          Window.orderBy(col("skey").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rnk") <= k)
      // + 0.0 canonicalizes IEEE -0.0 after the display rounding (the
      // importanceResample hazard)
      .select(col("doc_id"), col("weight"),
        (round(col("skey"), 4) + lit(0.0)).as("score"), col("rnk"))
  }

  /** Preference-pair construction — the DPO/RLHF dataset shape: within
    * each group (a prompt-cluster proxy), pair the i-th BEST document
    * with the i-th WORST by [[TextAnalysis.qualityScore]], emitting
    * (chosen, rejected) rows with their score gap. Best-vs-worst
    * maximizes the preference margin per pair, the property a
    * preference-optimization loss wants.
    *
    * Both ranks come from row_number over the SAME group partition —
    * the ascending order is the exact mirror of the descending one
    * (quality DESC, doc_id ASC vs quality ASC, doc_id DESC), so
    * r_best(x) + r_worst(x) = n + 1 and capping pair_idx at
    * least(maxPairs, n/2) guarantees chosen ≠ rejected. The pair join
    * is a self-join on (group, pair_idx): at most maxPairs rows per
    * group on each side, so the join input is bounded by the group
    * count, not the corpus. Pairs whose quality gap rounds to 0 are
    * dropped — an unseparable pair teaches a preference loss nothing.
    *
    * Scale shape: one shuffle on the group key (two window functions
    * and the count ride the same partitioning), then a tiny
    * (groups × maxPairs) self-join.
    *
    * Output: (group, pair_idx, chosen_id, rejected_id, q_chosen,
    * q_rejected, gap). */
  def preferencePairs(
      docs: DataFrame,
      groupCol: String = "source",
      maxPairs: Int = 3): DataFrame = {
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    val scored = docs.select(col("doc_id"), col(groupCol)).join(
      TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality")),
      "doc_id")
    val grp = Window.partitionBy(groupCol)
    val ranked = scored
      .withColumn("r_best", row_number().over(
        grp.orderBy(col("quality").desc, col("doc_id").asc)))
      .withColumn("r_worst", row_number().over(
        grp.orderBy(col("quality").asc, col("doc_id").desc)))
      .withColumn("cap",
        least(lit(maxPairs.toLong), floor(count(lit(1)).over(grp) / 2)))
    val chosen = ranked.filter(col("r_best") <= col("cap"))
      .select(col(groupCol), col("r_best").cast("long").as("pair_idx"),
        col("doc_id").as("chosen_id"), col("quality").as("q_chosen"))
    val rejected = ranked.filter(col("r_worst") <= col("cap"))
      .select(col(groupCol), col("r_worst").cast("long").as("pair_idx"),
        col("doc_id").as("rejected_id"), col("quality").as("q_rejected"))
    chosen.join(rejected, Seq(groupCol, "pair_idx"))
      .withColumn("gap", round(col("q_chosen") - col("q_rejected"), 4))
      .filter(col("gap") > 0)
      .select(col(groupCol), col("pair_idx"), col("chosen_id"),
        col("rejected_id"), col("q_chosen"), col("q_rejected"), col("gap"))
  }

  /** Importance-resampled data selection (the DSIR shape — Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by its log-likelihood ratio
    * under a hashed-unigram LM of the TARGET domain vs the RAW pool,
    * then keep the top keepPct% — "select raw data that looks like the
    * target".
    *
    * Hashed features are the scale lever: tokens map to
    * hash32(tok) mod `nBuckets` buckets, so BOTH language models are
    * dense `nBuckets`-row tables regardless of corpus size — always
    * broadcastable, never a vocabulary-sized shuffle. Add-one
    * smoothing keeps every bucket finite.
    *
    * Determinism across engines: the per-bucket log-ratio is rounded
    * to integer MICRO-nats (`round(ln(...) * 1e6)` as BIGINT) before
    * the per-document sum, so the sum is exact integer arithmetic with
    * no float-association hazard (the BM25 fixed-column lesson); only
    * the final length normalization divides, and a single IEEE
    * division is order-free.
    *
    * Scale shape: two bucket aggregates (≤ nBuckets rows each, partial
    * agg does the work) → one broadcast join onto the token stream →
    * one shuffle on doc_id for the per-doc sum. The global top-K rank
    * is a window here (rank must appear in the output); at corpus
    * scale it refines to the [[quotaCap]] two-phase top-N with
    * identical cutoff semantics.
    *
    * Output: selected rows (doc_id, lang, n_toks, score, rnk),
    * score in nats/token rounded to 4 decimals. */
  def importanceResample(
      docs: DataFrame,
      targetLang: String = "en",
      nBuckets: Int = 1024,
      keepPct: Int = 20): DataFrame = {
    require(nBuckets >= 2 && keepPct >= 1 && keepPct <= 100,
      s"invalid nBuckets=$nBuckets / keepPct=$keepPct")
    val toks = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("bucket", Hashing.hash32(col("tok")) % nBuckets)
    val rawCnt = toks.groupBy("bucket").agg(count(lit(1)).as("c_raw"))
    val tgtCnt = toks.filter(col("lang") === targetLang)
      .groupBy("bucket").agg(count(lit(1)).as("c_tgt"))
    val rawTot = rawCnt.agg(sum("c_raw").as("t_raw"))
    val tgtTot = tgtCnt.agg(sum("c_tgt").as("t_tgt"))
    val b = lit(nBuckets.toDouble)
    val lm = rawCnt
      .join(tgtCnt, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("bucket"),
        round(log(
          ((col("c_tgt") + 1) * (col("t_raw") + b)) /
            ((col("c_raw") + 1) * (col("t_tgt") + b))) * 1e6)
          .cast("long").as("llr_u"))
    val perDoc = toks
      .join(broadcast(lm), "bucket")
      .groupBy("doc_id", "lang")
      .agg(sum("llr_u").as("score_u"), count(lit(1)).as("n_toks"))
      .withColumn("score",
        // + 0.0 canonicalizes IEEE -0.0 (a tiny negative score rounded
        // to 4 decimals) to +0.0 — engines disagree on the sign bit
        round(col("score_u").cast("double") / col("n_toks") / 1e6, 4)
          + lit(0.0))
    val n = docs.count()
    val k = math.max(1L, n * keepPct / 100)
    perDoc
      .withColumn("rnk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "lang", "n_toks", "score", "rnk")
  }
}
