package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for corpus curation pipelines: language ID,
  * quality scoring, token counting, and content fingerprinting.
  *
  * Everything is integer/deterministic arithmetic over token streams so
  * results are exactly reproducible across engines. All operators are
  * single-pass over the documents table with one aggregate shuffle at
  * most — no driver-side loops anywhere.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Per-language corpus statistics (doc counts, token totals, type
    * counts, average doc length). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_types"),
        round(count(lit(1)).cast("double") / countDistinct("doc_id"), 4)
          .as("avg_doc_tokens"))

  /** Corpus-derived unigram language-model scoring — the cheap stand-in
    * for the perplexity filters production pipelines run with a trained
    * LM (no model weights exist in this environment, so the LM is the
    * corpus's own maximum-likelihood unigram distribution; swapping in
    * external (token, logp) weights is the same broadcast join).
    *
    * Vocabulary = the top `vocabSize` tokens by corpus frequency (ties:
    * token asc); every vocabulary token scores log10(count / total),
    * out-of-vocabulary tokens score the floor log10(1 / total). A
    * document's score is the mean per-token log-probability — low means
    * "unlike the corpus", the usual junk-filter signal.
    *
    * Determinism at scale: per-token log-probs are quantized to 1e-4
    * fixed-point BIGINTs BEFORE summation, so the per-doc sum is exact
    * integer arithmetic — independent of partition/merge order (the
    * float-sum nondeterminism every distributed mean hits otherwise).
    *
    * Scale shape: one groupBy(token) aggregate for counts; the vocab
    * (vocabSize rows) and the 1-row total cross-broadcast onto the
    * exploded token stream; one groupBy(doc_id) to finish. The corpus
    * shuffles once, on token — everything else is broadcast.
    *
    * Output: (doc_id, n_tokens, sum_logp_e4, avg_logp). */
  def unigramLmScore(docs: DataFrame, vocabSize: Int = 20): DataFrame = {
    val toks = docs.select(
      col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val vocab = counts
      .orderBy(desc("cnt"), asc("tok")).limit(vocabSize)
      .crossJoin(broadcast(total))
      .select(col("tok"),
        // 1e-4 fixed-point of log10 p(tok); OOV floor is computed the
        // same way with cnt = 1 at the scoring site below
        round(log(10.0, col("cnt").cast("double") / col("total")) * 10000)
          .cast("long").as("logp_e4"))
    val floorLogp =
      round(log(10.0, lit(1.0) / col("total")) * 10000).cast("long")
    val floorRow = total.select(floorLogp.as("floor_e4"))
    toks
      .join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(floorRow))
      .select(col("doc_id"),
        coalesce(col("logp_e4"), col("floor_e4")).as("tok_e4"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("tok_e4")).as("sum_logp_e4"))
      // no decimal rounding on the mean: the sum is an exact integer and
      // the two divisions are IEEE-correctly-rounded in every engine, so
      // the unrounded double is bit-identical cross-engine — rounding
      // would REINTRODUCE half-way-boundary divergence (observed: a
      // mean landing exactly on .xxxx5 rounds differently in Spark
      // HALF_UP vs DuckDB)
      .select(col("doc_id"), col("n_tokens"), col("sum_logp_e4"),
        (col("sum_logp_e4").cast("double") / 10000 / col("n_tokens"))
          .as("avg_logp"))
  }

  /** N-gram-profile language ID.
    *
    * Profiles are derived from the corpus itself: the top `profileSize`
    * tokens per language by frequency (ties broken by token asc). Each
    * document is scored per language by how many of its distinct tokens
    * appear in that language's profile; the argmax (ties: lang asc) is
    * the prediction. Profiles are tiny (langs × profileSize rows) and
    * broadcast; the document side never shuffles its text. */
  def langId(docs: DataFrame, profileSize: Int = 10): DataFrame = {
    val toks = docs.select(
      col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val wProfile = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("tok"))
    val profile = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(wProfile))
      .filter(col("r") <= profileSize)
      .select(col("lang").as("p_lang"), col("tok"))
    val docToks = toks.select(col("doc_id"), col("tok")).distinct()
    val scores = docToks.join(broadcast(profile), "tok")
      .groupBy("doc_id", "p_lang").agg(count(lit(1)).as("score"))
    // full (doc × lang) grid so zero-score languages still compete
    val langs = docs.select(col("lang").as("p_lang")).distinct()
    val grid = docs.select("doc_id", "lang").crossJoin(broadcast(langs))
    val wBest = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("p_lang"))
    grid.join(scores, Seq("doc_id", "p_lang"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("r", row_number().over(wBest))
      .filter(col("r") === 1)
      .select(
        col("doc_id"), col("lang").as("actual_lang"),
        col("p_lang").as("pred_lang"), col("score"),
        (col("p_lang") === col("lang")).as("match"))
  }

  /** Reciprocal-rank-fusion quality ensemble (Cormack et al.,
    * SIGIR'09) — the standard way a curation pipeline combines
    * incommensurable quality signals (heuristics, classifier scores)
    * without calibrating them onto one scale: each signal contributes
    * only its RANK, and fused = Σ_s 1/(kRrf + rank_s).
    *
    * Signals here: token count (length), type-token ratio (lexical
    * diversity), chars-per-token (word-length proxy) — each ranked
    * descending PER LANGUAGE (signals are not comparable across
    * languages, and a per-group window is also what keeps the sort
    * scale-safe: a global fusion would funnel the corpus through one
    * partition; at 100 TB the per-language groups shard further by
    * quantile-bucketing the signal first). Ranks are `row_number` with
    * the doc_id tie-break, and the fusion is EXACT integer arithmetic:
    * rrf_e9 = Σ_s 10⁹ div (kRrf + rank_s) — so any engine replays the
    * fused order bit-for-bit.
    *
    * Output: (doc_id, lang, r_len, r_ttr, r_cpt, rrf_e9, fused_rank). */
  def rrfQuality(docs: DataFrame, kRrf: Int = 60): DataFrame = {
    val toks = split(col("text"), " ")
    def rankBy(c: Column): Column =
      row_number().over(
        Window.partitionBy("lang").orderBy(c.desc, col("doc_id")))
        .cast("long")
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"),
        col("n_chars"))
      .withColumn("ttr",
        col("n_unique").cast("double") / col("n_tokens"))
      .withColumn("cpt",
        col("n_chars").cast("double") / col("n_tokens"))
      .withColumn("r_len", rankBy(col("n_tokens")))
      .withColumn("r_ttr", rankBy(col("ttr")))
      .withColumn("r_cpt", rankBy(col("cpt")))
      .withColumn("rrf_e9",
        expr(s"1000000000 div (${kRrf}L + r_len)")
          + expr(s"1000000000 div (${kRrf}L + r_ttr)")
          + expr(s"1000000000 div (${kRrf}L + r_cpt)"))
      .withColumn("fused_rank",
        row_number().over(Window.partitionBy("lang")
          .orderBy(col("rrf_e9").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "lang", "r_len", "r_ttr", "r_cpt", "rrf_e9",
        "fused_rank")
  }

  /** Heuristic quality score per document: type-token ratio, stopword
    * ratio, length saturation — weighted into [0, 1]. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .withColumn("n_tokens", size(toks).cast("double"))
      .withColumn("n_unique", size(array_distinct(toks)).cast("double"))
      .withColumn("n_stop",
        size(array_intersect(toks, stopArr)).cast("double"))
      .withColumn("ttr", round(col("n_unique") / col("n_tokens"), 4))
      .withColumn("stop_hit_ratio",
        round(col("n_stop") / lit(stopwords.size.toDouble), 4))
      .withColumn("len_sat",
        round(least(col("n_tokens") / lit(100d), lit(1d)), 4))
      .withColumn("quality",
        round(lit(0.4) * col("ttr") + lit(0.3) * col("stop_hit_ratio")
          + lit(0.3) * col("len_sat"), 4))
      .select(
        col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_unique").cast("long").as("n_unique"),
        col("ttr"), col("stop_hit_ratio"), col("len_sat"), col("quality"))
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^ ]', 0)"))
        .cast("long").as("re_tokens"),
      round(col("n_chars").cast("double")
        / size(split(col("text"), " ")), 4).as("chars_per_token"))

  /** Content fingerprint: minimum hash32 over all character 5-grams
    * (the winnowing primitive), plus the distinct 5-gram count.
    *
    * Computed by the fused one-pass [[graft.expressions.GramFingerprint]]
    * expression; the equivalent composable form (two
    * `transform(sequence(...))` lambdas into `array_min` /
    * `array_distinct`) runs through interpreted HOF closures and was the
    * most expensive query in the round-1 bench. Bit-identity between the
    * two forms is pinned by ExpressionSpec. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) >= 5)
      .withColumn("g", graft.expressions.GramFingerprint.of(col("text"), 5))
      .select(
        col("doc_id"),
        col("g.fp").as("fp"),
        col("g.n_kgrams").as("n_kgrams"))

  /** Tokenize-and-chunk: split each document into token windows of
    * `maxTokens`, starting every `stride` tokens (stride < maxTokens
    * gives overlapping context windows — the standard LLM pre-training
    * chunking step). A generator (posexplode over the start sequence)
    * keeps the operation row-local: no shuffle, no driver state, chunk
    * count scales with corpus token count regardless of document skew.
    *
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text). */
  def chunkSplit(
      docs: DataFrame, maxTokens: Int = 50, stride: Int = 25): DataFrame = {
    require(maxTokens >= 1 && stride >= 1,
      s"invalid chunking: maxTokens=$maxTokens stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(expr(s"sequence(1, size(w), $stride)"))
          .as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("w"), col("start"), lit(maxTokens))).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("w"), col("start"), lit(maxTokens)))
          .as("chunk_text"))
  }

  /** Corpus token-length histogram: documents bucketed by whitespace
    * token count into fixed-width bins (last bin open-ended) — the
    * one-glance length profile a curation run reports before choosing
    * chunking/quality thresholds. One aggregate shuffle over ≤ nBuckets
    * groups.
    *
    * Output: (bucket, lo_tokens, n_docs). */
  def tokenHistogram(
      docs: DataFrame, bucketWidth: Int = 20, nBuckets: Int = 10): DataFrame = {
    require(bucketWidth >= 1 && nBuckets >= 1,
      s"invalid histogram: bucketWidth=$bucketWidth nBuckets=$nBuckets")
    docs
      .select(size(split(col("text"), " ")).as("n_tokens"))
      .select(least(expr(s"n_tokens div $bucketWidth"), lit(nBuckets - 1))
        .cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lo_tokens", (col("bucket") * bucketWidth).cast("long"))
      .select("bucket", "lo_tokens", "n_docs")
  }

  /** Per-document top-k TF-IDF terms: tf = in-doc term count,
    * idf = ln(N / df) over document frequency, score = tf * idf.
    *
    * Two aggregate shuffles (per-doc tf, corpus df) and a window ranked
    * within doc_id — per-window row count is bounded by a document's
    * distinct-term count, so the rank never concentrates into one task
    * the way a per-LANGUAGE window would. The corpus size N joins in as
    * a broadcast scalar, not a driver-side constant-folded literal, so
    * the plan is identical at any scale.
    *
    * Output: (doc_id, tok, tf, df, score, trank). */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(
      col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_corpus"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_corpus").cast("double") / col("df")), 4))
      .withColumn("trank", row_number().over(w).cast("long"))
      .filter(col("trank") <= k)
      .select("doc_id", "tok", "tf", "df", "score", "trank")
  }

  /** BM25 relevance ranking (Robertson/Spärck Jones; the Lucene
    * `(k1+1)`-scaled form with the `ln(1 + (N-df+0.5)/(df+0.5))`
    * non-negative idf): scores every document holding at least one
    * query term and returns the top `topK` hits — the serving-side IR
    * complement to [[tfIdfTopTerms]] (which describes documents;
    * BM25 ranks them against a query).
    *
    * Per-term contributions are pivoted into FIXED columns and added
    * in query-term order, so the floating-point sum has one
    * deterministic association — never a `sum()` whose accumulation
    * order varies by partitioning. Corpus stats (N, avgdl) and the
    * per-term df ride broadcasts; the only data-sized shuffles are the
    * per-doc tf/dl aggregates, both keyed on doc_id. The tf table is
    * pre-filtered to the query terms BEFORE aggregating, so the big
    * shuffle carries |query| counts per doc, not the vocabulary.
    *
    * Output: (doc_id, dl, score, rrank), rrank dense over
    * (score desc, doc_id) after e4 rounding — cross-engine stable. */
  def bm25Rank(
      docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    require(queryTerms.distinct == queryTerms,
      s"duplicate query terms would create ambiguous pivot columns: $queryTerms")
    val toks = docs.select(
      col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_corpus"),
      avg(col("dl").cast("double")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfx), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_corpus").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
    // pivot columns are named by term INDEX, not term text: a term
    // containing `.` or a backtick would break col() resolution, and
    // the name only has to carry the query-order position anyway
    val perTermCols = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("tok") === t, col("contrib"))).as(s"c_$i")
    }
    val pivoted = contrib.groupBy("doc_id", "dl")
      .agg(perTermCols.head, perTermCols.tail: _*)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    // global top-k via TakeOrderedAndProject (per-partition heaps, one
    // k-row driver merge) — the unpartitioned rank window then only
    // ever sees ≤ topK rows, never the full hit set
    val top = pivoted
      .withColumn("score", round(total, 4))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top
      .withColumn("rrank", row_number().over(w).cast("long"))
      .select("doc_id", "dl", "score", "rrank")
  }

  /** PMI collocation extraction (Church & Hanks '90): adjacent-bigram
    * pointwise mutual information over the corpus,
    * `pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) )` with bigram/unigram MLE
    * probabilities — the classic detector of multi-word units
    * ("new york", "prime minister") that single-token statistics
    * can't see; feeds phrase-aware tokenization and vocab builds.
    *
    * `minCount` floors the bigram count before scoring (raw PMI
    * over-rewards hapax pairs — the standard filter). The ratio is
    * computed in ONE double expression with fixed association
    * (`c_ab·T·T / (B·c_a·c_b)`), so both engines evaluate the same
    * IEEE operation sequence and the e4-rounded scores hash-match.
    *
    * Scale shape: unigram and bigram counts are partial+final
    * aggregates (combiners collapse the token stream map-side); the
    * two unigram joins are word-keyed equi-joins against the
    * SCORED (≥ minCount) bigram table — vocabulary-sized, never
    * corpus-sized; T and B ride 1-row broadcasts; top-k via
    * TakeOrderedAndProject.
    *
    * Output: (w1, w2, c_ab, pmi, crank), top `topK` by
    * (pmi desc, w1, w2). */
  def pmiCollocations(
      docs: DataFrame, minCount: Long = 5L, topK: Int = 30): DataFrame = {
    val toksArr = docs.select(split(col("text"), " ").as("w"))
    val uni = toksArr.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("t_tokens"))
    val big = toksArr.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      // INTENTIONAL cache-lifetime leak (same contract as the Sinks
      // write-once tables): the bigram counts feed both the lazy B
      // scalar and the scoring pass, and both execute only when the
      // CALLER consumes the returned frame — unpersisting here would
      // defeat the share, and this method has no post-consumption
      // hook. The entry is vocabulary-sized (bounded), and harness
      // runs (Bench/Verify) clear it via `spark.catalog.clearCache()`
      // between queries; a long-lived service should do the same after
      // consuming the result.
      .persist()
    val btot = big.agg(sum("c_ab").as("b_bigrams"))
    val scored = big.filter(col("c_ab") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(btot))
      .withColumn("pmi",
        round(log(
          (col("c_ab").cast("double") * col("t_tokens") * col("t_tokens"))
            / (col("b_bigrams").cast("double") * col("c_a") * col("c_b"))),
          4))
    val top = scored
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
    val w = Window.orderBy(col("pmi").desc, col("w1"), col("w2"))
    top.withColumn("crank", row_number().over(w).cast("long"))
      .select("w1", "w2", "c_ab", "pmi", "crank")
  }

  /** Repetition-based quality signal (the Gopher-rules family:
    * "fraction of duplicate n-grams"): for word n-grams of each size in
    * `sizes`, the duplicated fraction 1 − distinct/total per document.
    * A high duplicate-2gram fraction marks boilerplate/looping text —
    * one of the strongest cheap pre-training quality filters.
    *
    * Entirely row-local: n-gram arrays are built by a
    * `transform(sequence(...))` lambda and never leave their row, so
    * the operator is a pure projection — no shuffle, no generator
    * explosion, cost linear in corpus tokens regardless of skew.
    *
    * Output: (doc_id, n_tokens, dup2_frac, dup3_frac, repetitive) with
    * `repetitive` = dup2_frac > threshold. Documents shorter than n
    * tokens have no n-grams ⇒ fraction 0. */
  def repetitionScore(docs: DataFrame, threshold: Double = 0.2): DataFrame = {
    // materialize the token array ONCE: higher-order-function lambdas
    // are interpreted (not codegen'd) and get no subexpression
    // elimination, so an inlined split(text) re-tokenizes the document
    // for every gram position — O(tokens²) per doc (measured 23 s for
    // the declared query at sf0.1; this form runs it in ~1 s). Grams
    // via slice+concat_ws for the same reason as [[Dedup.shingleExpr]]:
    // ArrayData slicing is a cheap copy, repeated element_at is not.
    def dupFrac(n: Int): Column = {
      val grams = expr(
        s"transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n)))")
      when(size(col("w")) < n, lit(0d))
        .otherwise(round(
          lit(1d) - size(array_distinct(grams)).cast("double")
            / size(grams), 4))
    }
    // fanOut: the gram transform + array_distinct per row is a heavy
    // row-local pass on the scan's few splits (jobtrace: two ~0.9 s
    // single-task jobs — the range-sort sample pass and the main pass
    // each ran it serially); no-op at scale (see [[Lineage.fanOut]])
    Lineage.fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        dupFrac(2).as("dup2_frac"),
        dupFrac(3).as("dup3_frac"))
      .withColumn("repetitive", col("dup2_frac") > threshold)
  }

  /** Count-min-sketch heavy hitters (Cormode & Muthukrishnan '05): a
    * depth × width counter grid over the token stream, each row keyed
    * by an independent member of the portable hash32 family, plus the
    * sketch ESTIMATE (min over rows) for the exact top-`topK` tokens.
    *
    * Because the hash family is engine-portable md5 ([[Hashing]]), the
    * whole sketch — not a bounded check, the exact counter values — is
    * re-derivable by the DuckDB oracle: a rare property for a sketch
    * operator, and the reason this one is exactly verified while
    * HLL/approx-percentile get tolerance oracles.
    *
    * Scale shape: counters are one partial+final aggregate over
    * depth × width ≤ a few thousand groups — combiners collapse the
    * token stream map-side, so the shuffle carries grid cells, not
    * tokens. The top-K side is the [[buildVocab]] TakeOrdered path, and
    * the probe join broadcasts the (tiny) counter grid.
    *
    * Output: (tok, exact_cnt, cms_est, overcount) — `cms_est ≥
    * exact_cnt` always (CMS never underestimates; collisions only add).
    */
  def heavyHittersCms(
      docs: DataFrame,
      depth: Int = 4,
      width: Int = 64,
      topK: Int = 10): DataFrame = {
    require(depth >= 1 && width >= 1 && topK >= 1,
      s"invalid CMS: depth=$depth width=$width topK=$topK")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    def buckets = (0 until depth).map { i =>
      struct(lit(i).as("row"),
        (Hashing.hash32(col("tok"), i) % width).cast("int").as("bucket"))
    }
    val counters = toks
      .select(explode(array(buckets: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(desc("exact_cnt"), asc("tok")).limit(topK)
    top
      .select(col("tok"), col("exact_cnt"),
        explode(array(buckets: _*)).as("rb"))
      .select(col("tok"), col("exact_cnt"),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("row", "bucket"))
      .groupBy("tok")
      .agg(first(col("exact_cnt")).as("exact_cnt"),
        min(col("cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_cnt"))
  }

  /** Tokenizer-vocabulary preparation: the top `vocabSize` corpus tokens
    * by frequency (ties: token asc) behind a fixed block of special
    * tokens, each with a dense contiguous id — the table a tokenizer
    * training run (or an id-mapping encode pass) consumes.
    *
    * Scale shape: one groupBy(token) count shuffle, then the top-N comes
    * out through `orderBy(...).limit(N)` — Spark plans that as
    * TakeOrderedAndProject (per-partition N-row heaps merged once), NOT
    * a global sort. The final row_number window runs over the N-row
    * frame only, never the corpus.
    *
    * Output: (token_id, tok, cnt, is_special) with special ids first. */
  def buildVocab(
      docs: DataFrame,
      vocabSize: Int = 50,
      specials: Seq[String] = Seq("<pad>", "<unk>", "<bos>", "<eos>"))
      : DataFrame = {
    require(vocabSize >= 1, s"invalid vocabSize=$vocabSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok")).limit(vocabSize)
      .select(col("tok"), col("cnt"), lit(false).as("is_special"))
    val specialRows = specials.zipWithIndex
      .map { case (t, _) => (t, 0L, true) }
      .toDF("tok", "cnt", "is_special")
    // ids: specials in declaration order, then corpus tokens by rank.
    // The window is over vocabSize + |specials| rows — bounded by
    // construction, same defense as the unigram-LM vocab.
    val w = Window.orderBy(
      col("is_special").desc, col("cnt").desc, col("tok"))
    specialRows.unionByName(counts)
      .withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select("token_id", "tok", "cnt", "is_special")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03
    * "local algorithms for document fingerprinting", the MOSS scheme):
    * hash every word k-gram, slide a window of `w` consecutive gram
    * hashes, record the minimum of each window (rightmost position on
    * ties, per the paper), dedup the selections. Guarantees any shared
    * run of ≥ w+k-1 tokens between two documents shares a fingerprint —
    * the robust version of the single-min content fingerprint
    * ([[fingerprints]]).
    *
    * Entirely row-local: gram hashes and window minima are
    * higher-order-function lambdas over the token array; no shuffle, no
    * generator blow-up before the final explode of the (small) selected
    * set. The rightmost-tie-break is packed into one integer key —
    * key = h·2²⁰ + (2²⁰−1−p) — so a single `array_min` resolves both
    * the hash minimum and the positional tie; positions must fit 20
    * bits (docs beyond 2²⁰ tokens are not supported — enforce upstream
    * chunking first).
    *
    * The gram-hash array is bound as a LAMBDA VARIABLE (`transform`
    * over a one-element array) rather than an intermediate column:
    * `InferFiltersFromGenerate` copies the generator's input expression
    * into a pushed-down `size(..) > 0` filter, and with the hash array
    * as a column reference that copy inlines it into every window's
    * `slice` — O(grams × windows) md5 evaluations per document
    * (measured 210 s at sf0.1; this form runs in ~2 s). Inside the
    * lambda the windows reference `ks`, which CANNOT be substituted, so
    * the inferred filter costs one extra hash pass per row, not a
    * quadratic one.
    *
    * Output: (doc_id, fp, pos) — fingerprint hash + 0-based gram
    * position of each selection. */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"invalid winnowing: k=$k w=$w")
    val gramHash = Hashing.hash32Sql(s"concat_ws(' ', slice(wd, i, $k))")
    val keysExpr =
      s"transform(sequence(1, size(wd) - ${k - 1}), " +
        s"i -> $gramHash * ${1L << 20}L + (${(1L << 20) - 1}L - (i - 1)))"
    val fpsExpr =
      s"element_at(transform(array($keysExpr), ks -> " +
        s"array_distinct(transform(sequence(1, size(ks) - ${w - 1}), " +
        s"q -> array_min(slice(ks, q, $w))))), 1)"
    docs
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
      // docs too short for one full window contribute nothing (the
      // paper's guarantee window is w + k - 1 tokens)
      .filter(size(col("wd")) >= k + w - 1)
      .select(col("doc_id"), explode(expr(fpsExpr)).as("key"))
      .select(
        col("doc_id"),
        expr(s"key div ${1L << 20}").as("fp"),
        (lit((1L << 20) - 1) - pmod(col("key"), lit(1L << 20))).as("pos"))
  }

  /** Token-id encoding against a [[buildVocab]] vocabulary — the encode
    * pass that turns curated text into model-ready id sequences.
    * Out-of-vocabulary tokens map to the `<unk>` id and are counted.
    *
    * The emitted per-document columns are exact integer checksums of
    * the id sequence (plain sum and position-weighted sum — the
    * [[SimilaritySearch.quantizeInt8]] trick), which pin every id at
    * every position cross-engine without comparing array columns.
    *
    * Scale shape: the vocabulary (vocabSize + specials rows) broadcasts
    * onto the exploded token stream; one groupBy(doc_id) finishes. The
    * corpus never shuffles on token.
    *
    * Output: (doc_id, n_tokens, n_oov, ids_sum, ids_dot). */
  def encodeIds(docs: DataFrame, vocabSize: Int = 20): DataFrame =
    encodeIdsWith(docs, buildVocab(docs, vocabSize))

  /** [[encodeIds]] against an externally built vocabulary frame
    * (token_id, tok, cnt, is_special) — the composed-pipeline entry
    * point, where one vocab build is shared across passes. */
  def encodeIdsWith(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val unk = vocab.filter(col("tok") === "<unk>")
      .select(col("token_id").as("unk_id"))
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select("tok", "token_id")), Seq("tok"), "left")
      .crossJoin(broadcast(unk))
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), col("unk_id")).as("id"),
        col("token_id").isNull.as("is_oov"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("is_oov"), 1L).otherwise(0L)).as("n_oov"),
        sum(col("id")).as("ids_sum"),
        sum(col("id") * (col("pos") + 1)).as("ids_dot"))
  }

  /** Multinomial naive-Bayes language classifier, trained from the
    * corpus's own labels — the cheap stand-in for the fastText-style
    * classifiers production pipelines run for language/quality routing
    * (same scoring shape; swapping in external (tok, lang, weight)
    * rows is the same broadcast join).
    *
    * Train: add-1-smoothed token likelihoods per language,
    * logp(tok|l) = log10((c_lt + 1) / (t_l + V)) with V = corpus
    * distinct-token count; OOV floor log10(1 / (t_l + V)); priors
    * log10(n_l / N). Score: per-token log-probs quantized to 1e-4
    * fixed-point BIGINTs before summation (exact, order-free — the
    * [[unigramLmScore]] defense), argmax over the full language grid
    * (ties: lang asc).
    *
    * Scale shape: one groupBy(lang, tok) training shuffle; the model
    * (langs × vocab rows) broadcasts onto the exploded token stream —
    * past broadcast memory bounds the same join runs as a shuffle join
    * on tok; one groupBy(doc_id, lang) and a |langs|-bounded per-doc
    * window finish.
    *
    * Output: (doc_id, actual_lang, pred_lang, score_e4, match). */
  def nbClassify(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("lang").as("plang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val vsize = toks.select("tok").distinct().agg(count(lit(1)).as("v"))
    val langStats = docs.groupBy(col("lang").as("plang"))
      .agg(count(lit(1)).as("n_l"))
      .join(counts.groupBy("plang").agg(sum(col("c")).as("t_l")), "plang")
    val nTotal = docs.agg(count(lit(1)).as("n_corpus"))
    val langs = langStats
      .crossJoin(broadcast(vsize)).crossJoin(broadcast(nTotal))
      .select(
        col("plang"),
        round(log(10.0, col("n_l").cast("double") / col("n_corpus")) * 10000)
          .cast("long").as("prior_e4"),
        round(log(10.0, lit(1.0) / (col("t_l") + col("v"))) * 10000)
          .cast("long").as("floor_e4"))
    val model = counts
      .join(langStats.select("plang", "t_l"), "plang")
      .crossJoin(broadcast(vsize))
      .select(col("tok"), col("plang"),
        round(log(10.0,
          (col("c") + 1).cast("double") / (col("t_l") + col("v"))) * 10000)
          .cast("long").as("logp_e4"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_e4").desc, col("plang"))
    toks
      .crossJoin(broadcast(langs))
      .join(broadcast(model), Seq("tok", "plang"), "left")
      .select(col("doc_id"), col("lang"), col("plang"), col("prior_e4"),
        coalesce(col("logp_e4"), col("floor_e4")).as("tok_e4"))
      .groupBy("doc_id", "plang")
      .agg(
        first(col("lang")).as("actual_lang"),
        (first(col("prior_e4")) + sum(col("tok_e4"))).as("score_e4"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(
        col("doc_id"), col("actual_lang"),
        col("plang").as("pred_lang"), col("score_e4"),
        (col("plang") === col("actual_lang")).as("match"))
  }

  /** Boilerplate stripping (the CCNet/C4 "remove text duplicated across
    * many pages" pass, at token-span granularity): any word n-gram
    * occurring in ≥ `minDocs` distinct documents is boilerplate; every
    * token position covered by a boilerplate gram is removed and the
    * remaining tokens are re-joined.
    *
    * Scale shape: the gram stream shuffles twice on gram (document
    * frequency, then the semi-join back onto positions) and once on
    * doc_id to assemble covered-position sets — never docs². The
    * covered set per document is bounded by the document's own token
    * count, so the `collect_set` is row-bounded, not corpus-bounded.
    * Documents shorter than n tokens take the left-join null path and
    * pass through untouched.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text). */
  def boilerplateStrip(
      docs: DataFrame, n: Int = 3, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2, s"invalid strip: n=$n minDocs=$minDocs")
    // fanOut: the positional gram explode below is a heavy row-local
    // pass on the scan's few splits, and it feeds two consumers (the
    // df aggregate and the coverage join), each of which re-runs it
    // serially without this (jobtrace: several 0.3-0.7 s single-task
    // jobs); no-op at scale (see [[Lineage.fanOut]])
    val toks = Lineage.fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
    val gramPos = toks
      .filter(size(col("wd")) >= n)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, size(wd) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(wd, i, $n)))"))
          .as(Seq("p0", "gram")))
    val hot = gramPos
      .select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("gram")
    val covered = gramPos.join(hot, "gram")
      // gram at 0-based index p0 covers 1-based token positions
      // p0+1 .. p0+n
      .select(col("doc_id"),
        explode(expr(s"sequence(p0 + 1, p0 + $n)")).as("cp"))
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("cp"))).as("cov"))
    toks.join(covered, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("wd")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
        expr("concat_ws(' ', filter(wd, (t, i) -> " +
          "cov IS NULL OR NOT array_contains(cov, i + 1)))")
          .as("clean_text"))
  }

  /** Per-source dataset card: the summary block a corpus release ships
    * (docs, chars, language mix, Shannon entropy of the language
    * distribution). Two aggregate shuffles — (source, lang) counts,
    * then per-source rollup — grouping cardinality bounded by
    * |sources| × |langs|, so the plan is flat at any corpus size.
    *
    * Entropy H = Σ_l (c_l/t)·log2(t/c_l) is computed from exact integer
    * counts with each language's term quantized to a 1e-6 fixed-point
    * BIGINT before the cross-language sum — partition/merge order can't
    * change the result (same defense as [[unigramLmScore]]); the final
    * two divisions are IEEE-deterministic, so the double is
    * bit-identical cross-engine unrounded.
    *
    * Output: (source, n_docs, n_chars_total, n_langs, top_lang,
    * lang_entropy). */
  def dataCard(docs: DataFrame): DataFrame = {
    val sl = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    val totals = sl.groupBy("source")
      .agg(sum(col("cnt")).as("t"), sum(col("chars")).as("n_chars_total"))
    sl.join(totals, "source")
      .withColumn("term_e6",
        round(col("cnt").cast("double")
          * log(2.0, col("t").cast("double") / col("cnt")) * 1000000)
          .cast("long"))
      .groupBy("source")
      .agg(
        sum(col("cnt")).as("n_docs"),
        first(col("n_chars_total")).as("n_chars_total"),
        count(lit(1)).as("n_langs"),
        // top language by doc count, ties to the lexicographically
        // smallest lang: min of (-cnt, lang) sorts cnt desc, lang asc
        min(struct((-col("cnt")).as("neg"), col("lang"))).getField("lang")
          .as("top_lang"),
        (sum(col("term_e6")).cast("double") / 1000000d
          / first(col("t")).cast("double")).as("lang_entropy"))
      .select("source", "n_docs", "n_chars_total", "n_langs",
        "top_lang", "lang_entropy")
  }

  /** Pattern redaction (the PII-scrub shape): replace email-like and
    * phone-like substrings with typed placeholder tokens, counting the
    * hits per document. Pure codegen'd regex projections — row-local,
    * shuffle-free, the plan a 100 TB scrub pass wants.
    *
    * The testdata corpus is synthetic word soup with no natural PII, so
    * the declared query injects deterministic patterns first
    * (TierX `x_redact_pii`) — the operator itself is
    * injection-agnostic. */
  def redact(docs: DataFrame): DataFrame = {
    // character-class dot, not backslash-escape: the pattern passes
    // through a SQL string literal (expr), where a lone backslash would
    // be eaten by literal parsing — [.] is parse-mode-proof and means
    // the same thing in Spark and DuckDB
    val emailRe = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val phoneRe = "555-[0-9]{4}"
    docs.select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$emailRe', 0)"))
        .cast("long").as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$phoneRe', 0)"))
        .cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("clean_text"))
  }

  /** Inverted index build — the retrieval-prep step (BM25 serving,
    * RAG corpora, contamination lookups): term → document-frequency +
    * a CAPPED sorted posting list.
    *
    * The cap is the scale contract: a stopword's postings are the whole
    * corpus, so an uncapped `collect_list` is a driver-sized-array
    * hazard at 100 TB. The cap applies through the same two-phase
    * top-N as [[Curation.quotaCap]] — a per-(term, input-partition)
    * window prunes to ≤ maxPostings rows per partition BEFORE the
    * global per-term rank, so the final window never sorts more than
    * maxPostings × partitions rows per term no matter how hot the
    * term. `df` counts the UNCAPPED posting set via an ordinary
    * partial+final aggregate (combiner-safe under skew).
    *
    * Postings serialize as a comma-joined string — engine-portable,
    * and the at-scale shape too (posting lists ship as packed bytes,
    * not engine arrays). Output: (term, df, postings). */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 16): DataFrame = {
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val dfCounts = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val local = Window.partitionBy(col("term"), spark_partition_id())
      .orderBy("doc_id")
    val global = Window.partitionBy("term").orderBy("doc_id")
    postings
      .withColumn("r0", row_number().over(local))
      .filter(col("r0") <= maxPostings)
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= maxPostings)
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("plist"))
      .join(dfCounts, "term")
      .select(col("term"), col("df"),
        array_join(col("plist"), ",").as("postings"))
  }
}
