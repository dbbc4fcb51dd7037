package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, SimilaritySearch, TextAnalysis}

/** Tier X operator specs: semantics on crafted inputs + invariants on
  * the corpus. */
class TierXSpec extends SparkSpec {
  import spark.implicits._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val crafted = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (1L, "the quick brown fox jumps over the lazy cat", "en", "s", 43L), // near-dup of 0
    (2L, "completely different words in this document here now", "en", "s", 52L),
    (3L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L)  // exact dup of 0
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup collapses identical docs and keeps min id") {
    val res = Dedup.exact(crafted).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(res(0L) == 2)              // docs 0 and 3 collapse onto id 0
    assert(res.keySet == Set(0L, 1L, 2L))
    // corpus: no exact dups, so result row count == doc count
    assert(q("x_dedup_exact").count() ==
      Tables(spark, sf, "documents").count())
  }

  test("shingle-Jaccard near-dup finds the crafted pair, not the outlier") {
    val pairs = Dedup.nearDupJaccard(crafted, k = 3, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash-LSH achieves full recall on the corpus' planted near-dups") {
    val exact = q("x_dedup_near").select("d1", "d2").collect().toSet
    val lsh = q("x_dedup_minhash").select("d1", "d2").collect().toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size} pairs")
  }

  test("pairsWithinAndAgainstIndex == nearDupMinHash(batch) union " +
    "crossDupAgainstIndex(batch, idx)") {
    // the fused form the incremental cluster gate uses (one shingling
    // and banding per batch) must be value-identical to the two
    // independent derivations it replaced — banding is a pure function
    // of the shingle sets, so this pins the composition contract
    val dd = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val batch = dd.filter(col("doc_id") % 3 === 0)
    val corpus = dd.filter(col("doc_id") % 3 =!= 0)
    val (idxSh, idxBands) = Dedup.contaminationIndex(corpus)
    val sh = Dedup.shingles(batch).localCheckpoint()
    val bands = Dedup.bandsFromShingles(sh).localCheckpoint()
    val fused = Dedup.pairsWithinAndAgainstIndex(sh, bands, idxSh, idxBands)
      .select("d1", "d2")
    val separate = Dedup.nearDupMinHash(batch).select("d1", "d2")
      .unionByName(
        Dedup.crossDupAgainstIndex(batch, idxSh, idxBands).select("d1", "d2"))
    assert(fused.count() > 0, "no pairs at this SF — composition unexercised")
    assert(fused.exceptAll(separate).count() == 0 &&
      separate.exceptAll(fused).count() == 0,
      "fused pair derivation diverges from the two-call composition")
  }

  test("simhash distance 0 for exact dup, small for near-dup") {
    val hs = Dedup.simHashes(crafted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(0L) == hs(3L))
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(1L)) <= 8)
  }

  test("simhash multi-block blocking: exact recall vs all-pairs ground truth") {
    val docs = Tables(spark, sf, "documents")
    val hs = Dedup.simHashes(docs).cache()
    val a = hs.select(col("doc_id").as("d1"), col("simhash").as("s1"))
    val b = hs.select(col("doc_id").as("d2"), col("simhash").as("s2"))
    val brute = a.crossJoin(b).filter(col("d1") < col("d2"))
      .filter(expr("bit_count(s1 ^ s2)") <= 6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simHash(docs, maxHamming = 6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"blocking missed ${(brute -- blocked).size}, invented ${(blocked -- brute).size}")
    // the round-1 single-block miss class (fingerprints differing in an
    // upper-16 bit) must be present in the data AND caught by the blocking
    val byId = hs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blocked.exists { case (x, y) => (byId(x) >> 16) != (byId(y) >> 16) })
  }

  test("banded embedding near-dup: no cartesian in the plan") {
    // the round-1 scale-killer: all-pairs crossJoin. The banded form
    // must get its candidates from an equi-join on (band, key) only.
    val plan = q("x_dedup_embed").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in plan")
  }

  test("banded embedding near-dup: exact precision, full recall at this scale") {
    import graft.operators.SimilaritySearch
    val vecs = Tables(spark, sf, "embeddings")
    val exact = SimilaritySearch.cosinePairsExact(vecs, 0.4)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilaritySearch.cosinePairsLsh(vecs, 0.4)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision
    // measured: 16 bits / 8 bands of 2 catches all 66 pairs at sf0.001
    assert(lsh == exact, s"banding missed ${(exact -- lsh).size} of ${exact.size}")
  }

  test("brute top-k: k rows per query, cosine within [-1,1], self excluded") {
    val rows = q("x_sim_topk").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0001))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("lsh top-k results come from the query's Hamming<=1 bucket neighborhood") {
    import graft.operators.SimilaritySearch
    val df = q("x_sim_ann_lsh")
    assert(df.count() > 0)
    val own = SimilaritySearch.lshBuckets(Tables(spark, sf, "embeddings"), 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    df.collect().foreach { r =>
      val qb = own(r.getLong(0))
      val rb = r.getString(2)
      val hamming = qb.zip(rb).count { case (a, b) => a != b }
      assert(hamming <= 1, s"result bucket $rb vs query bucket $qb")
    }
  }

  test("multi-probe lsh recall@5 beats (or ties) the single-bucket form") {
    import graft.operators.SimilaritySearch
    val vecs = Tables(spark, sf, "embeddings")
    val truth = SimilaritySearch.bruteTopK(vecs, nQueries = 5, k = 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(probeHamming: Int): Int =
      SimilaritySearch
        .lshTopK(vecs, nQueries = 5, k = 5, nProbes = 4, probeHamming = probeHamming)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(truth).size
    val single = recall(0)
    val multi = recall(1)
    assert(multi >= single, s"multi-probe recall $multi < single-bucket $single")
    assert(multi > 0)
  }

  test("ivf: every vector lands in exactly one cell; probes bound recall") {
    val vecs = Tables(spark, sf, "embeddings")
    val cells = SimilaritySearch.ivfCells(vecs, nCentroids = 8)
    assert(cells.count() == vecs.count())
    assert(cells.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    assert(cells.select("cell").distinct().count() <= 8)
    val ivf = q("x_sim_ivf")
    assert(ivf.count() == 25) // 5 queries × k=5
    // IVF hits must carry the same cosine the exact method computes
    val brute = SimilaritySearch.bruteTopK(vecs, nQueries = 5, k = 1000000)
      .select("q_id", "vec_id", "cos")
    assert(ivf.select("q_id", "vec_id", "cos").except(brute).count() == 0)
  }

  test("ivf refresh: segment union equals a full re-assign on frozen centroids") {
    val vecs = Tables(spark, sf, "embeddings")
    val refreshed = q("x_sim_ivf_refresh").persist()
    // complete and disjoint: every vector exactly once
    assert(refreshed.count() == vecs.count())
    assert(refreshed.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    // src labels follow the declared split
    assert(refreshed.filter(col("src") === "delta")
      .filter(col("vec_id") % 5 =!= 4).count() == 0)
    assert(refreshed.filter(col("src") === "base")
      .filter(col("vec_id") % 5 === 4).count() == 0)
    // the streamed path is row-identical to the batch core on the same
    // frozen quantizer (base-trained): nothing lost, nothing disturbed
    val base = vecs.filter(col("vec_id") % 5 =!= 4)
    val delta = vecs.filter(col("vec_id") % 5 === 4)
    val batch = SimilaritySearch.ivfRefreshAssign(base, Seq(delta))
    assert(refreshed.select("vec_id", "cell", "src")
      .exceptAll(batch).count() == 0)
    assert(batch.exceptAll(refreshed.select("vec_id", "cell", "src"))
      .count() == 0)
    refreshed.unpersist()
  }

  test("trained-IVF: exhaustive probing is exact; recall grows with probes") {
    import graft.operators.SimilaritySearch
    val vecs = Tables(spark, sf, "embeddings")
    val truth = SimilaritySearch.bruteTopK(vecs, nQueries = 5, k = 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = SimilaritySearch
        .ivfTopK(vecs, nQueries = 5, k = 5, nCentroids = 8, nProbe = nProbe)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(truth).size.toDouble / truth.size
    }
    // probing every cell searches the whole corpus: recall must be 1.0
    // (tie order matches brute: both rank on raw cosine desc, vec_id) —
    // a seed-independent exactness invariant, unlike a recall floor
    // tuned to one centroid placement
    assert(recallAt(8) == 1.0)
    // recall is monotone in probes, and 2-of-8 trained cells must beat
    // blind 25% corpus coverage on clustered data (measured 0.44 at
    // sf0.001 with the hash-sampled seed)
    val r2 = recallAt(2)
    val r4 = recallAt(4)
    assert(r2 >= 0.3, s"recall@5, 2 probes = $r2")
    assert(r4 >= r2, s"recall not monotone: 4 probes $r4 < 2 probes $r2")
  }

  test("ivf+pq: candidates come only from probed cells; ADC scores match the unpruned search") {
    val vecs = Tables(spark, sf, "embeddings")
    val res = q("x_sim_ivf_pq").collect()
    assert(res.nonEmpty)
    assert(q("x_sim_ivf_pq").columns.toSeq ==
      Seq("q_id", "vec_id", "cell", "srank", "adc_e6"))
    // per-query srank is consecutive from 1 and adc_e6 is non-increasing
    res.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rs.length).toSeq,
        s"query $qid ranks not consecutive")
      val scores = sorted.map(_.getLong(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $qid adc_e6 not non-increasing")
    }
    // every candidate's reported cell is that vector's true IVF cell —
    // the pruning really was cell-membership, not an arbitrary filter
    val cells = SimilaritySearch.ivfCells(vecs, nCentroids = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    res.foreach(r => assert(cells(r.getLong(1)) == r.getInt(2),
      s"vec ${r.getLong(1)} reported cell ${r.getInt(2)} != true cell"))
    // scoring identity: where the pruned and unpruned ADC searches
    // return the same (q, vec), the exact-e6 score must be EQUAL (same
    // codebooks, same LUTs — pruning changes candidates, never scores)
    val unpruned = SimilaritySearch
      .pqTopK(vecs, nQueries = 5, k = 5, m = 2, codebookSize = 16, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val overlap = res.filter(r => unpruned.contains((r.getLong(0), r.getLong(1))))
    assert(overlap.nonEmpty, "pruned and unpruned searches share no hits")
    overlap.foreach(r =>
      assert(unpruned((r.getLong(0), r.getLong(1))) == r.getLong(4)))
  }

  test("rrf quality fusion: integer fusion replays from the ranks") {
    val rows = q("x_quality_rrf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val n = rs.length.toLong
      // each signal's rank column is a permutation of 1..n in-lang
      Seq(2, 3, 4).foreach { i =>
        assert(rs.map(_.getLong(i)).sorted.toSeq == (1L to n).toSeq)
      }
      // rrf_e9 is exactly the integer formula over the three ranks
      rs.foreach { r =>
        val e = Seq(2, 3, 4).map(i => 1000000000L / (60L + r.getLong(i))).sum
        assert(r.getLong(5) == e, s"rrf mismatch for doc ${r.getLong(0)}")
      }
      // fused_rank orders by (rrf_e9 desc, doc_id)
      val expectedOrder = rs.sortBy(r => (-r.getLong(5), r.getLong(0)))
        .map(_.getLong(0)).toSeq
      assert(rs.sortBy(_.getLong(6)).map(_.getLong(0)).toSeq == expectedOrder)
    }
  }

  test("mmr rerank: exact match with a driver-side greedy replay") {
    import spark.implicits._
    // deterministic small corpus, dim 4, no zero vectors
    val vecs = (0L until 12L).map { id =>
      (id, (0 until 4).map(i =>
        (((id * 7 + i * 3) % 11).toInt - 5 + (if (i == 0) 7 else 0))
          .toFloat))
    }.toDF("vec_id", "embedding")
    val out = graft.operators.SimilaritySearch
      .mmrRerank(vecs, nQueries = 2, nCand = 8, k = 4)
      .orderBy("q_id", "sel_rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // driver replay with the SAME arithmetic: left-to-right double
    // accumulation over float elements, HALF_UP e6 rounding
    val raw = (0L until 12L).map { id =>
      id -> (0 until 4).map(i =>
        (((id * 7 + i * 3) % 11).toInt - 5 + (if (i == 0) 7 else 0))
          .toFloat).toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cosE6(a: Array[Float], b: Array[Float]): Long =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
          * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = (0L until 2L).flatMap { q =>
      val pool = (0L until 12L).filter(_ != q)
        .map(c => (c, dot(raw(c), raw(q))
          / (math.sqrt(dot(raw(c), raw(c))) * math.sqrt(dot(raw(q), raw(q))))))
        .sortBy { case (c, cos) => (-cos, c) }
        .take(8).map(_._1)
      val rel = pool.map(c => c -> cosE6(raw(c), raw(q))).toMap
      var selected = Vector.empty[(Long, Long, Long, Long, Long)]
      for (step <- 1 to 4) {
        val remaining = pool.filterNot(c => selected.exists(_._3 == c))
        val scored = remaining.map { c =>
          val pen = if (selected.isEmpty) 0L
            else selected.map(s => cosE6(raw(c), raw(s._3))).max
          (c, rel(c), if (step == 1) rel(c) else rel(c) - pen)
        }
        val (c, r6, s6) = scored.minBy { case (c, _, s) => (-s, c) }
        selected :+= ((q, step.toLong, c, r6, s6))
      }
      selected
    }
    assert(out.toSeq == expected,
      s"mmr mismatch:\n got ${out.toSeq}\n exp $expected")
    // structural invariants: distinct picks, first pick = top relevance
    assert(out.map(t => (t._1, t._3)).distinct.length == out.length)
  }

  test("mmr greedy: pool smaller than k stops cleanly, exhausting the pool") {
    // 3 corpus vectors beyond the 1 query => pool of 3 < k = 5: the
    // row-local greedy must emit exactly the pool (ranks 1..3), not
    // loop or duplicate — the old step-chain's empty-step semantics
    val tiny = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = SimilaritySearch
      .mmrRerank(tiny, nQueries = 1, nCand = 5, k = 5).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(2)).distinct.length == 3)
  }

  test("crossCosineLsh: empty eval side yields empty output; disjoint-id contract") {
    val vecs = Tables(spark, sf, "embeddings")
    val empty = vecs.filter(col("vec_id") < 0)
    assert(SimilaritySearch
      .crossCosineLsh(vecs, empty, threshold = 0.4).count() == 0)
    // cross pairs: train ids never appear as eval ids and vice versa
    val cross = q("x_contamination_embed")
    assert(cross.filter(col("train_id") % 10 === 0).count() == 0)
    assert(cross.filter(col("eval_id") % 10 =!= 0).count() == 0)
    // self-pairs are impossible by id disjointness
    assert(cross.filter(col("train_id") === col("eval_id")).count() == 0)
  }

  test("mmr serving: picks come from the IVF+PQ pool, first pick is pure relevance") {
    val vecs = Tables(spark, sf, "embeddings")
    val df = q("x_mmr_serving")
    assert(df.columns.toSeq ==
      Seq("q_id", "sel_rank", "vec_id", "rel_e6", "score_e6"))
    val out = df.collect()
    assert(out.nonEmpty)
    // every pick must be a member of the serving index's top-20 pool —
    // the composition really selects from IVF+PQ candidates, not from
    // a corpus rescan (bit-exactness vs the unrolled CTE chain is the
    // oracle's job; this pins the structural contract)
    val pool = graft.operators.SimilaritySearch
      .ivfPqTopK(vecs, nQueries = 5, k = 20, nCentroids = 8, nProbe = 2,
        m = 2, codebookSize = 16, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach(r => assert(pool((r.getLong(0), r.getLong(2))),
      s"pick ${r.getLong(2)} for query ${r.getLong(0)} not in the pool"))
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L).toSeq,
        s"query $qid sel_ranks not 1..5")
      assert(rs.map(_.getLong(2)).distinct.length == rs.length,
        s"query $qid picked a vector twice")
      // step 1 has an empty selected set: zero penalty, score == rel
      val first = rs.minBy(_.getLong(1))
      assert(first.getLong(3) == first.getLong(4),
        s"query $qid first pick score != rel")
    }
  }

  test("ann recall curve: cost and recall are monotone in nProbe") {
    val rows = q("x_ann_recall_curve").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val cands = rows.map(_.getLong(1))
    val hits = rows.map(_.getLong(2))
    val recall = rows.map(_.getDouble(3))
    // more probed cells can only add candidates, and the ADC top-k over
    // a candidate SUPERSET can only gain or keep exact-truth hits at
    // the margin where true neighbors enter the probed cells — assert
    // both axes monotone (equal allowed: extra cells may hold no
    // neighbors)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidate cost not monotone: ${cands.toSeq}")
    assert(recall.zip(recall.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"recall not monotone: ${recall.toSeq}")
    // recall is hits / (5 queries * k=5), bounded by construction
    rows.foreach { r =>
      assert(r.getLong(2) <= 25 && r.getDouble(3) >= 0 &&
        r.getDouble(3) <= 1.0)
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 25.0) < 1e-9)
    }
    val _ = hits
  }

  test("inverted index: df counts the full posting set, lists cap at maxPostings") {
    val docs = Seq(
      (0L, "alpha beta", "en", "s", 10L),
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, "alpha", "en", "s", 5L),
      (3L, "alpha delta", "en", "s", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val idx = TextAnalysis.invertedIndex(docs, maxPostings = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // alpha appears in all 4 docs: df counts all, postings cap at the
    // 2 lowest doc_ids
    assert(idx("alpha") == (4L, "0,1"))
    assert(idx("beta") == (2L, "0,1"))
    assert(idx("gamma") == (1L, "1"))
    assert(idx("delta") == (1L, "3"))
  }

  test("negative sampling: deterministic, self-free, in-corpus draws") {
    val dd = Tables(spark, sf, "documents")
    val a = q("x_negative_sample").collect()
    val b = q("x_negative_sample").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // pure hash fate
    assert(a.nonEmpty)
    val ids = dd.select("doc_id").collect().map(_.getLong(0)).toSet
    a.foreach { r =>
      assert(r.getLong(0) != r.getLong(2), "self-draw survived")
      assert(ids.contains(r.getLong(2)), "negative outside the corpus")
      assert(r.getInt(1) >= 0 && r.getInt(1) < 4)
    }
    // expected loss to dropped self-draws is tiny: ≥ k·N − N rows kept
    assert(a.length >= ids.size * 4 - ids.size)
  }

  test("audio energy: exact PCM frame energies recovered from the RIFF data chunk") {
    import graft.operators.Multimodal
    // doc_id 1 → the WAV branch (channels 2, block 4): data = the 8
    // ASCII bytes of the text, 4 int16 samples, 2 frames at size 2
    val doc = Seq((1L, "abcdefgh", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.audioEnergy(spark, doc, frameSize = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 2)
    def s(lo: Char, hi: Char): Long = lo.toInt + 256L * hi.toInt
    assert(frames(0).energy ==
      s('a', 'b') * s('a', 'b') + s('c', 'd') * s('c', 'd'))
    assert(frames(1).energy ==
      s('e', 'f') * s('e', 'f') + s('g', 'h') * s('g', 'h'))
    assert(frames.forall(_.n_samples == 2))
    // a non-WAV payload (doc_id 0 → BMP branch) contributes no rows
    val bmp = Seq((0L, "abcdefgh", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Multimodal.audioEnergy(spark, bmp, frameSize = 2).count() == 0)
    // the tail remainder below one frame is dropped (defined contract)
    val odd = Seq((1L, "abcdefghij", "en", "s", 10L)) // 5 samples → 2 frames
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Multimodal.audioEnergy(spark, odd, frameSize = 2).count() == 2)
  }

  test("poisson bootstrap: hash-fated replicates bracket the true mean") {
    import graft.operators.Stats
    val orders = Tables(spark, sf, "orders")
    val reps = Stats
      .poissonBootstrapMeans(orders, "o_totalprice", "o_orderkey", reps = 32)
      .collect().sortBy(_.getInt(0))
    assert(reps.length == 32)
    val n = orders.count()
    // E[n_eff] = n (Poisson(1) weights); each replicate within ±20%
    reps.foreach { r =>
      val eff = r.getLong(1).toDouble / n
      assert(eff > 0.8 && eff < 1.2, s"replicate ${r.getInt(0)}: n_eff=$eff n")
    }
    // the replicate spread brackets the true mean (32 resamples of a
    // 1500-row mean: the truth falls inside the min..max envelope)
    val truth = orders.agg(
      org.apache.spark.sql.functions.avg("o_totalprice")).head().getDouble(0)
    val means = reps.map(_.getDouble(2))
    assert(means.min < truth && truth < means.max)
    // pure hash fate: a second run is bit-identical
    val again = Stats
      .poissonBootstrapMeans(orders, "o_totalprice", "o_orderkey", reps = 32)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(means.toSeq == again.toSeq)
  }

  test("lsh candidates are a subset of brute-force ranking") {
    // every ANN hit must also appear somewhere in the full ranking:
    // cosine of (q, v) is query-independent of the method
    val ann = q("x_sim_ann_lsh").select("q_id", "vec_id", "cos")
    val brute = SimilaritySearch.bruteTopK(
      Tables(spark, sf, "embeddings"), nQueries = 5, k = 1000000)
      .select("q_id", "vec_id", "cos")
    assert(ann.except(brute).count() == 0)
  }

  test("quality score is within [0,1] and deterministic") {
    val stats = q("x_quality_score")
      .agg(min("quality"), max("quality")).collect().head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("token counts: regex tokenizer sees at least the whitespace tokens") {
    assert(q("x_token_count")
      .filter(col("re_tokens") < col("ws_tokens")).count() == 0)
  }

  test("multimodal decode preserves cardinality and recovers header fields") {
    val df = q("x_multimodal_meta")
    val docs = Tables(spark, sf, "documents")
    assert(df.count() == docs.count())
    // bmp/wav rows carry real container headers; parsed dims/audio params
    // must equal the values they were packed from
    val j = df.join(docs, "doc_id")
    assert(j.filter(col("kind") === "bmp" &&
      (col("width") =!= col("n_chars") % 640 + 1 ||
        col("height") =!= col("doc_id") % 480 + 1 ||
        col("n_frames") =!= 1)).count() == 0)
    assert(j.filter(col("kind") === "wav" &&
      (col("sample_rate") =!= lit(8000) + (col("doc_id") % 8) * 500 ||
        col("channels") =!= col("doc_id") % 2 + 1)).count() == 0)
    assert(j.filter(col("kind") === "png" &&
      (col("width") =!= col("n_chars") % 512 + 1 ||
        col("height") =!= col("doc_id") % 256 + 1)).count() == 0)
    assert(j.filter(col("kind") === "jpeg" &&
      (col("width") =!= col("n_chars") % 1024 + 1 ||
        col("height") =!= col("doc_id") % 768 + 1)).count() == 0)
    // all five container branches are represented
    assert(df.select("kind").distinct().count() == 5)
    // raw rows: ASCII corpus ⇒ byte length == char length
    assert(j.filter(col("kind") === "raw" &&
      col("n_bytes") =!= col("n_chars")).count() == 0)
  }

  test("multimodal decodeOne parses real BMP/WAV bytes and rejects malformed") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaRow => MR}
    val bmp = Multimodal.decodeOne(
      MR(1L, Multimodal.bmpBytes(123, 45, Array.fill(32)(7.toByte)), "en"))
    assert(bmp.kind == "bmp" && bmp.width == 123 && bmp.height == 45 &&
      bmp.n_frames == 1 && bmp.n_bytes == 54 + 32)
    // 2-channel 16-bit PCM: 100 sample bytes truncate to 25 frames
    val wav = Multimodal.decodeOne(
      MR(2L, Multimodal.wavBytes(2, 44100, Array.fill(101)(9.toByte)), "en"))
    assert(wav.kind == "wav" && wav.sample_rate == 44100 &&
      wav.channels == 2 && wav.n_frames == 25)
    // truncated RIFF (chunk size overruns the buffer) must fall back,
    // not misparse
    val torn = Multimodal.wavBytes(1, 8000, Array.fill(64)(1.toByte)).take(50)
    assert(Multimodal.decodeOne(MR(3L, torn, "en")).kind == "raw")
    assert(Multimodal.decodeOne(MR(4L, "plain text".getBytes, "en")).kind == "raw")
  }

  test("multimodal decodeOne parses real PNG/JPEG bytes and rejects malformed") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaRow => MR}
    val png = Multimodal.decodeOne(
      MR(1L, Multimodal.pngBytes(640, 480, 6, Array.fill(32)(7.toByte)), "en"))
    assert(png.kind == "png" && png.width == 640 && png.height == 480 &&
      png.channels == 4 && png.n_bytes == 57 + 32)
    val gray = Multimodal.decodeOne(
      MR(2L, Multimodal.pngBytes(1, 1, 0, Array.emptyByteArray), "en"))
    assert(gray.kind == "png" && gray.channels == 1)
    // the SOF walk must skip APP0 (and any other leading segments)
    val jpg = Multimodal.decodeOne(
      MR(3L, Multimodal.jpegBytes(1024, 768, 3, Array.fill(64)(5.toByte)), "en"))
    assert(jpg.kind == "jpeg" && jpg.width == 1024 && jpg.height == 768 &&
      jpg.channels == 3 && jpg.n_bytes == 55 + 64)
    val mono = Multimodal.decodeOne(
      MR(4L, Multimodal.jpegBytes(8, 8, 1, Array.emptyByteArray), "en"))
    assert(mono.kind == "jpeg" && mono.channels == 1 && mono.n_bytes == 45)
    // PNG signature with a torn IHDR, and a JPEG whose SOF is cut off
    // by a wild segment length, both fall back rather than misparse
    val tornPng = Multimodal.pngBytes(9, 9, 2, Array.emptyByteArray).take(20)
    assert(Multimodal.decodeOne(MR(5L, tornPng, "en")).kind == "raw")
    val tornJpg = Multimodal.jpegBytes(9, 9, 1, Array.emptyByteArray).take(12)
    assert(Multimodal.decodeOne(MR(6L, tornJpg, "en")).kind == "raw")
    // unknown PNG color type bails instead of inventing a channel count
    val badColor = Multimodal.pngBytes(4, 4, 5, Array.emptyByteArray)
    assert(Multimodal.decodeOne(MR(7L, badColor, "en")).kind == "raw")
  }

  test("multimodal chain: decode -> frame-sample -> features -> ANN") {
    import graft.operators.Multimodal
    val docs = Tables(spark, sf, "documents")
    // frame sampling explodes without driver materialization
    val frames = Multimodal.frameSample(spark, docs, everyNth = 2)
    assert(frames.count() > 0)
    assert(frames.filter(length(col("frame")) > 100).count() == 0)
    // stub features are unit-normalized and schema-compatible with the
    // embeddings table, so the ANN operator consumes them directly
    val feats = Multimodal.extractFeatures(spark, docs, dim = 16).toDF()
    val norms = feats.select(
      abs(graft.expressions.DotProductFloat(col("embedding"), col("embedding"))
        - lit(1.0)).as("err"))
    assert(norms.filter(col("err") > 1e-3).count() == 0)
    val ann = SimilaritySearch.bruteTopK(feats, nQueries = 3, k = 5)
    assert(ann.count() == 15)
    assert(ann.filter(col("cos") > lit(1.0001)).count() == 0)
  }

  test("language profiles have exactly profileSize entries per language") {
    val prof = TextAnalysis.langId(Tables(spark, sf, "documents"))
    assert(prof.count() == Tables(spark, sf, "documents").count())
    assert(prof.select("pred_lang").distinct().count() <= 5)
  }

  test("simhash64 blocking: exact recall vs all-pairs 64-bit ground truth") {
    val docs = Tables(spark, sf, "documents")
    val hs = Dedup.simHashes64(docs).cache()
    val a = hs.select(col("doc_id").as("d1"),
      col("sim_lo").as("l1"), col("sim_hi").as("h1"))
    val b = hs.select(col("doc_id").as("d2"),
      col("sim_lo").as("l2"), col("sim_hi").as("h2"))
    val brute = a.crossJoin(b).filter(col("d1") < col("d2"))
      .filter(expr("bit_count(l1 ^ l2) + bit_count(h1 ^ h2)") <= 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simHash64(docs, maxHamming = 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missed ${(brute -- blocked).size}, extra ${(blocked -- brute).size}")
  }

  test("permuted-table simhash64 equals contiguous blocking exactly") {
    // both schemes have pigeonhole-exact recall at Hamming <= 6 and
    // verify the true 64-bit distance, so outputs must be identical
    val docs = Tables(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val contiguous = pairs(Dedup.simHash64(docs, maxHamming = 6))
    val permuted = pairs(Dedup.simHash64Combi(docs, maxHamming = 6))
    assert(permuted == contiguous,
      s"missed ${(contiguous -- permuted).size}, extra ${(permuted -- contiguous).size}")
  }

  test("pair exactly AT the Jaccard threshold survives the FP-boundary filters") {
    // |A|=28, |B|=35 distinct 1-gram shingles, overlap 28 -> J = 28/35 = 0.8
    // exactly, and |A|+|B| = 63 is the smallest size-sum where
    // ceil(0.8/1.8 * s) computed in doubles overshoots the exact bound
    // (28.000000000000004 -> 29) — the bug this pins would silently drop
    // the pair before verification
    val a = (1 to 28).map(i => s"w$i").mkString(" ")
    val b = (1 to 35).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a, "en", "s", 0L), (2L, b, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.nearDupJaccard(docs, k = 1, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0.8)))
  }

  test("simhash rejects maxHamming outside [0, 31]") {
    val docs = Tables(spark, sf, "documents")
    intercept[IllegalArgumentException](Dedup.simHash(docs, maxHamming = 32))
    intercept[IllegalArgumentException](Dedup.simHash(docs, maxHamming = -1))
  }

  test("clusters: transitive closure beyond direct pairs, min-id rep") {
    // chain 1-2-3 (no direct 1-3 pair) plus isolated pair 7-8
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val res = Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.toSet == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
    // empty pair set: empty output, converges immediately
    assert(Dedup.clusters(Seq.empty[(Long, Long)].toDF("d1", "d2"))
      .count() == 0)
  }

  test("large-star/small-star components equal Hash-Min on corpus pairs") {
    val pairs = q("x_dedup_minhash")
    val hashMin = Dedup.clusters(pairs)
    val star = Dedup.clustersStar(pairs)
    assert(star.exceptAll(hashMin).count() == 0)
    assert(hashMin.exceptAll(star).count() == 0)
    // long chain (diameter 8): the O(log n) algorithm must agree there too
    val chain = (0L until 8L).map(i => (i, i + 1)).toDF("d1", "d2")
    val starChain = Dedup.clustersStar(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(starChain == (0L to 8L).map(i => (i, 0L, 9L)).toSet)
    // docs appearing only in self-pairs stay labeled as singletons in
    // BOTH algorithms (canon drops the self-loop edge; the contract
    // keeps the doc)
    val withSelf = Seq((1L, 2L), (7L, 7L)).toDF("d1", "d2")
    val hm = Dedup.clusters(withSelf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val st = Dedup.clustersStar(withSelf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hm == Set((1L, 1L, 2L), (2L, 1L, 2L), (7L, 7L, 1L)))
    assert(st == hm)
  }

  test("clusters partition the corpus near-dup pairs consistently") {
    val pairs = q("x_dedup_minhash")
    val cl = Dedup.clusters(pairs).cache()
    // every doc in a pair is labeled; rep is a member of the same cluster
    val inPairs = pairs.select(col("d1").as("doc_id"))
      .union(pairs.select(col("d2"))).distinct()
    assert(cl.count() == inPairs.count())
    val reps = cl.select(col("rep_id")).distinct()
    assert(reps.join(cl, reps("rep_id") === cl("doc_id"), "left_anti")
      .count() == 0)
    // both ends of every pair carry the same label
    val l1 = cl.select(col("doc_id").as("d1"), col("rep_id").as("r1"))
    val l2 = cl.select(col("doc_id").as("d2"), col("rep_id").as("r2"))
    assert(pairs.join(l1, "d1").join(l2, "d2")
      .filter(col("r1") =!= col("r2")).count() == 0)
  }

  test("int8 quantization: checksums bound by 255*dim, constant vector -> zeros") {
    import graft.operators.SimilaritySearch
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.0f, 0.5f, 1.0f)),
      (1L, Array(2.0f, 2.0f, 2.0f)) // constant: mx == mn
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.quantizeInt8(vecs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    // v=[0,.5,1]: q = [0, floor(127.5)=127, 255] -> qsum 382, qdot 892
    assert(out(0L) == ((0.0, 1.0, 382L, 0L * 1 + 127L * 2 + 255L * 3)))
    assert(out(1L) == ((2.0, 2.0, 0L, 0L)))
    val corpus = SimilaritySearch.quantizeInt8(Tables(spark, sf, "embeddings"))
    assert(corpus.filter(col("qsum") < 0 || col("qsum") > 255L * 64).count() == 0)
  }

  test("stratified sample: per-lang rates honored, deterministic, subset") {
    import graft.operators.Curation
    val docs = Tables(spark, sf, "documents")
    val a = Curation.stratifiedSample(docs, Map("en" -> 0), 1000)
    // rate 0 drops every en row; rate 1000 keeps every other row
    assert(a.filter(col("lang") === "en").count() == 0)
    assert(a.count() == docs.filter(col("lang") =!= "en").count())
    val b = Curation.stratifiedSample(docs.repartition(7), Map("en" -> 200), 500)
    val c = Curation.stratifiedSample(docs, Map("en" -> 200), 500)
    assert(b.orderBy("doc_id").collect().sameElements(c.orderBy("doc_id").collect()))
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, Map("en" -> 1001), 500)
    }
  }

  test("token histogram: counts sum to corpus size, buckets within range") {
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf, "documents")
    val h = TextAnalysis.tokenHistogram(docs, bucketWidth = 20, nBuckets = 10)
      .collect()
    assert(h.map(_.getLong(2)).sum == docs.count())
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    assert(h.forall(r => r.getLong(1) == r.getLong(0) * 20))
  }

  test("cross-corpus contamination pairs = self-join pairs with mixed sides") {
    import graft.operators.{Curation, Dedup}
    val docs = Tables(spark, sf, "documents")
    val sides = docs.join(
      Curation.hashSplit(docs).select(col("doc_id"), col("split")), "doc_id")
    val a = sides.filter(col("split") === "train")
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val cross = Dedup.crossDupMinHash(a, sides.filter(col("split") =!= "train"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val self = Dedup.nearDupMinHash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (x, y) => aIds.contains(x) ^ aIds.contains(y) }.toSet
    assert(cross == self,
      s"missed ${(self -- cross).size}, extra ${(cross -- self).size}")
  }

  test("latestByKey equals the window form (one agg vs per-key sort)") {
    import graft.operators.Dedup
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"), col("value"))
    val viaAgg = Dedup.latestByKey(ev,
      Seq("user_id", "event_type"), Seq("ts", "event_id"), Seq("value"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions",
        count(lit(1)).over(Window.partitionBy("user_id", "event_type")))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "ts", "event_id", "value", "n_versions")
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("hash split is deterministic, covers all rows, respects cutoffs") {
    import graft.operators.Curation
    val docs = Tables(spark, sf, "documents")
    val s1 = Curation.hashSplit(docs).cache()
    assert(s1.count() == docs.count())
    assert(s1.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    assert(s1.filter(
      (col("bucket") < 80 && col("split") =!= "train") ||
      (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
      (col("bucket") >= 90 && col("split") =!= "test")).count() == 0)
    // stable under recomputation and repartitioning
    val s2 = Curation.hashSplit(docs.repartition(7))
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // a different salt draws a different split
    val s3 = Curation.hashSplit(docs, salt = "other")
    assert(s1.join(s3, "doc_id")
      .filter(s1("split") =!= s3("split")).count() > 0)
  }

  test("chunk split: coverage, overlap, and bounds on a crafted doc") {
    val doc = Seq((0L, (1 to 10).map(i => s"t$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = TextAnalysis.chunkSplit(doc, maxTokens = 4, stride = 2)
      .orderBy("chunk_id").collect()
    // starts 1,3,5,7,9 -> 5 chunks; all <= 4 tokens; stride-2 overlap
    assert(chunks.length == 5)
    assert(chunks.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    assert(chunks(0).getString(3) == "t1 t2 t3 t4")
    assert(chunks(1).getString(3) == "t3 t4 t5 t6")
    assert(chunks(4).getString(3) == "t9 t10")
    // corpus-wide: every chunk obeys the token bound, no doc dropped
    val all = TextAnalysis.chunkSplit(Tables(spark, sf, "documents"))
    assert(all.filter(col("n_chunk_tokens") > 50).count() == 0)
    assert(all.select("doc_id").distinct().count() ==
      Tables(spark, sf, "documents").count())
  }

  test("tf-idf top terms: ubiquitous terms score zero, ranks bounded") {
    val crafted2 = Seq(
      (0L, "alpha alpha alpha shared", "en", "s", 0L),
      (1L, "beta beta shared shared", "en", "s", 0L),
      (2L, "gamma delta shared epsilon", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = TextAnalysis.tfIdfTopTerms(crafted2, k = 2).cache()
    // 'shared' is in every doc -> idf = ln(1) = 0
    assert(top.filter(col("tok") === "shared" && col("score") =!= 0.0)
      .count() == 0)
    // each doc's #1 term is its own distinctive token
    val first = top.filter(col("trank") === 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first(0L) == "alpha" && first(1L) == "beta")
    assert(top.groupBy("doc_id").count().filter(col("count") > 2).count() == 0)
  }

  test("two-phase quota cap equals the single-phase window result") {
    import graft.operators.Curation
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, sf, "documents")
    val two = Curation.quotaCap(docs, quota = 7)
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy("lang").orderBy(desc("quality"), asc("doc_id"))
    val one = scored.withColumn("qrank", row_number().over(w).cast("long"))
      .filter(col("qrank") <= 7)
      .select("doc_id", "lang", "quality", "qrank")
    assert(two.exceptAll(one).count() == 0 && one.exceptAll(two).count() == 0)
    // quota respected per group
    assert(two.groupBy("lang").count().filter(col("count") > 7).count() == 0)
  }

  test("packSequences: contiguous global token layout, partition-invariant") {
    import graft.operators.Packing
    val docs = Tables(spark, sf, "documents")
    val packed = Packing.packSequences(docs, budget = 100).cache()
    // the layout is a gap-free concatenation: total tokens == the end of
    // the last document's span, and every start is distinct
    val total = packed.agg(sum("n_tokens")).head().getLong(0)
    val maxEnd = packed.agg(max(col("start_tok") + col("n_tokens")))
      .head().getLong(0)
    assert(total == maxEnd)
    assert(packed.select("start_tok").distinct().count() == packed.count())
    // pack arithmetic is consistent
    assert(packed.filter(
      col("pack_id") =!= (col("start_tok") / 100).cast("long") ||
        col("pack_off") =!= col("start_tok") % 100).count() == 0)
    // the two-phase prefix sum must not depend on input partitioning
    val re = Packing.packSequences(docs.repartition(7), budget = 100)
    assert(packed.exceptAll(re).count() == 0 && re.exceptAll(packed).count() == 0)
  }

  test("repetitionScore flags looping text and passes diverse text") {
    import spark.implicits._
    val crafted = Seq(
      (0L, "a b a b a b", "en", "s", 11L),       // 5 2-grams, 2 distinct
      (1L, "one two three four five", "en", "s", 23L),
      (2L, "x", "en", "s", 1L)                   // shorter than any gram
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.repetitionScore(crafted, threshold = 0.2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getDouble(2) == 0.6 && r(0L).getBoolean(4))
    assert(r(1L).getDouble(2) == 0.0 && !r(1L).getBoolean(4))
    assert(r(2L).getDouble(2) == 0.0 && r(2L).getDouble(3) == 0.0)
  }

  test("redact scrubs emails and phones and counts hits") {
    import spark.implicits._
    val crafted = Seq(
      (0L, "write bob123@host.org or sue@a.io thanks"),
      (1L, "call 555-0001 or 555-9999"),
      (2L, "nothing here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redact(crafted)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(1) == 2 &&
      r(0L).getString(3) == "write <EMAIL> or <EMAIL> thanks")
    assert(r(1L).getLong(2) == 2 &&
      r(1L).getString(3) == "call <PHONE> or <PHONE>")
    assert(r(2L).getLong(1) == 0 && r(2L).getLong(2) == 0 &&
      r(2L).getString(3) == "nothing here")
  }

  test("labelCentroids: exact fixed-point means per (label, dim)") {
    import spark.implicits._
    val crafted = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(10.0f, 20.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.labelCentroids(crafted)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((0, 0L)) == ((2L, 2.0)) && out((0, 1L)) == ((2L, 4.0)))
    assert(out((1, 0L)) == ((1L, 10.0)) && out((1, 1L)) == ((1L, 20.0)))
    // corpus invariants: one row per (label, dim); partition-invariant
    val vecs = Tables(spark, sf, "embeddings")
    val base = SimilaritySearch.labelCentroids(vecs).cache()
    val dims = vecs.select(size(col("embedding"))).distinct()
      .collect().map(_.getInt(0))
    val labels = vecs.select("label").distinct().count()
    assert(base.count() == labels * dims.head)
    val re = SimilaritySearch.labelCentroids(vecs.repartition(7))
    assert(re.exceptAll(base).count() == 0 && base.exceptAll(re).count() == 0)
    base.unpersist()
  }

  test("domainMix: smallest group kept whole, rates follow sqrt(n_min/n)") {
    val docs = Tables(spark, sf, "documents")
    val mixed = graft.operators.Curation.domainMix(docs).cache()
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = n.values.min
    val rates = mixed.select("lang", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (lang, rate) =>
      assert(rate ==
        math.floor(1000 * math.sqrt(nMin.toDouble / n(lang))).toLong)
    }
    // the smallest group's rate is exactly 1000 — kept in full
    val minLang = n.minBy { case (l, c) => (c, l) }._1
    assert(rates(minLang) == 1000L)
    assert(mixed.filter(col("lang") === minLang).count() == nMin)
    // deterministic: stable under repartitioning
    val re = graft.operators.Curation.domainMix(docs.repartition(7))
    assert(re.exceptAll(mixed).count() == 0 && mixed.exceptAll(re).count() == 0)
    mixed.unpersist()
  }

  test("sharedSpans: finds the copied span pair, df-cap kills corpus templates") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta iota"
    val crafted = Seq(
      (0L, s"intro words then $span and a tail", "en", "s", 0L),
      (1L, s"other opening $span closing remarks here", "en", "s", 0L),
      (2L, "entirely unrelated content with no overlap at all once", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.sharedSpans(crafted, k = 8, maxDf = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
    // a span present in MORE than maxDf docs is a corpus template: the
    // df-cap drops it before pairing, so no pairs survive
    val template = (0L until 12L).map(i =>
      (i, s"doc $i shares $span always", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.sharedSpans(template, k = 8, maxDf = 10, minShared = 1)
      .count() == 0)
    // minShared thresholds: the crafted pair shares exactly 2 spans of
    // k=8 within the copied 9-token run, so minShared = 3 excludes it
    assert(Dedup.sharedSpans(crafted, k = 8, maxDf = 10, minShared = 3)
      .count() == 0)
  }

  test("sharedSpanRuns: recovers the exact longest duplicated substring") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta iota"  // 9 tokens
    val crafted = Seq(
      (0L, s"intro words then $span and a tail", "en", "s", 0L),
      (1L, s"other opening $span closing remarks here", "en", "s", 0L),
      (2L, "entirely unrelated content with no overlap at all once", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.sharedSpanRuns(crafted, k = 8, maxDf = 10, minRun = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // the 9-token copy = 2 consecutive 8-token spans on one diagonal:
    // longest_tokens = 2 + 8 - 1 = 9, exactly the copied run, 1 run
    assert(out == Map((0L, 1L) -> ((9L, 1L))))
    // minRun = 3 (≥ 10-token runs) excludes the 9-token copy
    assert(Dedup.sharedSpanRuns(crafted, k = 8, maxDf = 10, minRun = 3)
      .count() == 0)
    // a doc containing the span TWICE aligns on two diagonals: still
    // longest 9, but two distinct maximal runs
    val twice = Seq(
      (0L, s"$span filler $span", "en", "s", 0L),
      (1L, s"prefix $span suffix", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = Dedup.sharedSpanRuns(twice, k = 8, maxDf = 10, minRun = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(t == ((9L, 2L)))
  }

  test("unigramLmScore: ML probs for vocab, OOV floor, exact fixed-point sums") {
    import spark.implicits._
    // corpus: a×4, c×4, total 8; vocabSize=1 keeps only 'a' (tie on
    // cnt broken token-asc), so every 'c' hits the OOV floor 1/total
    val crafted = Seq(
      (0L, "a a a a", "en", "s", 0L),
      (1L, "c c c c", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.unigramLmScore(crafted, vocabSize = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val logpA = math.round(math.log10(4.0 / 8.0) * 10000)  // -3010
    val floor = math.round(math.log10(1.0 / 8.0) * 10000)  // -9031
    assert(out(0L) == ((4L, 4 * logpA, 4 * logpA / 10000.0 / 4)))
    assert(out(1L) == ((4L, 4 * floor, 4 * floor / 10000.0 / 4)))
    // corpus-scale invariants: in-vocab docs always outscore a doc of
    // pure floor tokens; scores are partition-invariant
    val docs = Tables(spark, sf, "documents")
    val base = TextAnalysis.unigramLmScore(docs, vocabSize = 20).cache()
    val re = TextAnalysis.unigramLmScore(docs.repartition(7), vocabSize = 20)
    assert(re.exceptAll(base).count() == 0 && base.exceptAll(re).count() == 0)
    base.unpersist()
  }

  test("buildVocab: specials lead, frequency cutoff + tie-break, dense ids") {
    import spark.implicits._
    // counts: b×3, a×2, c×2, d×1 — vocabSize=3 keeps b,a,c (tie a<c)
    val crafted = Seq(
      (0L, "b b a c", "en", "s", 0L),
      (1L, "b a c d", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = TextAnalysis.buildVocab(crafted, vocabSize = 3)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(v.length == 7)
    // ids are dense 0..n-1, specials first (lexicographic), then rank
    assert(v.map(_._1).toSeq == (0L until 7L))
    assert(v.take(4).forall(_._4) && v.drop(4).forall(!_._4))
    assert(v.drop(4).map(t => (t._2, t._3)).toSeq ==
      Seq(("b", 3L), ("a", 2L), ("c", 2L)))   // d is cut
    // corpus invariant: ids unique + dense regardless of partitioning
    val docs = Tables(spark, sf, "documents")
    val ids = TextAnalysis.buildVocab(docs.repartition(7), vocabSize = 20)
      .select("token_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length))
  }

  test("winnow: shared runs >= w+k-1 tokens share a fingerprint; rightmost tie") {
    import spark.implicits._
    // doc 1 embeds a 6-token run of doc 0 (w+k-1 = 6 with k=3,w=4):
    // winnowing GUARANTEES at least one common fingerprint
    val crafted = Seq(
      (0L, "u v w x y z p q r s t", "en", "s", 0L),
      (1L, "m n o u v w x y z k l", "en", "s", 0L),
      (2L, "completely different words here now again ok yes", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val fps = TextAnalysis.winnow(crafted, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def of(id: Long) = fps.filter(_._1 == id).map(_._2)
    assert(of(0L).intersect(of(1L)).nonEmpty)
    assert(of(0L).intersect(of(2L)).isEmpty)
    // rightmost tie-break: all-identical grams -> ONE selection per
    // window at the window's last position each time, deduped to the
    // run's rightmost-most selections (positions strictly increase)
    val tie = Seq((9L, "a a a a a a a a", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sel = TextAnalysis.winnow(tie, k = 3, w = 4)
      .select("pos").collect().map(_.getLong(0)).sorted.toSeq
    // 6 gram positions 0..5, windows [0..3],[1..4],[2..5]: identical
    // hashes, so each window picks its RIGHTMOST gram: 3, 4, 5
    assert(sel == Seq(3L, 4L, 5L))
    // corpus: fingerprints are a subset of gram positions and
    // partition-invariant
    val docs = Tables(spark, sf, "documents")
    val base = TextAnalysis.winnow(docs, k = 3, w = 4).cache()
    val re = TextAnalysis.winnow(docs.repartition(7), k = 3, w = 4)
    assert(re.exceptAll(base).count() == 0 && base.exceptAll(re).count() == 0)
    base.unpersist()
  }

  test("boilerplateStrip removes cross-doc template spans, keeps unique text") {
    import spark.implicits._
    // 'copyright all rights reserved' appears in 3 docs (>= minDocs=3);
    // everything else is unique per doc
    val crafted = Seq(
      (0L, "alpha beta copyright all rights reserved gamma", "en", "s", 0L),
      (1L, "delta copyright all rights reserved epsilon zeta", "en", "s", 0L),
      (2L, "copyright all rights reserved eta theta iota", "en", "s", 0L),
      (3L, "totally original content with no template", "en", "s", 0L),
      (4L, "hi", "en", "s", 0L)   // shorter than n: pass-through path
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.boilerplateStrip(crafted, n = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((7L, 4L, "alpha beta gamma")))
    assert(out(1L) == ((7L, 4L, "delta epsilon zeta")))
    assert(out(2L) == ((7L, 4L, "eta theta iota")))
    assert(out(3L) == ((6L, 0L, "totally original content with no template")))
    assert(out(4L) == ((1L, 0L, "hi")))
    // corpus invariant: n_removed <= n_tokens, clean token count checks out
    val docs = Tables(spark, sf, "documents")
    val bad = TextAnalysis.boilerplateStrip(docs, n = 3, minDocs = 4)
      .filter(col("n_removed") > col("n_tokens") ||
        size(split(col("clean_text"), " ")) =!=
          when(col("n_removed") === col("n_tokens"), lit(1)) // split("")=[""]
            .otherwise(col("n_tokens") - col("n_removed")))
      .count()
    assert(bad == 0)
  }

  test("dataCard: hand-computed entropy, top-lang tie to smallest lang") {
    import spark.implicits._
    // srcA: 2 en + 2 fr -> H = 1 bit exactly, top_lang tie -> 'en'
    // srcB: 4 en -> H = 0
    val crafted = Seq(
      (0L, "x", "en", "srcA", 10L), (1L, "x", "en", "srcA", 20L),
      (2L, "x", "fr", "srcA", 30L), (3L, "x", "fr", "srcA", 40L),
      (4L, "x", "en", "srcB", 5L), (5L, "x", "en", "srcB", 6L),
      (6L, "x", "en", "srcB", 7L), (7L, "x", "en", "srcB", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.dataCard(crafted)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getDouble(5))).toMap
    assert(out("srcA") == ((4L, 100L, 2L, "en", 1.0)))
    assert(out("srcB") == ((4L, 26L, 1L, "en", 0.0)))
    // corpus invariants: entropy within [0, log2(n_langs)], doc counts roll up
    val card = TextAnalysis.dataCard(Tables(spark, sf, "documents"))
    assert(card.filter(col("lang_entropy") < 0 ||
      col("lang_entropy") > expr("log2(n_langs) + 1e-9")).count() == 0)
    assert(card.agg(sum("n_docs")).head.getLong(0) ==
      Tables(spark, sf, "documents").count())
  }

  test("signProject: matches direct +-1 dot product, partition-invariant") {
    import graft.functions.Hashing
    val vecs = Tables(spark, sf, "embeddings")
    val out = SimilaritySearch.signProject(vecs, inDim = 64, outDim = 2)
    val row = out.orderBy("vec_id").head
    val emb = vecs.orderBy("vec_id").head
      .getSeq[Float](vecs.columns.indexOf("embedding"))
    // re-derive p0/p1 with the same driver-side hash + fixed-point walk
    def direct(i: Int): Double =
      emb.zipWithIndex.map { case (x, j) =>
        val s = if (Hashing.hash32Local(s"proj:$i:$j") % 2 == 0) 1L else -1L
        math.round(x.toDouble * 1e6) * s
      }.sum.toDouble / 1e6
    assert(row.getDouble(1) == direct(0) && row.getDouble(2) == direct(1))
    val re = SimilaritySearch.signProject(
      vecs.repartition(7), inDim = 64, outDim = 2)
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
  }

  test("encodeIds: checksums match a hand-encoded doc, OOV maps to <unk>") {
    import spark.implicits._
    // counts: b×3, a×2 — vocabSize=2 keeps {b, a}; specials get 0..3
    // (lexicographic: <bos> <eos> <pad> <unk>), then b=4, a=5; 'z' is OOV
    val crafted = Seq(
      (0L, "b b a", "en", "s", 0L),
      (1L, "a b z", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.encodeIds(crafted, vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // <unk> id = 3; doc0 ids [4,4,5]: sum 13, dot 4*1+4*2+5*3 = 27
    assert(out(0L) == ((3L, 0L, 13L, 27L)))
    // doc1 ids [5,4,3]: sum 12, dot 5*1+4*2+3*3 = 22, one OOV
    assert(out(1L) == ((3L, 1L, 12L, 22L)))
    // corpus invariants: n_oov <= n_tokens; partition-invariant
    val docs = Tables(spark, sf, "documents")
    val base = TextAnalysis.encodeIds(docs, vocabSize = 20).cache()
    assert(base.filter(col("n_oov") > col("n_tokens")).count() == 0)
    val re = TextAnalysis.encodeIds(docs.repartition(7), vocabSize = 20)
    assert(re.exceptAll(base).count() == 0 && base.exceptAll(re).count() == 0)
    base.unpersist()
  }

  test("nbClassify: separable languages classify correctly, scores exact") {
    import spark.implicits._
    // two perfectly separable languages
    val crafted = Seq(
      (0L, "bonjour le monde", "fr", "s", 0L),
      (1L, "le monde bonjour", "fr", "s", 0L),
      (2L, "hello the world", "en", "s", 0L),
      (3L, "world the hello", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.nbClassify(crafted)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out.values.forall(_._4), s"misclassified: $out")
    // hand-check doc0's winning score: V=6, t_fr=6, prior log10(2/4),
    // each of the 3 tokens logp = log10((2+1)/(6+6))
    val tokE4 = math.round(math.log10(3.0 / 12.0) * 10000)
    val expected = math.round(math.log10(0.5) * 10000) + 3 * tokE4
    assert(out(0L)._3 == expected)
    // corpus: the labels are random word soup, so don't assert accuracy
    // — only that every doc gets exactly one prediction from the grid
    val docs = Tables(spark, sf, "documents")
    val preds = TextAnalysis.nbClassify(docs).cache()
    assert(preds.count() == docs.count())
    assert(preds.select("pred_lang").distinct().count() <=
      docs.select("lang").distinct().count())
    preds.unpersist()
  }

  test("knnGraph: symmetric top-k, ranks dense from 1, cos descending") {
    import spark.implicits._
    val pairs = Seq(
      (0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.7), (1L, 2L, 0.6)
    ).toDF("v1", "v2", "cos")
    val g = SimilaritySearch.knnGraph(pairs, k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val bySrc = g.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // src 0 keeps its 2 best of 3 candidates
    assert(bySrc(0L).map(t => (t._2, t._4)).toSeq == Seq((1L, 1L), (2L, 2L)))
    // src 3 has exactly one edge (from symmetrization of (0,3))
    assert(bySrc(3L).map(_._2).toSeq == Seq(0L))
    // every src's ranks are 1..n and cos is non-increasing
    bySrc.values.foreach { es =>
      assert(es.map(_._4).toSeq == (1L to es.length))
      assert(es.map(_._3).toSeq.sliding(2).forall(
        s => s.length < 2 || s(0) >= s(1)))
    }
  }

  test("perplexityFilter: per-lang keep fraction honored, best docs kept") {
    val docs = Tables(spark, sf, "documents")
    val kept = Curation.perplexityFilter(docs, vocabSize = 20,
      keepFrac = 0.75).cache()
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allByLang.foreach { case (lang, n) =>
      assert(keptByLang(lang) == math.ceil(n * 0.75).toLong,
        s"lang $lang: kept ${keptByLang.get(lang)} of $n")
    }
    // kept docs strictly dominate dropped docs within each language
    val dropped = docs.select("doc_id", "lang")
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val scores = graft.operators.TextAnalysis
      .unigramLmScore(docs, vocabSize = 20).select("doc_id", "avg_logp")
    val worstKept = kept
      .groupBy("lang").agg(min("avg_logp").as("worst_kept"))
    val bestDropped = dropped.join(scores, "doc_id")
      .groupBy("lang").agg(max("avg_logp").as("best_dropped"))
    assert(worstKept.join(bestDropped, "lang")
      .filter(col("best_dropped") > col("worst_kept")).count() == 0)
    kept.unpersist()
  }

  test("profile: nulls and distincts per column on a crafted frame") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b"))
    ).toDF("num", "txt")
    val out = graft.operators.Profiling.profile(df, Seq("num", "txt"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("num") == ((3L, 1L, 1L)))
    assert(out("txt") == ((3L, 1L, 2L)))
    // corpus: declared query profiles every requested column, no nulls
    // in the synthetic orders table, keys fully distinct
    val prof = SparkEntry.queries("x_profile_table")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof.size == 6)
    val orders = Tables(spark, sf, "orders").count()
    assert(prof("o_orderkey") == ((orders, 0L, orders)))
  }

  test("embedOutliers: planted far vector ranks as its label's top outlier") {
    import spark.implicits._
    // label 0: three near-identical vectors + one OPPOSITE-direction
    // outlier; label 1: two identical vectors (both cos 1 to centroid)
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Seq(0.95f, 0.05f, 0f, 0f), 0),
      (3L, Seq(-1f, 0f, 0f, 0f), 0),
      (4L, Seq(0f, 1f, 0f, 0f), 1),
      (5L, Seq(0f, 1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.embedOutliers(vecs, k = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(0) == 3L) // the flipped vector is label 0's worst fit
    // corpus invariants: k rows per label, cosine within [-1, 1]
    val emb = Tables(spark, sf, "embeddings")
    val res = SimilaritySearch.embedOutliers(emb, k = 5).cache()
    val perLabel = res.groupBy("label").count()
      .filter(col("count") =!= 5).count()
    assert(perLabel == 0)
    assert(res.filter(col("cos_c") < -1 || col("cos_c") > 1).count() == 0)
    res.unpersist()
  }

  test("pageRank: hand-computed star graph, stationary cycle, mass bounded") {
    import spark.implicits._
    import graft.operators.GraphRank
    // 2-cycle: uniform rank is stationary under the integer arithmetic
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    GraphRank.pageRank(cyc, iterations = 3).collect()
      .foreach(r => assert(r.getLong(1) == 500000000L))
    // 3-node star (a<->b, a<->c): three rounds replayed by hand with
    // the same floor divisions
    val star = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = GraphRank.pageRank(star, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 580541666L)
    assert(got(2L) == 209729166L && got(3L) == 209729166L)
    // declared query: ranks positive, total mass ≤ 1 (floor drift only
    // ever loses mass), hubs exist (some node above the uniform rank)
    val pr = q("x_graph_rank").cache()
    assert(pr.filter(col("r_e9") <= 0).count() == 0)
    val n = pr.count()
    val mass = pr.agg(sum("r_e9")).head.getLong(0)
    assert(mass <= 1000000000L + n) // ≤ 1 + rounding headroom
    assert(pr.filter(col("r_e9") > lit(1000000000L / n)).count() > 0)
    pr.unpersist()
  }

  test("CMS heavy hitters: never underestimates; width-1 degenerates to total") {
    val docs = Tables(spark, sf, "documents")
    val est = TextAnalysis.heavyHittersCms(docs, depth = 4, width = 64,
      topK = 10)
    assert(est.filter(col("cms_est") < col("exact_cnt")).count() == 0)
    assert(est.count() == 10)
    // width=1: every token lands in the single bucket, so the estimate
    // for EVERY probe is exactly the corpus token count
    val total = docs.select(explode(split(col("text"), " "))).count()
    val degenerate = TextAnalysis.heavyHittersCms(docs, depth = 2,
      width = 1, topK = 5)
    assert(degenerate.collect().forall(_.getAs[Long]("cms_est") == total))
  }

  test("prepare pipeline: stage composition consistent with components") {
    val docs = Tables(spark, sf, "documents")
    val out = SparkEntry.queries("x_pipeline_prepare")(spark, sf).cache()
    // chunked doc set == the quality-filter keep set (filter upstream)
    val keptIds = Curation.perplexityFilter(docs, vocabSize = 20,
      keepFrac = 0.75).select("doc_id")
    val chunkIds = out.select("doc_id").distinct()
    assert(chunkIds.exceptAll(keptIds).count() == 0 &&
      keptIds.exceptAll(chunkIds).count() == 0)
    // non-overlapping 30/30 chunks: per-doc token totals reconstruct
    // the stripped text's token count exactly
    val filtered = docs.join(keptIds, "doc_id")
    val strippedCounts = TextAnalysis
      .boilerplateStrip(filtered, n = 3, minDocs = 4)
      .select(col("doc_id"),
        size(split(col("clean_text"), " ")).cast("long").as("n_clean"))
    val chunkSums = out.groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("n_chunked"))
    assert(chunkSums.join(strippedCounts, "doc_id")
      .filter(col("n_chunked") =!= col("n_clean")).count() == 0)
    out.unpersist()
  }

  test("fuzzyMatch: typo'd names resolve to their source, exact names to self") {
    import spark.implicits._
    import graft.operators.FuzzyMatch
    val clean = Seq((1L, "ARGENTINA"), (2L, "AUSTRALIA"), (3L, "BRAZIL"))
      .toDF("id", "name")
    val dirty = Seq((10L, "ARGENTNA"), (20L, "AUSTRALIA"), (30L, "BRAZIIL"))
      .toDF("d_id", "d_name")
    val m = FuzzyMatch.bestMatch(dirty, clean, "d_id", "d_name",
      "id", "name", k = 2, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(m(10L)._1 == 1L && m(30L)._1 == 3L)
    assert(m(20L) == ((2L, 1.0)))                 // exact match: jacc 1
    // declared query: most one-char deletions resolve to their source
    // nation (shared NATION_ prefixes make a few ties legitimate)
    val q1 = SparkEntry.queries("x_join_fuzzy")(spark, sf)
    val hits = q1.filter(col("d_key") === col("n_nationkey")).count()
    assert(hits >= 20, s"only $hits/25 typo'd nations resolved")
  }

  test("corpusShuffle: dense permutation, key-determined, repartition-stable") {
    val docs = Tables(spark, sf, "documents")
    val out = Curation.corpusShuffle(docs).cache()
    val n = docs.count()
    assert(out.count() == n)
    // positions are exactly 0..n-1 (a permutation)
    assert(out.agg(min("position"), max("position"),
      countDistinct("position")).head.toSeq == Seq(0L, n - 1, n))
    // shuffled: the position order differs from doc_id order
    assert(out.filter(col("position") =!= col("doc_id")).count() > 0)
    val re = Curation.corpusShuffle(docs.repartition(7))
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  test("ngramOverlap counts exact shared 5-grams, honoring minShared and the df cap") {
    val train = Seq((0L, "a b c d e f g h"), (1L, "z y x w v u t s"))
      .toDF("doc_id", "text")
    val eval = Seq((10L, "a b c d e f q r")).toDF("doc_id", "text")
    // docs 0 and 10 share exactly "a b c d e" and "b c d e f"
    val res = Dedup.ngramOverlap(train, eval, n = 5, minShared = 2,
      maxDf = 20, bloomExpectedItems = 1024).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 10L, 2L)))
    assert(Dedup.ngramOverlap(train, eval, n = 5, minShared = 3,
      maxDf = 20, bloomExpectedItems = 1024).count() == 0)
    // a shared gram has df >= 2 by definition, so maxDf = 1 kills all pairs
    assert(Dedup.ngramOverlap(train, eval, n = 5, minShared = 1,
      maxDf = 1, bloomExpectedItems = 1024).count() == 0)
    // declared query materializes with the declared schema, and the
    // native Bloom probe (not a UDF) guards the train-side stream
    val dq = q("x_contamination_ngram")
    assert(dq.columns.toSeq == Seq("train_id", "eval_id", "n_shared"))
    val plan = dq.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected native probe in:\n$plan")
    assert(!plan.contains("UDF"))
  }

  test("tokenize pipeline: encode stats and pack layout stay consistent") {
    val out = q("x_pipeline_tokenize").persist()
    val docs = Tables(spark, sf, "documents")
    // every document gets exactly one row
    assert(out.count() == docs.count())
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "n_oov",
      "ids_sum", "pack_id", "pack_off"))
    // layout invariants: offsets live inside the window budget, oov
    // never exceeds the token count
    assert(out.filter(col("pack_off") < 0 || col("pack_off") >= 256)
      .count() == 0)
    assert(out.filter(col("n_oov") > col("n_tokens")).count() == 0)
    // the composed lineage equals the independently chained operators
    val enc = TextAnalysis.encodeIds(docs, vocabSize = 50)
      .select("doc_id", "n_tokens", "n_oov", "ids_sum")
    val packed = graft.operators.Packing.packSequences(docs, 256)
      .select("doc_id", "pack_id", "pack_off")
    val chained = enc.join(packed, Seq("doc_id"))
    assert(out.exceptAll(chained).count() == 0 &&
      chained.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("pqEncode: full coverage, in-range codes, partition-invariant") {
    val out = q("x_embed_pq").persist()
    val vecs = Tables(spark, sf, "embeddings")
    assert(out.count() == vecs.count())
    assert(out.filter(col("code0") < 0 || col("code0") > 3 ||
      col("code1") < 0 || col("code1") > 3).count() == 0)
    // codebooks discriminate: more than one codeword in use per subspace
    assert(out.select(countDistinct("code0")).head.getLong(0) >= 2)
    assert(out.select(countDistinct("code1")).head.getLong(0) >= 2)
    // training + encoding are partition-invariant (hash-ordered seeds,
    // fixed-point Lloyd, literal-codebook projection)
    val re = SimilaritySearch.pqEncode(vecs.repartition(7),
      m = 2, codebookSize = 4, iters = 2)
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  test("pqTopK: dense ranks, monotone scores, picks beat the corpus average") {
    val out = q("x_sim_pq_adc").persist()
    val vecs = Tables(spark, sf, "embeddings")
    // 5 queries × 5 dense ranks
    val shape = out.groupBy("q_id").agg(count(lit(1)).as("n"),
      min("srank").as("mn"), max("srank").as("mx"))
    assert(shape.filter(col("n") =!= 5 || col("mn") =!= 1L ||
      col("mx") =!= 5L).count() == 0)
    // ADC scores are non-increasing with rank inside each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("srank")
    assert(out.withColumn("prev", lag("adc_e6", 1).over(w))
      .filter(col("prev").isNotNull && col("adc_e6") > col("prev"))
      .count() == 0)
    // accuracy: ADC approximates the INNER PRODUCT, so each query's
    // picks must beat the query's corpus-average true inner product —
    // the approximation carries signal in its own metric
    val qv = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ip = vecs.crossJoin(qv).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.Similarity.dot(col("embedding"), col("q_vec"))
          .as("ip"))
    val corpusAvg = ip.groupBy("q_id").agg(avg("ip").as("avg_all"))
    val pickAvg = out.join(ip, Seq("q_id", "vec_id"))
      .groupBy("q_id").agg(avg("ip").as("avg_pick"))
    assert(pickAvg.join(corpusAvg, "q_id")
      .filter(col("avg_pick") <= col("avg_all")).count() == 0)
    // deterministic under repartitioning
    val re = SimilaritySearch.pqTopK(vecs.repartition(7), nQueries = 5,
      k = 5, m = 2, codebookSize = 16, iters = 2)
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
    out.unpersist()
  }

  test("pqTopK serving width: one broadcast LUT join, identical to literal path") {
    val vecs = Tables(spark, sf, "embeddings")
    // 64 queries through the broadcast-LUT path: plan width must be
    // O(1) — exactly one join node (the tiny LUT broadcast), not a
    // 64-branch union of scoring projections
    val wide = SimilaritySearch.pqTopK(vecs, nQueries = 64,
      k = 5, m = 2, codebookSize = 16, iters = 2).persist()
    assert(wide.select("q_id").distinct().count() == 64)
    val plan = wide.queryExecution.executedPlan.toString
    val nJoins = "Join".r.findAllIn(plan).length
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast LUT join:\n${plan.take(2000)}")
    assert(nJoins <= 2, s"plan width grew with nQueries ($nJoins joins)")
    assert(!plan.contains("Union"),
      "serving path must not union per-query branches")
    // training is query-count-independent, so the two paths must agree
    // exactly on the overlapping queries
    val narrow = SimilaritySearch.pqTopK(vecs, nQueries = 5,
      k = 5, m = 2, codebookSize = 16, iters = 2)
    val overlap = wide.filter(col("q_id") < 5)
    assert(overlap.exceptAll(narrow).count() == 0 &&
      narrow.exceptAll(overlap).count() == 0)
    wide.unpersist()
  }

  test("domainUpsample repeats low-resource groups at exactly the e3 rate") {
    // 8 docs of lang a, 2 of b: r_a = 1.0 (largest group), r_b =
    // sqrt(8/2) = 2.0 exactly — integral rates, so copy counts are
    // deterministic regardless of hash fate
    val df = ((0L until 8L).map(i => (i, "a")) ++
      Seq((100L, "b"), (101L, "b"))).toDF("doc_id", "lang")
    val counts = Curation.domainUpsample(df, "lang", maxRepeat = 4)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 8L).foreach(i => assert(counts(i) == 1L))
    assert(counts(100L) == 2L && counts(101L) == 2L)
    // the cap bites: maxRepeat = 1 degenerates to the identity pass
    assert(Curation.domainUpsample(df, "lang", maxRepeat = 1).count() == 10)
    // declared query: every doc emits between 1 and maxRepeat copies
    val mult = q("x_domain_upsample").groupBy("doc_id").count()
    assert(mult.filter(col("count") < 1 || col("count") > 4).count() == 0)
  }

  test("budgetSelect keeps exactly the greedy best-quality prefix per lang") {
    val out = q("x_budget_select").persist()
    assert(out.groupBy("lang").agg(max("cum_tokens").as("m"))
      .filter(col("m") > 3000L).count() == 0)
    // brute-force the expected kept set: per lang, quality-desc
    // (doc_id tie-break) running token sum within budget
    val docsDf = Tables(spark, sf, "documents")
    val langOf = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qual = TextAnalysis.qualityScore(docsDf)
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = qual.groupBy(t => langOf(t._1)).flatMap { case (_, g) =>
      var cum = 0L
      g.sortBy(t => (-t._3, t._1)).iterator
        .takeWhile { t => cum += t._2; cum <= 3000L }.map(_._1)
    }.toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      expected)
    out.unpersist()
  }

  test("BPE training learns the classic merge sequence on a crafted corpus") {
    // Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    // widest:3}; the 5 merges (with the (w desc, pair asc) tie-break)
    // are hand-derivable
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val corpus = Seq((0L, text)).toDF("doc_id", "text")
    val vocab = graft.operators.Bpe.wordVocab(corpus)
    val merges = graft.operators.Bpe.train(vocab, iterations = 5)
    assert(merges.map(m => (m.iteration, m.pair, m.merged, m.weight)) ==
      Seq((1L, "e s", "es", 9L), (2L, "es t", "est", 9L),
        (3L, "l o", "lo", 7L), (4L, "lo w", "low", 7L),
        (5L, "e w", "ew", 6L)))
    val seg = graft.operators.Bpe.segment(vocab, merges).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg == Map("low" -> "low", "lower" -> "low e r",
      "newest" -> "n ew est", "widest" -> "w i d est"))
  }

  test("BPE merge application is the canonical left-to-right fold") {
    // overlapping chain: every occurrence merges in one pass
    val vocab = Seq(("asasas", 1L)).toDF("word", "freq")
    val row = graft.operators.Bpe.segment(
      vocab, Seq(graft.operators.Bpe.Merge(1L, "a s", "as", 0L))).head()
    assert(row.getString(2) == "as as as")
    assert(row.getInt(3) == 3)
  }

  test("BPE self-pair merge over a repeated-symbol run matches canonical BPE") {
    // 'aaaaa' under merge (a,a): canonical left-to-right non-overlapping
    // fold pairs tokens (1,2) and (3,4), leaving token 5 → [aa, aa, a].
    // A single-space representation's replace would shift the second
    // match one token right ([aa, a, aa]) — the double-space invariant
    // is what makes the run merge canonically.
    val vocab = Seq(("aaaaa", 1L), ("aaaa", 1L), ("aaa", 1L))
      .toDF("word", "freq")
    val seg = graft.operators.Bpe.segment(
        vocab, Seq(graft.operators.Bpe.Merge(1L, "a a", "aa", 0L)))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg == Map(
      "aaaaa" -> "aa aa a", "aaaa" -> "aa aa", "aaa" -> "aa a"))
    // and a second self-pair iteration stacks canonically: aa aa → aaaa
    val seg2 = graft.operators.Bpe.segment(
        vocab, Seq(graft.operators.Bpe.Merge(1L, "a a", "aa", 0L),
          graft.operators.Bpe.Merge(2L, "aa aa", "aaaa", 0L)))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg2 == Map(
      "aaaaa" -> "aaaa a", "aaaa" -> "aaaa", "aaa" -> "aa a"))
  }

  test("declared BPE queries materialize with the declared schemas") {
    val t = q("x_bpe_train")
    assert(t.columns.toSeq == Seq("iteration", "pair", "merged", "weight"))
    assert(t.count() == 5)
    assert(q("x_bpe_segment").columns.toSeq ==
      Seq("word", "freq", "n_symbols", "segmented"))
  }

  test("x_dedup_exact_sql is plan- and value-identical to the operator form") {
    val sqlForm = q("x_dedup_exact_sql")
    val dfForm = q("x_dedup_exact")
    def shape(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      Map("agg" -> "HashAggregate".r.findAllIn(s).size,
        "exch" -> "Exchange".r.findAllIn(s).size)
    }
    val s1 = shape(sqlForm)
    assert(s1 == shape(dfForm), s"shapes diverged: $s1")
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("Expectations.validate counts nulls, dupes and orphans on a crafted frame") {
    import graft.operators.Expectations._
    val df = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (2L, Option("z"))).toDF("k", "v")
    val ref = Seq(Tuple1(1L)).toDF("rk")
    val res = validate(df, Seq(
      NotNull("v_notnull", "v"),
      Unique("k_unique", "k"),
      InSet("v_allowed", "v", Seq("a")),
      RefIntegrity("k_in_ref", "k", ref, "rk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(res("v_notnull") == ((1L, false)))
    assert(res("k_unique") == ((1L, false)))   // k=2 appears twice
    assert(res("v_allowed") == ((2L, false)))  // NULL and "z" both fail
    assert(res("k_in_ref") == ((2L, false)))   // both k=2 rows orphaned
  }

  test("Expectations.RefIntegrity resolves when fact and ref share the column name") {
    import graft.operators.Expectations._
    // the common FK shape: both sides call the key 'customer_id' —
    // unaliased join columns would be ambiguous at analysis time
    val fact = Seq(1L, 2L, 3L).toDF("customer_id")
    val ref = Seq(1L, 3L).toDF("customer_id")
    val res = validate(fact,
      Seq(RefIntegrity("fk", "customer_id", ref, "customer_id")))
      .collect()
    assert(res.length == 1 && res(0).getLong(1) == 1L) // key 2 orphaned
  }

  test("simHashes drops null-text docs (aggregate-form contract)") {
    val docs = Seq((1L, "a b c"), (2L, null), (3L, "x y"))
      .toDF("doc_id", "text")
    import graft.operators.Dedup
    assert(Dedup.simHashes(docs).count() == 2)
    assert(Dedup.simHashes64(docs).count() == 2)
    assert(Dedup.simHashes(docs).filter(col("simhash").isNull).count() == 0)
  }

  test("x_expect_constraints exercises both verdict paths on real data") {
    val res = q("x_expect_constraints")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(res("completeness_custkey") == ((0L, true)))
    assert(res("uniqueness_orderkey") == ((0L, true)))
    assert(res("ri_custkey") == ((0L, true)))
    // tuned to fail on this data: 'P' orders and prices above 450k exist
    assert(res("accepted_status")._1 > 0 && !res("accepted_status")._2)
    assert(res("range_totalprice")._1 > 0 && !res("range_totalprice")._2)
  }

  test("x_split_leakage: clusters never straddle the cluster-keyed split") {
    val rows = q("x_split_leakage").collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    val byRep = rows.groupBy(_.getAs[Long]("rep_id"))
    // the whole point: one split per cluster
    assert(byRep.values.forall(_.map(_.getAs[String]("split")).toSet.size == 1))
    // the leak audit is a per-cluster fact, consistent across members,
    // and true exactly when the naive per-doc split straddles the cluster
    assert(byRep.values.forall { g =>
      val naive = g.map(_.getAs[String]("naive_split")).toSet
      g.map(_.getAs[Boolean]("cluster_leaky")).toSet ==
        Set(naive.size > 1)
    })
  }

  test("x_entity_resolve: canonical min-id entities with consistent sizes") {
    val rows = q("x_entity_resolve").collect()
    // entity id is the minimum record id of its cluster
    assert(rows.forall(r =>
      r.getAs[Long]("entity_id") <= r.getAs[Long]("rec_id")))
    // declared entity_size equals actual membership, for every entity
    val byEnt = rows.groupBy(_.getAs[Long]("entity_id"))
    assert(rows.forall(r =>
      r.getAs[Long]("entity_size") ==
        byEnt(r.getAs[Long]("entity_id")).length))
    // dirty variants (offset ids) resolve: some entities hold >= 2 records
    assert(byEnt.values.count(_.length >= 2) > 10)
  }

  test("x_bm25_rank: consecutive ranks, monotone scores, hits hold a term") {
    val out = q("x_bm25_rank").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq)
    val scores = out.map(_.getDouble(2))
    assert(scores.iterator.sliding(2).withPartial(false)
      .forall(p => p(0) >= p(1)), "scores must be non-increasing by rank")
    val terms = Set("table", "scan", "order")
    val text = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(text(r.getLong(0)).split(" ", -1).exists(terms.contains),
        s"doc ${r.getLong(0)} ranked without holding any query term")
    }
  }

  test("x_bm25_rank: matches a driver-side brute force bit-for-bit") {
    val terms = Seq("table", "scan", "order")
    val (k1, b) = (1.2, 0.75)
    val docsT = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docsT.length
    val dl = docsT.map { case (id, t) => id -> t.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf = docsT.map { case (id, t) =>
      id -> terms.map(q => q -> t.count(_ == q).toLong).toMap
    }.toMap
    val dfT = terms.map(q =>
      q -> tf.values.count(m => m(q) > 0).toLong).toMap
    def contrib(id: Long, q: String): Double = {
      val tfd = tf(id)(q).toDouble
      val idf = Math.log(1.0 + (n.toDouble - dfT(q) + 0.5) / (dfT(q) + 0.5))
      idf * (tfd * (k1 + 1.0)) /
        (tfd + k1 * ((1.0 - b) + b * dl(id).toDouble / avgdl))
    }
    val expected = dl.keys.toSeq
      .filter(id => terms.exists(q => tf(id)(q) > 0))
      .map { id =>
        val raw = terms.map(q => if (tf(id)(q) > 0) contrib(id, q) else 0.0)
          .reduceLeft(_ + _)
        val score = BigDecimal(raw)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, dl(id), score)
      }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(20)
      .zipWithIndex
      .map { case ((id, d, s), i) => (id, d, s, i + 1L) }
    val got = q("x_bm25_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("x_colloc_pmi: matches a driver-side brute force bit-for-bit") {
    val texts = Tables(spark, sf, "documents").select("text")
      .collect().map(_.getString(0).split(" ", -1))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { w =>
      w.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      w.iterator.sliding(2).withPartial(false).foreach { p =>
        val k = (p(0), p(1)); big(k) = big.getOrElse(k, 0L) + 1
      }
    }
    val t = uni.values.sum
    val bSum = big.values.sum
    val expected = big.toSeq
      .filter(_._2 >= 5L)
      .map { case ((w1, w2), cAb) =>
        val raw = Math.log(
          (cAb.toDouble * t * t) / (bSum.toDouble * uni(w1) * uni(w2)))
        val pmi = BigDecimal(raw)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (w1, w2, cAb, pmi)
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(30)
      .zipWithIndex
      .map { case ((w1, w2, c, p), i) => (w1, w2, c, p, i + 1L) }
    val got = q("x_colloc_pmi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("x_url_canon: variant families merge, distinct articles stay apart") {
    // independent driver-side canonicalization of the same injected
    // variants (string ops, not parse_url — a parse_url quirk would
    // surface as a mismatch)
    val ids = Tables(spark, sf, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    def inject(id: Long): String = {
      val b = id % 50
      (id % 3) match {
        case 0 => s"HTTPS://WWW.Host$b.COM:443/Articles/Item?utm_source=feed&b=2&a=1"
        case 1 => s"https://www.host$b.com/Articles/Item?b=2&a=1&utm_campaign=x"
        case _ => s"https://www.host$b.com/Articles/Item2/?a=1&b=2"
      }
    }
    def canon(url: String): String = {
      val Array(scheme, rest) = url.split("://", 2)
      val slash = rest.indexOf('/')
      val hostport = rest.substring(0, slash)
      val pathq = rest.substring(slash)
      val host = hostport.replaceAll(":[0-9]+$", "").toLowerCase
      val qMark = pathq.indexOf('?')
      val (path0, qs) =
        if (qMark == -1) (pathq, "")
        else (pathq.substring(0, qMark), pathq.substring(qMark + 1))
      val path = path0.replaceAll("/+$", "")
      val kept = qs.split("&").filterNot(_.startsWith("utm_")).sorted
      scheme.toLowerCase + "://" + host + path +
        (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
    }
    val expected = ids.map(id => id -> canon(inject(id)))
      .groupBy(_._2)
      .map { case (c, rows) =>
        (c, rows.length.toLong, rows.map(_._1).min)
      }.toSet
    val got = q("x_url_canon").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // residues 0 and 1 of the same base collapse to ONE key; the
    // Item2 article never merges with the Item family
    val keys = got.map(_._1)
    assert(keys.exists(_.endsWith("/Articles/Item?a=1&b=2")))
    assert(keys.exists(_.endsWith("/Articles/Item2?a=1&b=2")))
    assert(keys.forall(k => k.startsWith("https://www.host") &&
      !k.contains(":443") && !k.contains("utm_")))
  }

  test("incremental dedup: batch-only survivors, corpus content filtered") {
    // corpus-vs-batch membership is hash-fated on doc_id; recompute the
    // same fate driver-side and assert the survivor set exactly
    val docs = Tables(spark, sf, "documents")
    val fate = docs.select(col("doc_id"),
        (graft.functions.Hashing.hash32(
          concat(lit("incr:"), col("doc_id").cast("string"))) % 10 === 0)
          .as("is_batch"),
        lower(regexp_replace(col("text"), "\\s+", " ")).as("norm"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    val corpusContent = fate.filter(!_._2).map(_._3).toSet
    val batch = fate.filter(_._2)
    val expected = batch.groupBy(_._3).collect {
      case (norm, rows) if !corpusContent(norm) => rows.map(_._1).min
    }.toSet
    val got = q("x_dedup_incremental").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
    // every survivor is a batch member (LEFT ANTI kept no corpus row)
    val batchIds = batch.map(_._1).toSet
    assert(got.subsetOf(batchIds))
  }

  test("within-doc span dedup: repeated unit drops, clean doc untouched") {
    val crafted = Seq(
      // unit(0) == unit(2) == "a b c d e" → one drop, 10 kept tokens
      (0L, "a b c d e f g h i j a b c d e", "en", "s", 29L),
      // no repetition; 7 tokens → units of 5 + 2, nothing drops
      (1L, "p q r s t u v", "en", "s", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.withinDocSpanDedup(crafted, w = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(0L) == ((3L, 2L, 1L, 10L)))
    assert(rows(1L) == ((2L, 2L, 0L, 7L)))
    // query layer: every doc_id % 3 == 0 row has its injected dup
    // dropped; other rows keep everything
    q("x_dedup_within_doc").collect().foreach { r =>
      val (id, dropped) = (r.getLong(0), r.getLong(3))
      if (id % 3 == 0) assert(dropped >= 1)
      assert(r.getLong(1) - dropped == r.getLong(2))
    }
  }

  test("preference pairs: mirror ranks never pair a doc with itself") {
    val pairs = q("x_pref_pairs").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (chosen, rejected) = (r.getLong(2), r.getLong(3))
      val (qc, qr, gap) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(chosen != rejected)
      assert(qc > qr && gap > 0)
      assert(math.abs(gap - BigDecimal(qc - qr)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // at most maxPairs=3 per group, pair_idx dense from 1
    pairs.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val idxs = rs.map(_.getLong(1)).sorted
      assert(idxs.length <= 3 && idxs.head >= 1L)
    }
  }

  test("importance resampling selects target-like docs, k = 20% of corpus") {
    val docs = Tables(spark, sf, "documents")
    val n = docs.count()
    val sel = q("x_select_dsir").collect()
    assert(sel.length == math.max(1L, n * 20 / 100))
    // ranks are dense 1..k and scores non-increasing along the rank
    val byRank = sel.sortBy(_.getLong(4))
    assert(byRank.map(_.getLong(4)).toSeq == (1L to sel.length).toSeq)
    val scores = byRank.map(_.getDouble(3)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the target language must be over-represented among the selected
    // relative to the corpus (that is the entire point of DSIR)
    val enCorpus = docs.filter(col("lang") === "en").count().toDouble / n
    val enSel = byRank.count(_.getString(1) == "en").toDouble / sel.length
    assert(enSel > enCorpus,
      s"selected en fraction $enSel not above corpus fraction $enCorpus")
  }

  test("image aHash: real BMP parse, integer hash replayed by hand") {
    import graft.operators.Multimodal
    val half = "a" * 50 + "z" * 50
    val crafted = Seq(
      (0L, "a" * 100, "en", "s", 100L),  // BMP, uniform bytes
      (5L, "a" * 100, "en", "s", 100L),  // BMP, same pixels as doc 0
      (10L, half, "en", "s", 100L),      // BMP, two-tone
      (1L, "x" * 80, "en", "s", 80L)     // residue 1 → WAV, not hashed
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.imageAHash(spark, crafted).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows.keySet == Set(0L, 5L, 10L))
    // parsed header fields equal the packer's formulas
    assert(rows(0L).width == 101L && rows(0L).height == 1L
      && rows(0L).n_pix == 100L)
    // uniform pixels: every block mean == global mean → no bit set
    assert(rows(0L).ahash32 == 0L)
    // identical pixels hash identically regardless of doc id
    assert(rows(5L).ahash32 == rows(0L).ahash32)
    // hand-replay of the integer rule for the two-tone payload
    val v = half.getBytes("UTF-8").map(_ & 0xff)
    val l = v.length
    val sums = new Array[Long](32); val cnts = new Array[Long](32)
    v.zipWithIndex.foreach { case (x, j) =>
      val blk = j * 32 / l; sums(blk) += x; cnts(blk) += 1
    }
    val gmean = v.map(_.toLong).sum / l
    val expected = (0 until 32).foldLeft(0L) { (acc, i) =>
      if (cnts(i) > 0 && sums(i) / cnts(i) > gmean) acc | (1L << i) else acc
    }
    assert(expected != 0L && rows(10L).ahash32 == expected)
    // corpus: exactly the BMP-residue docs are hashed
    val docs = Tables(spark, sf, "documents")
    assert(q("x_image_phash").count() ==
      docs.filter(col("doc_id") % 5 === 0).count())
    // the oracle's codepoints-equal-bytes PRECONDITION: the corpus is
    // pure ASCII and n_chars is the text length — if the generator
    // ever emits multi-byte text this fails here, not as a silent
    // cross-engine hash drift
    assert(docs.filter(
      length(col("text")) =!= col("n_chars") ||
        !col("text").rlike("^[\\x00-\\x7F]*$")).count() == 0L)
  }

  test("audio fingerprint: energy-delta bits replayed by hand") {
    import graft.operators.Multimodal
    // residue 1 → WAV container; ascending chars → ascending samples →
    // ascending frame energies → every delta bit set
    val asc = ('a' to 'z').mkString("")  // 26 chars → 13 samples → 3 frames
    val crafted = Seq(
      (1L, asc, "en", "s", 26L),
      (6L, "a" * 24, "en", "s", 24L),    // constant energy → no bit set
      (0L, asc, "en", "s", 26L)          // residue 0 → BMP, not fingerprinted
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.audioFingerprint(spark, crafted, frameSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 6L))
    assert(rows(6L)._2 == 0L)
    // hand-replay doc 1: ch = 2, data truncated to whole 4-byte blocks
    val bytes = asc.getBytes("UTF-8")
    val dataLen = bytes.length - bytes.length % 4
    val samples = (0 until dataLen / 2).map(g =>
      ((bytes(2 * g) & 0xff) | ((bytes(2 * g + 1).toInt) << 8)).toShort.toInt)
    val energies = samples.grouped(4).filter(_.length == 4)
      .map(fr => fr.map(s => s.toLong * s).sum).toSeq
    val expected = energies.zipWithIndex.drop(1).foldLeft(0L) {
      case (acc, (e, i)) =>
        if (i <= 32 && e > energies(i - 1)) acc | (1L << (i - 1)) else acc
    }
    assert(rows(1L) == ((energies.length.toLong, expected)) && expected != 0L)
    // corpus: exactly the WAV-residue docs are fingerprinted
    val docs = Tables(spark, sf, "documents")
    assert(q("x_audio_fp").count() ==
      docs.filter(col("doc_id") % 5 === 1).count())
  }

  test("phash pairs: blocked pairing equals all-pairs Hamming ground truth") {
    import graft.operators.{Dedup, Multimodal}
    val hs = Multimodal.imageAHash(
      spark, Tables(spark, sf, "documents")).toDF().cache()
    val a = hs.select(col("doc_id").as("d1"), col("ahash32").as("h1"))
    val b = hs.select(col("doc_id").as("d2"), col("ahash32").as("h2"))
    val brute = a.crossJoin(b).filter(col("d1") < col("d2"))
      .filter(expr("bit_count(h1 ^ h2)") <= 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.hammingPairs32(hs, "doc_id", "ahash32", 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute && brute.nonEmpty)
    // identical pixel payloads pair at distance 0
    import spark.implicits._
    val twins = Seq(
      (0L, "p q r s t u v w x y", "en", "s", 19L),
      (5L, "p q r s t u v w x y", "en", "s", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = Dedup.hammingPairs32(
      Multimodal.imageAHash(spark, twins).toDF(), "doc_id", "ahash32", 0)
      .collect()
    assert(p.length == 1 && p.head.getLong(2) == 0L)
    hs.unpersist()
  }

  test("ccnet composition: dedup removes all replicas, tertiles balance") {
    val nDocs = Tables(spark, sf, "documents").count()
    val out = q("x_pipeline_ccnet").collect()
    // every injected replica (doc_id >= 10M) is an exact dup of an
    // original, so dedup must remove exactly the injected mass and
    // keep-min must keep only original ids
    assert(out.length.toLong == nDocs)
    assert(out.forall(_.getLong(0) < 10000000L))
    // ntile contract: within each predicted language the three bucket
    // sizes differ by at most one
    out.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getString(4)).view.mapValues(_.length)
      val counts = Seq("head", "middle", "tail").map(b => sizes.getOrElse(b, 0))
      assert(counts.max - counts.min <= 1, s"unbalanced tertiles: $counts")
      // head scores dominate tail scores within the language
      val byB = rs.groupBy(_.getString(4)).view
        .mapValues(_.map(_.getDouble(3))).toMap
      for (h <- byB.get("head"); t <- byB.get("tail"))
        assert(h.min >= t.max - 1e-9)
    }
  }

  test("triangle counts: crafted graph exact, corpus census consistent") {
    import graft.operators.GraphRank
    // triangle {1,2,3} plus pendant edge (3,4)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("d1", "d2")
    val got = GraphRank.triangleCounts(pairs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.3333)))
    assert(got(4L) == ((1L, 0L, 0.0)))
    // corpus: every triangle contributes to exactly 3 vertices
    val census = q("x_graph_triangles").collect()
    assert(census.map(_.getLong(2)).sum % 3 == 0)
  }

  test("keepbest: the kept member maximizes quality within its cluster") {
    val quality = q("x_quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val members = q("x_dedup_cluster").collect()
      .map(r => (r.getLong(1), r.getLong(0))) // (rep_id, doc_id)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val kept = q("x_dedup_keepbest").collect()
    assert(kept.nonEmpty && kept.length == members.size)
    kept.foreach { r =>
      val (rep, keptId, keptQ, n) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val ms = members(rep)
      assert(ms.length.toLong == n)
      val best = ms.map(m => (quality(m), -m)).max
      assert(keptId == -best._2 && keptQ == best._1)
    }
  }

  test("winsorize: hand-computed interpolated bounds and means") {
    import graft.operators.Stats
    val vals = (1 to 100).map(v => ("g", v.toDouble))
      .toDF("grp", "value")
    val r = Stats.winsorize(vals, "grp", "value").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 100L)
    assert(row.getDouble(2) == 50.5)      // mean_raw
    assert(row.getDouble(3) == 50.5)      // symmetric clip → same mean
    assert(row.getLong(4) == 10L)         // 5 clamped each side
    assert(row.getDouble(5) == 5.95 && row.getDouble(6) == 95.05)
  }

  test("weighted sample: deterministic and biased toward heavy docs") {
    val docs = Tables(spark, sf, "documents")
    val sel = q("x_sample_weighted").collect()
    assert(sel.length == 50)
    val again = q("x_sample_weighted").collect()
    assert(sel.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // expectation: heavier docs win more often, so the mean selected
    // weight exceeds the corpus mean
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val selMean = sel.map(_.getLong(1)).sum.toDouble / sel.length
    assert(selMean > corpusMean,
      s"selected mean weight $selMean not above corpus $corpusMean")
  }

  test("lshBandPlan: survivor model matches both committed rehearsal points; budget binds where occupancy can't") {
    import graft.operators.SimilaritySearch
    // estimator vs the committed SCALE_REHEARSAL.json measurements,
    // each at ITS OWN committed band config, minus the constructed
    // true-pair mass (2,000 source vecs × C(10,2) = 90,000
    // verbatim-family pairs at both scales):
    // 100× (4 bands of 16): 125,176 − 90,000 = 35,176;
    // 1000× (3 bands of 20): 537,614 − 90,000 = 447,614
    val p100 = SimilaritySearch.lshRandomSurvivors(200000L, 64, 0.4, 16, 4)
    assert(p100 > 35176 / 2.0 && p100 < 35176 * 2.0, s"100x prediction $p100")
    val p1000 = SimilaritySearch.lshRandomSurvivors(2000000L, 64, 0.4, 20, 3)
    assert(p1000 > 447614 / 2.0 && p1000 < 447614 * 2.0,
      s"1000x prediction $p1000")
    // monotone the right way: wider bands shrink survivors, corpus
    // growth at fixed width grows them super-linearly
    assert(SimilaritySearch.lshRandomSurvivors(200000L, 64, 0.4, 20, 4) < p100)
    assert(p1000 > p100)
    // planner re-derives both committed band WIDTHS from parameters
    // alone at the default budget (band count = the recall knob stays
    // the caller's)
    val plan100 = SimilaritySearch.lshBandPlan(200000L, 64, 0.4, bands = 4)
    assert(plan100.rowsPerBand == 16 && plan100.meetsTarget, plan100.toString)
    val plan1000 = SimilaritySearch.lshBandPlan(2000000L, 64, 0.4)
    assert(plan1000.rowsPerBand == 20 && plan1000.meetsTarget,
      plan1000.toString)
    // the survivor budget binds where occupancy alone would stop
    // short: 19-bit bands already satisfy occupancy at 2M (depth 3.8)
    // but predict ~0.50 random survivors/row — the budget is what
    // pushes the plan to 20; tightening it to 0.3 pushes on to 21
    val tight = SimilaritySearch.lshBandPlan(
      2000000L, 64, 0.4, bands = 3, targetFanoutPerRow = 0.3)
    assert(tight.rowsPerBand == 21 && tight.meetsTarget, tight.toString)
    // and loosening past 19's prediction stops at 19
    val loose = SimilaritySearch.lshBandPlan(
      2000000L, 64, 0.4, bands = 3, targetFanoutPerRow = 0.6)
    assert(loose.rowsPerBand == 19 && loose.meetsTarget, loose.toString)
    // infeasible budget: capped at 64/bands, meetsTarget = false,
    // predictions filled in so the caller can decide
    val infeasible = SimilaritySearch.lshBandPlan(
      2000000L, 64, 0.05, bands = 3, targetFanoutPerRow = 1e-9)
    assert(!infeasible.meetsTarget && infeasible.rowsPerBand == 21,
      infeasible.toString)
    assert(infeasible.predictedRandomSurvivorsPerRow > 1e-9)
  }

  test("x_text_nfc: injected decomposed runs compose, rest untouched") {
    val out = q("x_text_nfc").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, norm) = (r.getLong(0), r.getString(1))
      val (before, after) = (r.getLong(2), r.getLong(3))
      (id % 3) match {
        case 0 =>
          // one combining acute composes away
          assert(after == before - 1 && norm.endsWith("Café"))
        case 1 =>
          // ring + diaeresis both compose
          assert(after == before - 2 && norm.endsWith("Ångström"))
        case _ =>
          // pure-ASCII rows are NFC fixed points
          assert(after == before && norm.forall(_ < 128))
      }
    }
  }
}
