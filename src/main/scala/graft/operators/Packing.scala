package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Hashing

/** Sequence packing — the "concatenate the shuffled corpus and cut it
  * into fixed-size context windows" step every LLM pre-training pipeline
  * runs between curation and the trainer.
  *
  * Semantics: order documents by a deterministic content-independent
  * hash (the global shuffle — RNG-free and partition-invariant, same
  * convention as [[Curation]] splits), lay their token streams
  * end-to-end, and cut the concatenation at `budget`-token boundaries.
  * Each document is assigned the window its FIRST token lands in:
  * (pack_id, pack_off) = (start / budget, start % budget) where `start`
  * is the document's global token offset. Documents spanning a boundary
  * keep their starting window (the trainer's sharder decides spill
  * policy; the offsets carry all the information it needs).
  *
  * The global prefix sum is the scale hazard: the obvious
  * `sum() OVER (ORDER BY h)` window plans a SINGLE-PARTITION sort —
  * unusable beyond one machine. This implementation is the two-phase
  * form (same pattern as [[DenseId.withDenseId]]):
  *
  *   1. range-repartition + sort within partitions by (h, doc_id) —
  *      Spark's distributed sort, no global single task;
  *   2. per-partition token totals (one number per partition) to the
  *      driver — O(partitions), not O(rows);
  *   3. each partition streams its rows once more, adding its exclusive
  *      prefix offset to a running local sum.
  *
  * Cost: one range shuffle + two passes over the sorted partitions
  * (the frame is persisted between them). Nothing is ever
  * driver-materialized except the partition totals.
  */
object Packing {

  /** Pack `docs` into `budget`-token windows.
    *
    * Output: (doc_id, n_tokens, start_tok, pack_id, pack_off), one row
    * per input document. Tokens are whitespace tokens (the
    * [[TextAnalysis.tokenCounts]] `ws_tokens` convention). */
  def packSequences(docs: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, "packSequences needs a positive token budget")
    val spark = docs.sparkSession
    val prepped = docs.select(
      col("doc_id"),
      Hashing.hash32(concat(lit("pack:"), col("doc_id"))).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val sorted = prepped
      .repartitionByRange(col("h"), col("doc_id"))
      .sortWithinPartitions("h", "doc_id")
      .persist() // phase 2 and phase 3 both stream these partitions
    val tokIdx = sorted.schema.fieldIndex("n_tokens")
    // phase 2: one long per partition to the driver
    val partTotals = sorted.rdd
      .mapPartitionsWithIndex { case (pid, rows) =>
        var s = 0L; rows.foreach(r => s += r.getLong(tokIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per pid
    val bcast = spark.sparkContext.broadcast(offsets)
    val b = budget.toLong
    val outSchema = sorted.schema
      .add("start_tok", LongType, nullable = false)
      .add("pack_id", LongType, nullable = false)
      .add("pack_off", LongType, nullable = false)
    // phase 3: local running sum + broadcast offset — embarrassingly
    // parallel, emits in one pass
    val packed = sorted.rdd.mapPartitionsWithIndex { case (pid, rows) =>
      var run = bcast.value(pid)
      rows.map { r =>
        val start = run
        run += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ start :+ (start / b) :+ (start % b))
      }
    }
    spark.createDataFrame(packed, outSchema)
      .select("doc_id", "n_tokens", "start_tok", "pack_id", "pack_off")
  }

  /** Export the packed corpus as PHYSICAL training shards — the
    * last-mile artifact a trainer consumes ([[packSequences]] computes
    * the layout; this lands it).
    *
    * Each document goes to the shard its first token lands in
    * (`pack_id` at budget = `shardTokens` — production shards are
    * token-budgeted, not row-counted, so every shard carries ~equal
    * training signal regardless of document length skew). The payload
    * is written hive-partitioned by `shard_id` with ONE file per shard
    * (`repartition(shard_id)` co-locates each shard in one task before
    * the partitioned write — no small-file debris for
    * [[Maintenance.compactDir]] to clean later), and the returned
    * MANIFEST is aggregated from the LANDED files, not the plan: rows
    * that did not survive the write cannot appear in it. Manifest
    * carries a portable per-shard CONTENT fingerprint — bit_xor of
    * hash32 over `doc_id:text`, engine-reproducible — so a consumer
    * can verify both shard membership and payload integrity (a
    * corrupted or truncated text fails the check, not just a missing
    * doc) without re-reading the corpus; being an order-insensitive
    * xor it cannot see a doc duplicated an EVEN number of times, which
    * `n_docs` catches as count drift.
    *
    * Scale notes: layout cost is [[packSequences]] (one range shuffle
    * + two streamed passes); the export adds one doc_id equi-join
    * (sort-merge on the corpus's natural key) and one shard_id
    * exchange feeding the write. Shard count = total tokens /
    * `shardTokens` — pick GB-scale budgets in production so the
    * output file count stays O(corpus / GB). */
  def exportShards(
      docs: DataFrame, shardTokens: Int, outDir: String): DataFrame = {
    val layout = packSequences(docs, budget = shardTokens)
      .select(col("doc_id"), col("n_tokens"),
        col("pack_id").as("shard_id"))
    docs.select(col("doc_id"), col("text"))
      .join(layout, "doc_id")
      .repartition(col("shard_id"))
      .write.partitionBy("shard_id")
      .mode("overwrite").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        expr(s"bit_xor(${Hashing.hash32Sql(
          "concat(cast(doc_id as string), ':', text)")})").as("doc_fp"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .withColumn("shard_id", col("shard_id").cast("long"))
  }
}
