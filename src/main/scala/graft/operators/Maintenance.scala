package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table maintenance: the jobs a 100 TB warehouse runs BETWEEN queries.
  *
  * The reference stages its outputs as write-once / CTAS-overwrite
  * tables (`fotmob-dag.py:179-183`, `create_looker_data_table.sql:1`)
  * and leaves their upkeep to the warehouse; this engine's own
  * streaming sinks land batchId-named segments and its incremental
  * operators persist write-new-then-swap generations
  * ([[graft.streaming.StreamOps]]). At scale both patterns demand the
  * two most-run maintenance jobs in any production lake:
  *
  *  1. '''Generational commits with time travel, rollback and
  *     retention''' — the swap's "old generation" is not garbage, it is
  *     the table's history: readers pinned to a snapshot, incident
  *     rollback, and audit all address it, until a retention vacuum
  *     reclaims it. [[commit]]/[[readGen]]/[[rollback]]/[[vacuum]]
  *     formalize the pattern the incremental operators already use,
  *     with an append-only parquet manifest as the commit log.
  *     Rollback is a MANIFEST POINTER, never a data copy (the
  *     Delta-`RESTORE` shape): a rollback commit records `data_gen` of
  *     the restored generation, and [[vacuum]] resolves pointers so a
  *     still-referenced directory survives reclamation.
  *
  *  2. '''Small-file compaction''' — streaming sinks produce one-file-
  *     per-trigger landings whose file COUNT, not byte volume, comes to
  *     dominate scan cost (driver listing, task scheduling, row-group
  *     overhead). [[compactDir]] is the `OPTIMIZE` shape: only files
  *     below `minFileBytes` are selected, bin-packed to ~`targetBytes`
  *     outputs, written first, swapped in, originals deleted. Files
  *     already at target are NEVER rewritten — re-running is a no-op
  *     (the fixpoint is the idempotence contract, pinned by
  *     MaintenanceSpec), so a scheduled compactor converges instead of
  *     churning the same bytes.
  *
  * Scale notes: the file inventory is driver-side METADATA (one
  * recursive listing — at warehouse scale the table format's manifest
  * serves it without touching the FS); the rewrite itself is
  * shuffle-free (`coalesce`, no exchange) and proportional to the
  * SMALL-file byte volume only. The file-level swap here stands in for
  * the table format's atomic commit: new files are fully written and
  * moved in before any original is deleted, so a crash mid-swap leaves
  * duplicates (re-runnable) rather than loss; under a manifest-backed
  * table the same two steps ride one atomic manifest flip — which is
  * exactly what [[commit]] provides when the two halves compose.
  */
object Maintenance {

  // ---------------------------------------------------------------
  // Generational table: append-only manifest + immutable gen dirs
  // ---------------------------------------------------------------

  /** Manifest schema: one row per commit. `action` ∈ commit | rollback
    * | vacuum; `data_gen` is the generation whose DIRECTORY holds this
    * commit's rows (= `gen` for a plain commit, the restored target
    * for a rollback, unused sentinel -1 for a vacuum audit row).
    *
    * Concurrency contract: SINGLE WRITER. The append-only parquet log
    * serializes history for any number of READERS (a reader never sees
    * a half-commit: data lands before the manifest row), but two
    * concurrent committers could both read `currentGen` = g and write
    * gen g+1 — a production deployment puts the append behind the
    * catalog's atomic swap (the maintenance loops in this engine are
    * single-writer by construction: one streaming query owns a root). */
  private val manifestSchema = StructType(Seq(
    StructField("gen", IntegerType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("data_gen", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  private def manifestDir(root: String) = s"$root/_manifest"
  private def genDir(root: String, g: Int) = f"$root/gen_$g%08d"

  private def appendManifest(
      spark: SparkSession, root: String, row: Row): Unit = {
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), manifestSchema)
    df.coalesce(1).write.mode("append").parquet(manifestDir(root))
  }

  /** The full commit log, oldest first. Empty frame on a fresh root. */
  def manifest(spark: SparkSession, root: String): DataFrame = {
    val fs = hadoopFs(spark, root)
    if (fs.exists(new Path(manifestDir(root))))
      spark.read.parquet(manifestDir(root)).orderBy("gen")
    else spark.createDataFrame(
      java.util.Collections.emptyList[Row](), manifestSchema)
  }

  /** Latest generation carrying data (commit or rollback), or 0 on a
    * fresh root. Driver-side: the manifest is KB-sized by design. */
  def currentGen(spark: SparkSession, root: String): Int = {
    val gens = manifest(spark, root)
      .filter(col("action").isin("commit", "rollback"))
      .agg(max("gen")).collect()(0)
    if (gens.isNullAt(0)) 0 else gens.getInt(0)
  }

  /** Write `df` as the next immutable generation, then append the
    * manifest row — data lands fully BEFORE the pointer flips, the
    * write-new-then-swap ordering every incremental operator in this
    * engine relies on. Returns the new generation id. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Int = {
    val g = currentGen(spark, root) + 1
    df.write.mode("overwrite").parquet(genDir(root, g))
    val n = spark.read.parquet(genDir(root, g)).count()
    appendManifest(spark, root, Row(g, "commit", g, n))
    g
  }

  /** Restore the table to `toGen` WITHOUT copying data: the new commit
    * row points its `data_gen` at the restored generation's directory.
    * History is never rewritten — the bad generations stay readable
    * (until vacuumed) and the restore itself is one manifest append. */
  def rollback(spark: SparkSession, root: String, toGen: Int): Int = {
    val m = manifest(spark, root)
      .filter(col("gen") === toGen &&
        col("action").isin("commit", "rollback"))
      .select("data_gen", "n_rows").collect()
    require(m.nonEmpty, s"rollback target gen=$toGen not in manifest")
    val g = currentGen(spark, root) + 1
    appendManifest(spark, root,
      Row(g, "rollback", m(0).getInt(0), m(0).getLong(1)))
    g
  }

  /** Resolve a generation to the directory that holds its rows
    * (following a rollback's pointer), then read it. Throws with the
    * generation named if it was vacuumed — a pinned reader must fail
    * loudly, not silently read an empty dir. */
  def readGen(spark: SparkSession, root: String, gen: Int): DataFrame = {
    val m = manifest(spark, root)
      .filter(col("gen") === gen &&
        col("action").isin("commit", "rollback"))
      .select("data_gen").collect()
    require(m.nonEmpty, s"gen=$gen not in manifest")
    val dataGen = m(0).getInt(0)
    val dir = genDir(root, dataGen)
    require(hadoopFs(spark, root).exists(new Path(dir)),
      s"gen=$gen (data_gen=$dataGen) was vacuumed; oldest retained " +
        s"generation is recorded in the manifest's vacuum rows")
    spark.read.parquet(dir)
  }

  /** Current table state = [[readGen]] of [[currentGen]]. */
  def readCurrent(spark: SparkSession, root: String): DataFrame =
    readGen(spark, root, currentGen(spark, root))

  /** Reclaim generation directories not reachable from the last
    * `keepLast` commits — "reachable" RESOLVES rollback pointers, so a
    * directory an in-retention rollback still references survives even
    * if its own commit has aged out. Appends an audit row per reclaimed
    * directory; returns the reclaimed generation ids. */
  def vacuum(
      spark: SparkSession, root: String, keepLast: Int): Seq[Int] = {
    val rows = manifest(spark, root)
      .filter(col("action").isin("commit", "rollback"))
      .select("gen", "data_gen").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    val retained = rows.takeRight(keepLast).map(_._2).toSet
    val fs = hadoopFs(spark, root)
    val reclaimed = rows.dropRight(keepLast)
      .map(_._2).distinct.filterNot(retained)
      .filter(g => fs.exists(new Path(genDir(root, g))))
    reclaimed.foreach { g =>
      fs.delete(new Path(genDir(root, g)), true)
      appendManifest(spark, root, Row(g, "vacuum", -1, 0L))
    }
    reclaimed.toSeq
  }

  /** Recursively reclaim a throwaway table root once its (pinned)
    * result no longer references it. */
  def deleteRoot(spark: SparkSession, root: String): Unit =
    hadoopFs(spark, root).delete(new Path(root), true)

  // ---------------------------------------------------------------
  // Small-file compaction (the OPTIMIZE shape)
  // ---------------------------------------------------------------

  /** Per-pool compaction outcome, driver-side metadata only. */
  final case class CompactStats(
      pools: Int, filesBefore: Long, filesRewritten: Long,
      filesWritten: Long, bytesRewritten: Long)

  private def hadoopFs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All data files under `dir`, recursively, honoring Spark's
    * hidden-path convention: a file is skipped if ANY path component
    * below `dir` starts with `_` or `.` (metadata files, staging dirs,
    * a generational root's `_manifest`). */
  private def dataFiles(fs: FileSystem, dir: String): Seq[FileStatus] = {
    val root = fs.makeQualified(new Path(dir))
    def hidden(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val out = Seq.newBuilder[FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (!hidden(st.getPath)) out += st
    }
    out.result()
  }

  /** Bin-pack the sub-`minFileBytes` files under `dir` into
    * ~`targetBytes` outputs; files already at size are left untouched.
    *
    *  - `perParent = false`: one pool across the whole tree — the
    *    LANDING-SEGMENT layout (batchId-named subdirs are micro-batch
    *    provenance, not partition semantics, so packing across them is
    *    sound; emptied segment dirs are removed).
    *  - `perParent = true`: one pool per leaf directory — the
    *    HIVE-PARTITION layout, where a file must stay under its
    *    partition path to keep its partition values (`OPTIMIZE` is
    *    always per-partition).
    *
    * Swap ordering: pack into a `_compact_tmp` staging dir (underscore
    * prefix → invisible to readers), MOVE the outputs into the pool,
    * and only then delete the originals — a crash between the two
    * steps leaves re-runnable duplicates, never loss. Compacted files
    * are named `compacted-<uuid>-…` so a re-run (or crash replay)
    * never collides. The rewrite is `coalesce`, not `repartition`:
    * compaction must not pay a shuffle to move bytes it is only
    * re-blocking.
    *
    * NOT safe under an ACTIVE checkpointed file-stream source watching
    * `dir`: Structured Streaming's file source tracks seen FILES by
    * path, so it would ingest the packed outputs as brand-new data
    * (duplicates) while the deleted originals break replay. Compact
    * only tables read by batch readers — landings whose ingest has
    * completed (the AvailableNow lifecycles in this engine tear down
    * their checkpoints with the run), or downstream generations. Under
    * a manifest-backed table the same rule is enforced by snapshot
    * isolation; on raw directories it is an operational contract. */
  def compactDir(
      spark: SparkSession, dir: String,
      targetBytes: Long, minFileBytes: Long,
      perParent: Boolean = false): CompactStats = {
    require(minFileBytes <= targetBytes,
      "minFileBytes must not exceed targetBytes")
    val fs = hadoopFs(spark, dir)
    val rootQ = fs.makeQualified(new Path(dir))
    val all = dataFiles(fs, dir)
    val pools = all.groupBy(st =>
      if (perParent) st.getPath.getParent else rootQ)
    var rewritten = 0L
    var written = 0L
    var bytes = 0L
    var nPools = 0
    pools.foreach { case (poolDir, files) =>
      val small = files.filter(_.getLen < minFileBytes)
      // one small file alone cannot be improved — fixpoint, not churn
      if (small.size >= 2) {
        nPools += 1
        val smallBytes = small.map(_.getLen).sum
        val nOut = math.max(1L,
          (smallBytes + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(poolDir, "_compact_tmp")
        fs.delete(tmp, true)
        spark.read
          .parquet(small.map(_.getPath.toString): _*)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val tag = java.util.UUID.randomUUID().toString.take(8)
        var k = 0
        dataFiles(fs, tmp.toString).foreach { st =>
          fs.rename(st.getPath,
            new Path(poolDir, s"compacted-$tag-$k.parquet"))
          k += 1
        }
        fs.delete(tmp, true)
        small.foreach(st => fs.delete(st.getPath, false))
        // reclaim segment dirs the pack emptied (flat-pool mode only)
        if (!perParent) {
          small.map(_.getPath.getParent).distinct
            .filter(p => p != poolDir)
            .filter(p => fs.listStatus(p).isEmpty)
            .foreach(p => fs.delete(p, false))
        }
        rewritten += small.size
        written += k
        bytes += smallBytes
      }
    }
    CompactStats(nPools, all.size.toLong, rewritten, written, bytes)
  }
}
