package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Shard-export specs: physical layout (one file per shard under its
  * hive path), manifest-vs-layout consistency, and the token-budget
  * cut semantics shared with packSequences. Oracle-verified end-to-end
  * by `x_export_shards`.
  */
class ExportSpec extends SparkSpec {

  test("exportShards lands one file per shard and an honest manifest") {
    val docs = Tables(spark, sf, "documents")
    val work = Files.createTempDirectory("graft_export_spec").toString
    val budget = 500
    val manifest = Packing.exportShards(docs, budget, s"$work/shards")
      .orderBy("shard_id").collect()

    // every document landed exactly once
    assert(manifest.map(_.getLong(1)).sum == docs.count())

    // shard id set = the layout's pack ids (a doc longer than the
    // budget legitimately skips whole windows, so density is NOT
    // asserted — only exact agreement with the computed layout)
    val ids = manifest.map(_.getLong(0))
    val layoutIds = Packing.packSequences(docs, budget)
      .select(col("pack_id")).distinct()
      .orderBy("pack_id").collect().map(_.getLong(0))
    assert(ids.toSeq == layoutIds.toSeq)

    // physical layout: one parquet file per shard_id=... directory
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$work/shards"), true)
    val byDir = scala.collection.mutable.Map[String, Int]()
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith("."))
        byDir.updateWith(st.getPath.getParent.getName) {
          c => Some(c.getOrElse(0) + 1)
        }
    }
    assert(byDir.keys.forall(_.startsWith("shard_id=")))
    assert(byDir.size == ids.length)
    assert(byDir.values.forall(_ == 1), s"multi-file shards: $byDir")

    // manifest agrees with the layout recomputed independently
    val layout = Packing.packSequences(docs, budget)
      .groupBy(col("pack_id").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("shard_id").collect()
    assert(layout.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      manifest.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)

    // token-budget cut semantics: a shard holds the docs STARTING in
    // its window, so its total is < budget + its largest spilling doc
    val maxDoc = Packing.packSequences(docs, budget)
      .agg(max("n_tokens")).head().getLong(0)
    assert(manifest.forall(_.getLong(2) < budget + maxDoc))

    // the fingerprint covers CONTENT (doc_id:text), not just
    // membership: recompute it from the raw corpus + the layout — a
    // landed shard with a corrupted payload could not match this
    val expFp = docs.select(col("doc_id"), col("text"))
      .join(Packing.packSequences(docs, budget)
        .select(col("doc_id"), col("pack_id").as("shard_id")), "doc_id")
      .groupBy("shard_id")
      .agg(expr(s"bit_xor(${graft.functions.Hashing.hash32Sql(
        "concat(cast(doc_id as string), ':', text)")})").as("fp"))
      .orderBy("shard_id").collect().map(_.getLong(1))
    assert(manifest.map(_.getLong(3)).toSeq == expFp.toSeq)
  }
}
