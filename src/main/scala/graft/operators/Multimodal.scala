package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract mirrors what an image/audio pipeline needs:
  *   - payloads travel as `BinaryType`, never as strings;
  *   - metadata is a typed struct column next to the blob;
  *   - decode / feature-extraction runs via `Dataset.mapPartitions` (the
  *     JVM analog of `mapInPandas`): one iterator per partition, so a
  *     real decoder would amortize codec/model initialization per batch,
  *     and partition sizing (`maxPartitionBytes`) bounds peak memory.
  *
  * The decode step itself is a STUB — no media codecs exist in this
  * environment — replaced by a deterministic function of the byte length
  * so the plumbing (schema, encoders, batch shape, partition behavior)
  * is fully real and testable end-to-end.
  */
object Multimodal {

  /** Input row for the decode stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)

  /** Decoded-metadata row produced by the stub decoder. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      lang: String)

  /** STUB decoder: deterministic pseudo-metadata from the byte length.
    * A real implementation would parse the container header / run a
    * decoder here, per batch. */
  private def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = n,
      width = n % 640,
      height = (n * 7) % 480,
      n_frames = n / 100,
      lang = r.lang)
  }

  /** Documents table → (doc_id, payload binary, metadata struct).
    * Stands in for a table of real media blobs. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("lang"), col("n_chars"), col("source")).as("meta"))

  /** Batch "decode": typed mapPartitions over the binary payloads. */
  def decode(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    asMediaTable(docs)
      .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec handles, model
        // weights); the iterator keeps the batch streaming, not
        // materialized
        rows.map(decodeStub)
      }
  }

  /** One sampled frame. */
  case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling: every `everyNth` pseudo-frame of each payload,
    * exploded to one row per frame. The STUB "frame" is a fixed-width
    * byte slice of the payload; a real implementation would seek the
    * container and decode the keyframe. One generator pass — frames
    * never exist driver-side. */
  def frameSample(
      spark: SparkSession, docs: DataFrame, everyNth: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    asMediaTable(docs)
      .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
      .as[MediaRow]
      .flatMap { r =>
        val frames = r.payload.length / 100
        (0L until frames.toLong by everyNth.toLong).map { f =>
          val start = (f * 100).toInt
          Frame(r.doc_id, f,
            r.payload.slice(start, math.min(start + 100, r.payload.length)))
        }
      }
  }

  /** Embedding row produced by the stub feature extractor. */
  case class MediaEmbedding(vec_id: Long, embedding: Array[Float])

  /** Feature extraction: payload → fixed-width float vector via
    * mapPartitions (where a real model forward pass would batch). The
    * STUB projects byte histograms into `dim` buckets and L2-normalizes
    * — deterministic, so the downstream ANN stage is testable. Output
    * schema matches the embeddings table (vec_id, embedding) so it
    * feeds [[SimilaritySearch]] directly. */
  def extractFeatures(
      spark: SparkSession, docs: DataFrame, dim: Int = 16): Dataset[MediaEmbedding] = {
    import spark.implicits._
    asMediaTable(docs)
      .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // model/codec init would amortize here, once per partition batch
        rows.map { r =>
          val hist = new Array[Float](dim)
          r.payload.foreach(b => hist((b & 0xff) % dim) += 1f)
          val norm = math.sqrt(hist.map(x => x.toDouble * x).sum).toFloat
          MediaEmbedding(
            r.doc_id,
            if (norm == 0f) hist else hist.map(_ / norm))
        }
      }
  }
}
