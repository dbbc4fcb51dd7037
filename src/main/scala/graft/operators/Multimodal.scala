package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * The decode step is REAL for header-parseable containers — BMP
  * (BITMAPINFOHEADER dimensions), WAV (RIFF chunk walk → fmt/data),
  * PNG (signature + IHDR width/height/bit-depth/color-type) and JPEG
  * (SOI + marker-segment walk to the first SOFn frame header) — in
  * pure JVM code. Payloads that are none of these fall back to a
  * deterministic pseudo-metadata function of the byte length (the
  * honest stand-in for full codecs this environment lacks), so every
  * branch stays testable end-to-end. For images, `channels` reports
  * the pixel channel count (BMP bpp/8, PNG color-type mapping, JPEG
  * SOF component count).
  */
object Multimodal {

  /** Input row for the decode stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)

  /** Decoded-metadata row. `width`/`height` populated for images,
    * `sample_rate`/`channels` for audio; `n_frames` is pixels-rows ⇒ 1
    * for a still image, PCM frames for audio, payload/100 pseudo-frames
    * on the raw fallback. */
  case class MediaMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      sample_rate: Long,
      channels: Long,
      lang: String)

  private def le(b: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)

  /** BMP: 'B''M' magic, BITMAPINFOHEADER width/height at offsets 18/22
    * (little-endian int32), bits-per-pixel at 28 (uint16 → channels =
    * bpp/8 for the packed-RGB formats). Height may be negative
    * (top-down rows) — metadata reports the magnitude. */
  private def parseBmp(b: Array[Byte]): Option[MediaMeta => MediaMeta] =
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      val buf = le(b)
      val w = buf.getInt(18).toLong
      val h = math.abs(buf.getInt(22).toLong)
      val ch = (buf.getShort(28).toInt & 0xffff) / 8
      Some(m => m.copy(kind = "bmp", width = w, height = h,
        n_frames = 1L, channels = ch.toLong))
    } else None

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the mandatory first chunk must be
    * IHDR (13 bytes: width/height big-endian uint32, bit depth, color
    * type). Channels derive from the color type (0 gray=1, 2 rgb=3,
    * 3 palette=1, 4 gray+alpha=2, 6 rgba=4); an unknown color type
    * bails to the raw fallback. */
  private def parsePng(b: Array[Byte]): Option[MediaMeta => MediaMeta] =
    if (b.length >= 26 && b.take(8).sameElements(pngSig) &&
        new String(b, 12, 4, "US-ASCII") == "IHDR") {
      val buf = ByteBuffer.wrap(b) // PNG ints are big-endian
      val w = buf.getInt(16).toLong & 0xffffffffL
      val h = buf.getInt(20).toLong & 0xffffffffL
      val channelsOf = Map(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L)
      channelsOf.get(b(25).toInt & 0xff).map(ch =>
        m => m.copy(kind = "png", width = w, height = h,
          n_frames = 1L, channels = ch))
    } else None

  /** JPEG: SOI (FFD8), then a marker-segment walk — each segment is
    * FF <marker> <len u16 incl. itself>; standalone markers (TEM, RSTn)
    * carry no length. The first SOFn (C0-CF minus DHT C4 / JPG C8 /
    * DAC CC) holds the frame header: precision, height, width
    * (big-endian u16) and component count. Hitting SOS/EOI before any
    * SOF, or any malformed length, bails to the raw fallback. */
  private def parseJpeg(b: Array[Byte]): Option[MediaMeta => MediaMeta] = {
    def u8(i: Int) = b(i).toInt & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var off = 2
    while (off + 4 <= b.length) {
      if (u8(off) != 0xff) return None
      var m = u8(off + 1)
      while (m == 0xff && off + 2 < b.length) { off += 1; m = u8(off + 1) }
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS before SOF
      if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2 // standalone
      else {
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > b.length) return None
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (len < 9) return None
          val h = u16(off + 5).toLong
          val w = u16(off + 7).toLong
          val nComp = u8(off + 9).toLong
          return Some(mm => mm.copy(kind = "jpeg", width = w, height = h,
            n_frames = 1L, channels = nComp))
        }
        off += 2 + len
      }
    }
    None
  }

  /** WAV: RIFF container walk — verify RIFF/WAVE magic then scan chunks
    * (id + le-size pairs) for `fmt ` (channels, sample rate, block
    * align) and `data` (payload size ⇒ PCM frame count). A malformed
    * chunk table bails to the raw fallback rather than guessing. */
  private def parseWav(b: Array[Byte]): Option[MediaMeta => MediaMeta] = {
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = le(b)
    var off = 12
    var channels = -1L; var rate = -1L; var block = -1L; var dataLen = -1L
    while (off + 8 <= b.length && (channels < 0 || dataLen < 0)) {
      val id = tag(off)
      val size = buf.getInt(off + 4).toLong
      if (size < 0 || off + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        channels = buf.getShort(off + 8 + 2).toLong
        rate = buf.getInt(off + 8 + 4).toLong
        block = buf.getShort(off + 8 + 12).toLong
      } else if (id == "data") dataLen = size
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || block <= 0 || dataLen < 0) None
    else Some(m => m.copy(kind = "wav", sample_rate = rate,
      channels = channels, n_frames = dataLen / block))
  }

  /** Raw fallback: deterministic pseudo-metadata from the byte length —
    * the stand-in for containers this sandbox has no codec for. */
  private def rawMeta(n: Long): MediaMeta => MediaMeta =
    m => m.copy(kind = "raw", width = n % 640, height = (n * 7) % 480,
      n_frames = n / 100)

  /** Header-dispatch decode of one payload. */
  private[graft] def decodeOne(r: MediaRow): MediaMeta = {
    val base = MediaMeta(r.doc_id, "raw", r.payload.length.toLong,
      0L, 0L, 0L, 0L, 0L, r.lang)
    val patch = parseBmp(r.payload)
      .orElse(parseWav(r.payload))
      .orElse(parsePng(r.payload))
      .orElse(parseJpeg(r.payload))
      .getOrElse(rawMeta(base.n_bytes))
    patch(base)
  }

  /** Documents table → (doc_id, payload binary, metadata struct).
    * Stands in for a table of real media blobs. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("lang"), col("n_chars"), col("source")).as("meta"))

  /** Minimal valid 54-byte BMP header (BITMAPINFOHEADER, 24 bpp) in
    * front of `pixels`. */
  private[graft] def bmpBytes(
      width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(54 + pixels.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + pixels.length) // file size
      .putInt(0).putInt(54)       // reserved, pixel-data offset
      .putInt(40)                 // BITMAPINFOHEADER size
      .putInt(width).putInt(height)
      .putShort(1).putShort(24)   // planes, bpp
      .putInt(0)                  // BI_RGB
      .putInt(pixels.length)      // image size
      .putInt(2835).putInt(2835)  // ppm
      .putInt(0).putInt(0)        // palette
      .put(pixels)
    out.array()
  }

  /** Canonical 44-byte PCM WAV header in front of `samples` (truncated
    * to a whole number of frames). */
  private[graft] def wavBytes(
      channels: Int, sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val block = channels * 2 // 16-bit PCM
    val data = samples.take(samples.length - samples.length % block)
    val out = ByteBuffer.allocate(44 + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * block)        // byte rate
      .putShort(block.toShort)
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }

  /** Valid PNG container around `body`: 8-byte signature, IHDR chunk
    * (8-bit depth, caller's color type) with a real CRC32, the body as
    * a single IDAT chunk, then IEND. The IDAT content is not a zlib
    * stream — valid for header introspection (everything metadata
    * decode reads), not for pixel decode. */
  private[graft] def pngBytes(
      width: Int, height: Int, colorType: Int, body: Array[Byte]): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val out = ByteBuffer.allocate(12 + data.length) // PNG is big-endian
      out.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)        // bit depth, color type
      .put(0.toByte).put(0.toByte).put(0.toByte)  // deflate, adaptive, none
    pngSig ++ chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", body) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Valid JPEG segment stream around `body`: SOI, JFIF APP0, a SOF0
    * frame header with the caller's dimensions and component count,
    * a matching SOS header, the body as (unentropy-coded) scan bytes,
    * EOI. Total length is `45 + 5*(nComp-1) + body.length`. */
  private[graft] def jpegBytes(
      width: Int, height: Int, nComp: Int, body: Array[Byte]): Array[Byte] = {
    require(nComp >= 1 && nComp <= 4, s"nComp must be 1..4, got $nComp")
    val sof = 2 + 8 + 3 * nComp
    val sos = 2 + 6 + 2 * nComp
    val out = ByteBuffer.allocate(2 + 18 + sof + sos + body.length + 2)
    out.putShort(0xffd8.toShort)                       // SOI
    out.putShort(0xffe0.toShort).putShort(16.toShort)  // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .putShort(0x0101.toShort)                        // version 1.1
      .put(0.toByte).putShort(1.toShort).putShort(1.toShort) // no units, 1:1
      .put(0.toByte).put(0.toByte)                     // no thumbnail
    out.putShort(0xffc0.toShort).putShort((sof - 2).toShort) // SOF0
      .put(8.toByte)                                   // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(nComp.toByte)
    (1 to nComp).foreach { c =>
      out.put(c.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1, qtable 0
    }
    out.putShort(0xffda.toShort).putShort((sos - 2).toShort) // SOS
      .put(nComp.toByte)
    (1 to nComp).foreach(c => out.put(c.toByte).put(0.toByte))
    out.put(0.toByte).put(63.toByte).put(0.toByte)     // spectral select
    out.put(body)
    out.putShort(0xffd9.toShort)                       // EOI
    out.array()
  }

  /** Documents table → media table with REAL container bytes: each doc's
    * text bytes wrapped, by doc_id residue, in a valid BMP header
    * (dimensions derived from n_chars/doc_id), a valid PCM WAV header
    * (channels/rate derived from doc_id), a valid PNG (IHDR dims +
    * alternating rgb/rgba color type), a valid JPEG (SOF0 dims +
    * alternating 3/1 components), or left raw. Deterministic, so the
    * decode output is oracle-checkable by recomputing the header fields
    * arithmetically — while the engine path round-trips through genuine
    * binary parsing. */
  def packMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars"), col("lang"))
      .as[(Long, String, Long, String)]
      .map { case (id, text, nChars, lang) =>
        val body = text.getBytes("UTF-8")
        val payload = (id % 5) match {
          case 0 => bmpBytes((nChars % 640).toInt + 1, (id % 480).toInt + 1, body)
          case 1 => wavBytes((id % 2).toInt + 1, 8000 + (id % 8).toInt * 500, body)
          case 3 => pngBytes((nChars % 512).toInt + 1, (id % 256).toInt + 1,
            if (id % 2 == 0) 2 else 6, body)
          case 4 => jpegBytes((nChars % 1024).toInt + 1, (id % 768).toInt + 1,
            if (id % 2 == 0) 3 else 1, body)
          case _ => body
        }
        MediaRow(id, payload, lang)
      }
  }

  /** Batch decode: typed mapPartitions over the binary payloads,
    * header-dispatching per row (BMP / WAV / raw fallback). */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would happen here (codec handles, model
      // weights); the iterator keeps the batch streaming, not
      // materialized
      rows.map(decodeOne)
    }
  }

  /** Decode over raw (unpacked) document payloads — every row takes the
    * fallback branch; kept for callers that treat text bytes as blobs. */
  def decodeDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    decode(spark,
      asMediaTable(docs)
        .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
        .as[MediaRow])
  }

  /** One audio analysis frame: exact integer PCM energy. */
  case class AudioFrame(
      doc_id: Long, frame_idx: Long, n_samples: Int, energy: Long)

  /** Locate the RIFF `data` chunk: (payload offset, byte length). Same
    * chunk-walk discipline as [[parseWav]]; malformed tables bail. */
  private[graft] def wavDataChunk(b: Array[Byte]): Option[(Int, Int)] = {
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = le(b)
    var off = 12
    while (off + 8 <= b.length) {
      val id = tag(off)
      val size = buf.getInt(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (id == "data") return Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Frame-level PCM energy over the WAV payloads — the first real DSP
    * pass of an audio curation pipeline (silence trimming, VAD
    * pre-filters, loudness normalization all start from per-frame
    * energy). Walks the RIFF chunks to the `data` payload, reads
    * 16-bit little-endian signed samples, frames them at `frameSize`
    * samples (full frames only — the tail remainder is dropped, a
    * defined part of the contract), and emits the EXACT integer energy
    * Σ s² per frame. Non-WAV payloads contribute no rows.
    *
    * Same typed `mapPartitions` shape as [[decode]]: row-local,
    * streaming, zero shuffle — the 100 TB audio pass is embarrassingly
    * parallel. Integer energies make the result oracle-checkable: the
    * corpus text is verified ASCII (FIXTURES.md), so the DuckDB twin
    * recomputes every sample as `ascii(char)` arithmetic over the
    * generation rule. */
  def audioEnergy(
      spark: SparkSession,
      docs: DataFrame,
      frameSize: Int = 16): Dataset[AudioFrame] = {
    import spark.implicits._
    require(frameSize >= 1, s"audioEnergy: frameSize must be >= 1")
    packMediaTable(spark, docs).mapPartitions { rows =>
      rows.flatMap { r =>
        wavDataChunk(r.payload).iterator.flatMap { case (off, len) =>
          val nFrames = (len / 2) / frameSize
          (0L until nFrames.toLong).map { f =>
            var e = 0L
            var k = 0
            while (k < frameSize) {
              val g = (f * frameSize + k).toInt
              val lo = r.payload(off + 2 * g) & 0xff
              val hi = r.payload(off + 2 * g + 1).toInt
              val s = ((lo | (hi << 8)).toShort).toInt
              e += s.toLong * s
              k += 1
            }
            AudioFrame(r.doc_id, f, frameSize, e)
          }
        }
      }
    }
  }

  /** Audio fingerprint — the Shazam-lite constellation reduced to its
    * integer core: bit i of the 32-bit fingerprint is 1 iff frame
    * (i+1)'s PCM energy EXCEEDS frame i's (energy-delta signs are the
    * classic loudness-robust audio hash; Haitsma & Kalker 2002 use
    * exactly this band-energy-difference bit). Frame energies come
    * from [[audioEnergy]]'s genuine RIFF parse; everything after is
    * integer-exact, so the DuckDB oracle replays it from the packer's
    * deterministic PCM bytes. Short clips simply fingerprint their
    * available frames (missing bits stay 0, recorded via n_frames).
    *
    * Downstream near-dup pairing is [[Dedup.hammingPairs32]], same as
    * the image path.
    *
    * Scale shape: one per-doc window lag + one aggregate — a single
    * shuffle on doc_id over the frame stream.
    *
    * Output: (doc_id, n_frames, afp32) per WAV-container document. */
  def audioFingerprint(
      spark: SparkSession,
      docs: DataFrame,
      frameSize: Int = 4,
      nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 32, s"nBits must be in [1, 32]: $nBits")
    val frames = audioEnergy(spark, docs, frameSize).toDF()
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("prev", lag("energy", 1).over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        coalesce(sum(when(
          col("frame_idx").between(1, nBits) && col("energy") > col("prev"),
          expr("shiftleft(1L, cast(frame_idx - 1 as int))"))
          .otherwise(0L)), lit(0L)).as("afp32"))
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

  /** One perceptual-hash row: parsed BMP dimensions + 32-bit aHash. */
  case class ImageHash(
      doc_id: Long, width: Long, height: Long, n_pix: Long, ahash32: Long)

  /** Perceptual (average) hash over DECODED BMP pixel bytes — the
    * image-dedup primitive (near-identical images share or nearly
    * share their aHash; downstream pairing is [[Dedup.simHash]]'s
    * blocked-Hamming machinery). The BMP rows of [[packMediaTable]]
    * round-trip through genuine container parsing: magic check, the
    * header's pixel-data OFFSET, width/height — then the hash runs on
    * the pixel region only.
    *
    * The hash is integer-exact so the DuckDB oracle replays it
    * arithmetically from the packer's deterministic payload: pixel j
    * (0-based, L pixels) lands in block ⌊j·32/L⌋, block mean and the
    * global mean are floor divisions, bit b = 1 iff blockmean_b >
    * globalmean. Typed mapPartitions, one pass per payload, no
    * shuffle — at 100 TB of images this is a free map plus whatever
    * pairing the caller composes on the 8-byte hashes.
    *
    * Output: one row per BMP-container document. */
  def imageAHash(spark: SparkSession, docs: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    packMediaTable(spark, docs).flatMap { r =>
      parsedBmpAHash(r.payload, 32).map { case (w, h, l, hash) =>
        ImageHash(r.doc_id, w, h, l, hash)
      }
    }
  }

  /** One 64-bit perceptual-hash row. */
  case class ImageHash64(
      doc_id: Long, width: Long, height: Long, n_pix: Long, ahash64: Long)

  /** 64-bit variant of [[imageAHash]] — the documented corpus-scale
    * sketch (same block-mean rule over 64 pixel blocks instead of 32).
    * Why it exists as a first-class sibling: at 100k+ images the 32-bit
    * sketch COLLAPSES — the 100× rehearsal measured 100k images mapping
    * to only 6,062 distinct 32-bit aHashes, forcing 2.08M identical-
    * hash output pairs that no blocking can shrink (adjudicated
    * data-inherent, round 10). Doubling the blocks squares the
    * identical-hash collision probability and gives the pigeonhole
    * blocking ~9-bit block keys at Hamming radius 6 (vs ~4.6-bit for
    * the 32-bit sketch), so downstream pairing
    * ([[graft.operators.Dedup.hammingPairs64]]) stays bucket-sparse.
    * Bit 63 uses the long's sign bit — two's complement throughout;
    * the DuckDB oracle folds its HUGEINT sum back the same way. */
  def imageAHash64(spark: SparkSession, docs: DataFrame): Dataset[ImageHash64] = {
    import spark.implicits._
    packMediaTable(spark, docs).flatMap { r =>
      parsedBmpAHash(r.payload, 64).map { case (w, h, l, hash) =>
        ImageHash64(r.doc_id, w, h, l, hash)
      }
    }
  }

  /** Shared BMP parse + nBits-block average hash: strict container
    * validation (not just the 2-byte magic — a raw text payload that
    * happens to start with "BM" must not be parsed as pixels; the
    * file-size and BITMAPINFOHEADER-size fields of real BMP output
    * can't occur in text by accident), then pixel j of L lands in block
    * ⌊j·nBits/L⌋, block mean and global mean are floor divisions, bit
    * b = 1 iff blockmean_b > globalmean. Returns (width, height,
    * n_pix, hash) for valid BMP payloads. */
  private def parsedBmpAHash(
      b: Array[Byte], nBits: Int): Option[(Long, Long, Long, Long)] = {
    if (b.length > 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte && {
      val hb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      hb.getInt(2) == b.length && hb.getInt(14) == 40 &&
        hb.getInt(10) >= 54 && hb.getInt(10) <= b.length
    }) {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val off = bb.getInt(10)
      val w = bb.getInt(18).toLong
      val h = bb.getInt(22).toLong
      val l = b.length - off
      if (l <= 0) None
      else {
        val sums = new Array[Long](nBits)
        val cnts = new Array[Long](nBits)
        var tot = 0L
        var j = 0
        while (j < l) {
          val v = (b(off + j) & 0xff).toLong
          val blk = (j.toLong * nBits / l).toInt
          sums(blk) += v; cnts(blk) += 1; tot += v
          j += 1
        }
        val gmean = tot / l
        var hash = 0L
        var i = 0
        while (i < nBits) {
          if (cnts(i) > 0 && sums(i) / cnts(i) > gmean)
            hash |= 1L << i
          i += 1
        }
        Some((w, h, l.toLong, hash))
      }
    } else None
  }
}
