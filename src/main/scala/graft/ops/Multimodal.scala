package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational.t

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The decode/feature-extract kernels are STUBBED (this container has
  * no image/audio codecs — see builder brief): [[fakeDecode]] is a
  * deterministic stand-in. Everything Spark-side is real and tested:
  * the binary column representation, the metadata schema, partition-
  * sized batching through `mapPartitions`, and the pushdown-friendly
  * metadata layout (scan metadata columns without touching blob
  * bytes — at 100 TB the scan must prune the binary column unless the
  * kernel actually runs).
  */
object Multimodal {

  /** Media record: blob + typed metadata. In a real corpus this is the
    * parquet schema; here we derive blobs deterministically from
    * documents.text (UTF-8 bytes) so tests are self-contained. */
  final case class MediaRecord(media_id: Long, kind: String, blob: Array[Byte],
      byte_len: Long)

  /** Stub "image dimensions" from a byte length — the single source of
    * truth shared by [[fakeDecode]], [[resizeMeta]] and the m04 oracle
    * SQL (three copies of this formula would silently diverge). */
  def stubDims(byteLen: Long): (Int, Int) =
    ((byteLen % 1024).toInt, (byteLen / 1024).toInt + 1)

  /** Deterministic fake "decode": a real codec would return pixels /
    * samples; the stub returns (width, height, checksum)-shaped
    * numbers derived from the bytes. Marked clearly as a stand-in. */
  def fakeDecode(blob: Array[Byte]): (Int, Int, Long) = {
    // ??? real kernel: ImageIO/ffmpeg decode. Stub: byte-derived dims.
    val n = blob.length
    var cs = 0L
    var i = 0
    while (i < n) { cs = cs * 31 + (blob(i) & 0xff); i += 1 }
    val (w, h) = stubDims(n.toLong)
    (w, h, cs)
  }

  /** Build the binary-column table from documents (blob = utf-8 of
    * text). Kind is assigned round-robin to model mixed corpora. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("blob"),
      octet_length(col("text")).cast("long").as("byte_len"))

  /** Metadata-only scan: blob column pruned — verify with explain()
    * that ReadSchema excludes `text` bytes beyond what's projected. */
  def mediaMetadata(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("byte_len").as("total_bytes"),
        max("byte_len").as("max_bytes"))
      .orderBy("kind")

  /** Batched "decode" pass: mapPartitions so a real kernel would
    * amortize model/codec init per partition (the Spark-side shape of
    * a pandas_udf/mapInPandas batch job). Output: per-media feature
    * row. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRecord]
    media.mapPartitions { batch =>
      // per-partition init happens here (codec/model load in the real kernel)
      batch.map { m =>
        val (w, h, cs) = fakeDecode(m.blob)
        (m.media_id, m.kind, w, h, cs)
      }
    }.toDF("media_id", "kind", "width", "height", "checksum")
      .orderBy("media_id")
  }

  /** Resize pass over the image subset: the same batched-kernel shape
    * as [[decodeFeatures]], but the stub arithmetic (aspect-preserving
    * downscale to `target` width) is deliberately SQL-replicable so
    * this one HAS a DuckDB oracle — the plumbing (kind dispatch,
    * per-partition kernel, metadata-only scan) is what's real; a
    * production kernel swaps the arithmetic for an image op. */
  def resizeMeta(s: SparkSession, dir: String, target: Int = 256): DataFrame = {
    import s.implicits._
    // project to (id, byte_len) BEFORE the kernel: the stub needs no
    // pixels, so the blob bytes never materialize into the kernel rows
    // (no per-row encode/copy). On a REAL media table with a physical
    // binary column this projection prunes the blob from the scan
    // itself; on this text-derived fixture the scan still reads text
    // because byte_len is computed from it. A real resize kernel would
    // select the blob instead — and pay for it.
    mediaTable(s, dir).filter(col("kind") === "image")
      .select(col("media_id"), col("byte_len")).as[(Long, Long)]
      .mapPartitions { batch =>
        // per-partition init (real kernel: load the resize codec once)
        batch.map { case (id, byteLen) =>
          val (w, h) = stubDims(byteLen)
          // ??? real kernel: decode + resample. Stub: dimension math.
          // Dimensions clamp to >= 1: a 256x0 "image" is not a resize.
          val scale = math.min(1.0, target.toDouble / math.max(w, 1))
          (id, w.toLong, h.toLong,
            math.max(1L, math.floor(w * scale).toLong),
            math.max(1L, math.floor(h * scale).toLong))
        }
      }.toDF("media_id", "w", "h", "out_w", "out_h")
      .orderBy("media_id")
  }

  /** Frame-sampling shape: 1→N expansion (a video yields `frames`
    * rows) — the explode-side of multimodal pipelines. */
  def sampleFrames(s: SparkSession, dir: String, frames: Int = 4): DataFrame =
    mediaTable(s, dir)
      .filter(col("kind") === "video")
      .select(col("media_id"), col("byte_len"),
        explode(sequence(lit(0L), lit(frames - 1L))).as("frame_no"))
      .withColumn("frame_offset",
        col("frame_no") * floor(col("byte_len") / frames).cast("long"))
      .select("media_id", "frame_no", "frame_offset")
      .orderBy("media_id", "frame_no")
}
