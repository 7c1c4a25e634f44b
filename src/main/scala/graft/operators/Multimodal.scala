package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): image/audio/video
  * payloads as opaque `BinaryType` columns with typed metadata, and a
  * batched feature-extraction operator over them.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything around it — the
  * schema contract, partition-wise batching, feature-vector shape —
  * is real and tested. Swap [[FakeCodec.decode]] for a JNI/codec call
  * and nothing else changes.
  *
  * Scale notes: payload bytes dominate row size, so the operator
  * (a) prunes to (id, payload) before the heavy stage, (b) uses
  * `mapPartitions` (the Scala analogue of `mapInPandas` batching —
  * one codec init per partition, not per row), and (c) controls batch
  * memory via `spark.sql.files.maxPartitionBytes` rather than
  * collecting batches.
  */
object Multimodal {

  /** Media row: payload + typed metadata (the schema contract). */
  final case class MediaRow(
      media_id: Long,
      kind: String,         // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      first_byte: Int,
      byte_hash: Long,
      feature: Array[Double])

  /** Deterministic stand-in for the codec. A real implementation
    * would decode `payload` and emit pixel/spectral features; the
    * stub derives features from the bytes so results are verifiable.
    */
  object FakeCodec {
    val Mod = 1000000007L
    /** STUB — replace with a real decoder. Deterministic per payload. */
    def decode(payload: Array[Byte]): Array[Double] = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xff)) % Mod
        i += 1
      }
      // 4 "features": length, first, last, rolling hash bucket
      Array(
        payload.length.toDouble,
        if (payload.nonEmpty) (payload(0) & 0xff).toDouble else 0.0,
        if (payload.nonEmpty) (payload(payload.length - 1) & 0xff).toDouble else 0.0,
        (h % 997L).toDouble)
    }
  }

  /** Build a media table from the documents fixture: UTF-8 bytes of
    * `text` stand in for the payload; metadata is derived
    * deterministically. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** Batched decode/feature-extract: one codec context per partition
    * (the `mapInPandas` batching pattern, Scala-native). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { case (id, kind, payload) =>
          var h = 0L
          var i = 0
          while (i < payload.length) {
            h = (h * 31 + (payload(i) & 0xff)) % FakeCodec.Mod
            i += 1
          }
          val feat = FakeCodec.decode(payload)
          MediaFeatures(id, kind, payload.length.toLong,
            if (payload.nonEmpty) payload(0) & 0xff else 0,
            h, feat)
        }
      }
  }

  /** STUB resize: a real implementation decodes, scales to fit the
    * bounding box, and re-encodes; the stub computes the exact output
    * dimensions (aspect-preserving fit — the real geometry) and a
    * deterministic content token standing in for the resized bytes. */
  def resizeDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else {
      // integer aspect-fit: scale = min(maxW/w, maxH/h) in 1/1000ths
      val scaleMil = math.min(1000L * maxW / w, 1000L * maxH / h) min 1000L
      ((w * scaleMil / 1000L).toInt, (h * scaleMil / 1000L).toInt)
    }
  }

  /** STUB frame sampling: a real implementation decodes the container
    * and grabs every nth frame; the stub derives frame count and byte
    * offsets from the payload length (one "frame" per `frameBytes`
    * bytes), which exercises the same array-typed output schema. */
  def frameOffsets(nBytes: Long, frameBytes: Long, everyN: Int): Seq[Long] =
    (0L until nBytes / frameBytes).filter(_ % everyN == 0)
      .map(_ * frameBytes)

  /** Resize + frame-sample plumbing over the media table (per-row,
    * shuffle-free; the stub math is integer-exact so the DuckDB
    * oracle checks the geometry). */
  def transform(spark: SparkSession, docs: DataFrame,
      maxW: Int = 320, maxH: Int = 240): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(docs)
      .select("media_id", "kind", "payload", "width", "height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload, w, h) =>
          val (rw, rh) = resizeDims(w, h, maxW, maxH)
          val frames = frameOffsets(payload.length.toLong, 16L, 2)
          (id, kind, rw, rh, frames.length.toLong,
            if (frames.nonEmpty) frames.last else -1L)
        }
      }
      .toDF("media_id", "kind", "out_w", "out_h", "n_frames",
        "last_frame_offset")
  }

  /** Per-frame sampling — one OUTPUT ROW per sampled frame (every
    * `everyN`-th full `frameBytes` window of the payload), with a
    * deterministic content hash of the frame's bytes standing in for
    * the decoded frame. This is the row shape a video pipeline feeds
    * to a frame-embedding stage; a real implementation swaps the byte
    * slice for a decoded frame, and the explode/flatMap plumbing,
    * offsets, and per-frame batching stay identical. Per-row fan-out,
    * shuffle-free.
    *
    * Oracle note (same ASCII assumption as m1's byte_hash): the stub
    * payload is UTF-8 text, and the SQL twin slices by CHARACTER
    * (`substring`) while this side slices by BYTE — identical only
    * while the fixture is single-byte text. A real binary payload has
    * no SQL twin anyway (the decode is the stubbed part). */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
      frameBytes: Int = 16, everyN: Int = 2): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(docs).select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, kind, payload) =>
        frameOffsets(payload.length.toLong, frameBytes.toLong, everyN)
          .zipWithIndex.map { case (off, idx) =>
            var h = 0L
            var j = off.toInt
            val end = off.toInt + frameBytes
            while (j < end) {
              h = (h * 31 + (payload(j) & 0xff)) % FakeCodec.Mod
              j += 1
            }
            (id, kind, idx.toLong, off, h)
          }
      }
      .toDF("media_id", "kind", "frame_idx", "frame_offset", "frame_hash")
  }

  /** Feature frame flattened for SQL-oracle comparison. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    val f = extractFeatures(spark, mediaFromDocuments(docs))
    f.toDF().select(
      col("media_id"), col("kind"), col("n_bytes"), col("first_byte"),
      col("byte_hash"),
      element_at(col("feature"), 4).as("hash_bucket"))
  }
}
