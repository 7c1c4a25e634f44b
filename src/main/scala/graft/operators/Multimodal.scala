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

  /** Feature frame flattened for SQL-oracle comparison. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    val f = extractFeatures(spark, mediaFromDocuments(docs))
    f.toDF().select(
      col("media_id"), col("kind"), col("n_bytes"), col("first_byte"),
      col("byte_hash"),
      element_at(col("feature"), 4).as("hash_bucket"))
  }
}
