package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the last step of a training-data pipeline —
  * curated documents are concatenated and split into fixed-length
  * token sequences (the GPT-style "concat then chop every seq_len"
  * packing), and the trainer needs a MANIFEST of where each document
  * landed: which sequence, at which offset.
  *
  * Scale shape: a single global concatenation order would be one
  * totally-ordered window — a one-reducer sort at 100 TB. Instead
  * documents hash into `buckets` independent streams (a real run
  * makes each bucket one output shard/file), packing runs per bucket:
  * ONE hash shuffle on the bucket key, then a per-bucket ordered
  * cumulative sum — `buckets`-way parallel, each window sized
  * corpus/buckets. All arithmetic is integer (token counts, floor
  * division), so the manifest is bit-reproducible and SQL-checkable.
  */
object Packing {

  /** Packing manifest: for every document, its bucket, the sequence
    * (`pack_id`, numbered within the bucket) where its first token
    * lands, and the token offset inside that sequence. A document
    * with `off + n_tokens > seqLen` straddles into the following
    * sequence(s) — `n_packs` reports how many sequences it touches,
    * the standard cross-boundary accounting of concat-packing. */
  def packManifest(docs: DataFrame, seqLen: Int = 2048,
      buckets: Int = 32): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        pmod(TextAnalysis.fingerprint(col("doc_id").cast("string")),
          lit(buckets.toLong)))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"(cum - n_tokens) div $seqLen").as("pack_id"),
        expr(s"(cum - n_tokens) % $seqLen").as("tok_off"),
        // sequences touched = last token's pack - first token's pack + 1;
        // a zero-token doc touches none
        expr(s"CASE WHEN n_tokens = 0 THEN 0 ELSE " +
          s"(cum - 1) div $seqLen - (cum - n_tokens) div $seqLen + 1 END")
          .as("n_packs"))
  }
}
