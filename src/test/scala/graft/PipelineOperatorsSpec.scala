package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class PipelineOperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val embs = Tables.embeddings(spark, sf)

  test("fingerprint is the base-31 polynomial hash") {
    import spark.implicits._
    val fp = Seq("abc").toDF("s")
      .select(TextAnalysis.fingerprint(col("s"))).collect()(0).getLong(0)
    assert(fp == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("jaccard pairs are symmetric-free and above threshold") {
    val rows = Dedup.jaccardPairs(docs, k = 3, pct = 85).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r =>
      r.getLong(2) * 100 >= r.getLong(3) * 85
    })
  }

  test("minhash candidates are a subset-verified pair set") {
    val mh = Dedup.minhashPairs(docs, pct = 80).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, pct = 80).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH can miss pairs (false negatives) but never invent them
    assert(mh.subsetOf(exact))
    // and on this corpus it should find a decent share
    if (exact.nonEmpty)
      assert(mh.size.toDouble / exact.size > 0.3,
        s"minhash recall ${mh.size}/${exact.size} too low")
  }

  test("simhash distance correlates with near-duplication") {
    val rows = Dedup.simhashPairs(docs, maxDist = 3).collect()
    assert(rows.forall(_.getInt(4) <= 3))
  }

  test("cosine topk ranks by exact cosine, ties by id") {
    val rows = Similarity.bruteForceTopK(embs,
      embs.filter(col("vec_id") === 0), k = 5).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("aggregator top-k equals window top-k exactly") {
    val q = embs.filter(col("vec_id") < 3)
    val viaWindow = Similarity.bruteForceTopK(embs, q, k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaAgg = Similarity.bruteForceTopKAgg(embs, q, k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaWindow == viaAgg)
  }

  test("lsh topk returns same-bucket exact-cosine results") {
    val brute = Similarity.bruteForceTopK(embs,
      embs.filter(col("vec_id") === 0), k = 50).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val ann = Similarity.lshTopK(embs,
      embs.filter(col("vec_id") === 0), k = 5).collect()
    // every ANN score must equal the exact score for that neighbor
    ann.foreach { r =>
      brute.get(r.getLong(2)).foreach(exact =>
        assert(exact == r.getDouble(3)))
    }
  }

  test("multimodal features are deterministic and typed") {
    val f = Multimodal.features(spark, docs).collect()
    assert(f.length == docs.count())
    val kinds = f.map(_.getString(1)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    // n_bytes equals octet length of utf-8 text
    val one = Multimodal.features(spark, docs)
      .filter(col("media_id") === 0).collect()(0)
    val text = docs.filter(col("doc_id") === 0).collect()(0)
      .getAs[String]("text")
    assert(one.getLong(2) == text.getBytes("UTF-8").length.toLong)
  }

  test("exact dedup keeps one representative per normalized text") {
    val n = Dedup.exact(docs).count()
    val distinct = docs.select(Dedup.normKey(col("text"))).distinct().count()
    assert(n == distinct)
  }
}
