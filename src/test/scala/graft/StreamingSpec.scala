package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming operators driven to completion via the file source +
  * memory sink, asserted equal to their batch twins (the twins are
  * what the DuckDB oracle checks). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("tumbling window stream equals batch twin") {
    val stream = EventStreams.tumblingCounts(
      EventStreams.eventsStream(spark, sf))
    runToMemory(stream, "tumbling_out", "complete")
    val streamed = spark.table("tumbling_out")
    val batch = EventStreams.tumblingCountsBatch(Tables.events(spark, sf))
    assert(asSet(streamed) == asSet(batch))
  }

  test("session windows stream equals gaps-and-islands batch twin") {
    val stream = EventStreams.sessionAgg(
      EventStreams.eventsStream(spark, sf))
    runToMemory(stream, "session_out", "complete")
    val streamed = spark.table("session_out")
    val batch = EventStreams.sessionAggBatch(Tables.events(spark, sf))
    assert(asSet(streamed) == asSet(batch))
  }

  test("stateless pipeline ops run unchanged on a document stream") {
    // split assignment + quality scoring are pure per-row rules, so
    // the SAME operator code applies to readStream without a
    // streaming variant — the property that lets one curation
    // codebase serve both the backfill and the live crawl
    val schema = spark.read
      .parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val docsBatch = Tables.documents(spark, sf)
    runToMemory(operators.Mixture.splitAssign(docStream),
      "split_out", "append")
    assert(asSet(spark.table("split_out")) ==
      asSet(operators.Mixture.splitAssign(docsBatch)))
    def quality(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    runToMemory(quality(docStream), "quality_out", "append")
    assert(asSet(spark.table("quality_out")) == asSet(quality(docsBatch)))
  }

  test("knn candidate probe runs unchanged on a vector stream") {
    // ss16's candidate stage as a LIVE stream: arriving vectors pick
    // their probe lists IN-ROW (no window, no aggregation on the
    // stream side) and equi-join the standing home lists — the same
    // operator code, no streaming variant
    val embsB = Tables.embeddings(spark, sf)
    val (cents, home) = operators.Similarity.knnIndex(
      embsB.filter(col("vec_id") % 10 =!= 0), numCentroids = 16)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val live = operators.Similarity.knnCandidatesAgainst(
      newStream.select("vec_id", "embedding"), cents, home)
    runToMemory(live, "knn_inc_out", "append")
    val batch = operators.Similarity.knnCandidatesAgainst(
      embsB.filter(col("vec_id") % 10 === 0)
        .select("vec_id", "embedding"), cents, home)
    assert(asSet(spark.table("knn_inc_out")) == asSet(batch))
    assert(spark.table("knn_inc_out").count() > 0)
  }

  test("knn home-list ingest runs unchanged on a vector stream") {
    // ss20's ARRIVE leg live: new vectors assign to their home list
    // IN-ROW against the frozen centroid broadcast (no window, no
    // aggregation on the stream side) — the standing index's
    // streaming ingest surface; deletions fold in batch (knnApplyCdf)
    val embsB = Tables.embeddings(spark, sf)
    val (cents, _) = operators.Similarity.knnIndex(
      embsB.filter(col("vec_id") % 10 =!= 0), numCentroids = 16)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    runToMemory(operators.Similarity.homeRowsAgainst(
      newStream.select("vec_id", "embedding"), cents),
      "knn_home_out", "append")
    val batch = operators.Similarity.homeRowsAgainst(
      embsB.filter(col("vec_id") % 10 === 0)
        .select("vec_id", "embedding"), cents)
    assert(asSet(spark.table("knn_home_out")) == asSet(batch))
    assert(spark.table("knn_home_out").count() > 0)
  }

  test("vector stream appends into the WRITTEN knn layout and serves") {
    // ss23's layout is not just durable — it GROWS from a live
    // stream: homeRowsAgainst maps arriving vectors to home-list rows
    // and foreachBatch appends them into their cid= directories (the
    // production append pattern — the parquet STREAMING sink would
    // plant _spark_metadata and hide the batch-written files from
    // readers); the grown layout then serves through the same pruned
    // probe, identically to the in-memory maintained frame
    val embsB = Tables.embeddings(spark, sf)
    val index = embsB.filter(col("vec_id") % 10 =!= 0)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_knn_stream_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.knnIndexWrite(index, out, numCentroids = 16)
    val cents = spark.read.parquet(out + "_cents")
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val q = operators.Similarity.homeRowsAgainst(
        newStream.select("vec_id", "embedding"), cents)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("cid").parquet(out)
      }
      .option("checkpointLocation", out + "_chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val (cB, hB) = operators.Similarity.knnIndex(index, numCentroids = 16)
    val maintained = hB.unionByName(operators.Similarity.homeRowsAgainst(
      embsB.filter(col("vec_id") % 10 === 0)
        .select("vec_id", "embedding"), cB))
    val direct = operators.Similarity.knnTopKAgainst(
      embsB.filter(col("vec_id") < 3), cB, maintained, k = 3, nprobe = 2)
    val served = operators.Similarity.knnTopKFromLayout(spark, out,
      embsB.filter(col("vec_id") < 3), k = 3, nprobe = 2)
    assert(direct.exceptAll(served).count() == 0 &&
      served.exceptAll(direct).count() == 0)
  }

  test("pq distortion census runs in foreachBatch on a vector stream") {
    // ss32's census is chained broadcast projections + an m-key
    // partial agg — the per-ingest-batch drift monitor runs inside
    // foreachBatch against the frozen written artifacts and must
    // equal the batch census of the same arrivals
    val embsB = Tables.embeddings(spark, sf)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pqcensus_stream_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.pqIndexWrite(
      embsB.filter(col("vec_id") % 10 =!= 0), out,
      numCentroids = 4, m = 4)
    val coarse = spark.read.parquet(out + "_coarse")
      .localCheckpoint(eager = true)
    val booksAll = spark.read.parquet(out + "_books")
      .localCheckpoint(eager = true)
    val books = (0 until 4).map(s => booksAll.filter(col("sid") === s)
      .select("cid", "cemb", "cc"))
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = newStream.select("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= operators.Similarity.pqDriftCensus(coarse, books, b)
          .collect()
        ()
      }
      .option("checkpointLocation", out + "_chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val batch = operators.Similarity.pqDriftCensus(coarse, books,
      embsB.filter(col("vec_id") % 10 === 0)
        .select("vec_id", "embedding")).collect()
    assert(got.map(_.toSeq.map(String.valueOf).mkString("|")).toSet ==
      batch.map(_.toSeq.map(String.valueOf).mkString("|")).toSet)
    assert(got.nonEmpty)
  }

  test("vector stream appends into the WRITTEN sq8 layout and serves") {
    // ss24's arrival leg live: arriving vectors encode under the
    // FROZEN grid and assign under the frozen centroids in ONE
    // per-row projection (sq8RowsAgainst — the batch fold's
    // codes-join-assignment would be a stream-stream join), and
    // foreachBatch appends them into their cid= directories; the
    // grown layout must serve identically to the batch CDF fold of
    // the same arrivals
    val embsB = Tables.embeddings(spark, sf)
    val index = embsB.filter(col("vec_id") % 10 =!= 0)
    val arrivals = embsB.filter(col("vec_id") % 10 === 0)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sq8_stream_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.sq8IndexWrite(index, out, numCentroids = 8,
      iters = 2)
    val cents = spark.read.parquet(out + "_cents")
    val packed = spark.read.parquet(out + "_stats")
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val q = operators.Similarity.sq8RowsAgainst(
        newStream.select("vec_id", "embedding"), cents, packed)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("cid").parquet(out)
      }
      .option("checkpointLocation", out + "_chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    // batch twin: the same base layout maintained by the CDF fold
    val out2 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sq8_stream2_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.sq8IndexWrite(index, out2, numCentroids = 8,
      iters = 2)
    operators.Similarity.sq8LayoutApplyCdf(spark, out2,
      arrivals.select(col("vec_id"), col("embedding"),
        lit("insert").as("_change_type")))
    val queries = embsB.filter(col("vec_id") < 3)
    val grown = operators.Similarity.ivfSq8TopKFromLayout(spark, out,
      queries, k = 5, nprobe = 2)
    val folded = operators.Similarity.ivfSq8TopKFromLayout(spark, out2,
      queries, k = 5, nprobe = 2)
    assert(grown.exceptAll(folded).count() == 0 &&
      folded.exceptAll(grown).count() == 0)
    assert(grown.count() > 0)
  }

  test("vector stream appends into the WRITTEN pq layout and serves") {
    // ss25's arrival leg live: frozen-coarse assignment, residual
    // against the home centroid, and PQ-encode under the frozen books
    // are all per-row projections (pqRowsAgainst), so the residual-
    // coded layout grows from a live stream too
    val embsB = Tables.embeddings(spark, sf)
    val index = embsB.filter(col("vec_id") % 10 =!= 0)
    val arrivals = embsB.filter(col("vec_id") % 10 === 0)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pq_stream_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.pqIndexWrite(index, out, numCentroids = 8,
      m = 4, ksub = 8, iters = 2)
    val coarse = spark.read.parquet(out + "_coarse")
    val booksAll = spark.read.parquet(out + "_books")
    val books = (0 until 4).map(sid =>
      booksAll.filter(col("sid") === sid).select("cid", "cemb", "cc"))
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val q = operators.Similarity.pqRowsAgainst(
        newStream.select("vec_id", "embedding"), coarse, books)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("lcid").parquet(out)
      }
      .option("checkpointLocation", out + "_chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out2 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pq_stream2_${spark.sparkContext.applicationId}").getPath
    operators.Similarity.pqIndexWrite(index, out2, numCentroids = 8,
      m = 4, ksub = 8, iters = 2)
    operators.Similarity.pqLayoutApplyCdf(spark, out2,
      arrivals.select(col("vec_id"), col("embedding"),
        lit("insert").as("_change_type")), m = 4)
    val queries = embsB.filter(col("vec_id") < 3)
    val grown = operators.Similarity.ivfPqTopKFromLayout(spark, out,
      queries, k = 5, nprobe = 2, m = 4)
    val folded = operators.Similarity.ivfPqTopKFromLayout(spark, out2,
      queries, k = 5, nprobe = 2, m = 4)
    assert(grown.exceptAll(folded).count() == 0 &&
      folded.exceptAll(grown).count() == 0)
    assert(grown.count() > 0)
  }

  test("document stream appends into the WRITTEN bm25 layout and serves") {
    // t32's layout grows from a live crawl: the per-row bm25Index
    // postings of arriving docs foreachBatch-append into their bkt=
    // directories plus the _fwd/_docs artifacts (bm25LayoutAppend);
    // the grown layout must serve identically to the batch CDF fold
    // of the same arrivals
    val docsB = Tables.documents(spark, sf).select("doc_id", "text")
    val index = docsB.filter(col("doc_id") % 10 =!= 0)
    val arrivals = docsB.filter(col("doc_id") % 10 === 0)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_bm25_stream_${spark.sparkContext.applicationId}").getPath
    operators.Retrieval.bm25IndexWrite(index, out, buckets = 64)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val q = docStream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        operators.Retrieval.bm25LayoutAppend(spark, out, b)
      }
      .option("checkpointLocation", out + "_chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out2 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_bm25_stream2_${spark.sparkContext.applicationId}").getPath
    operators.Retrieval.bm25IndexWrite(index, out2, buckets = 64)
    operators.Retrieval.bm25LayoutApplyCdf(spark, out2,
      arrivals.select(col("doc_id"), col("text"),
        lit("insert").as("_change_type")))
    val queries = docsB.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    val grown = operators.Retrieval.bm25TopKFromLayout(spark, out,
      queries, k = 10)
    val folded = operators.Retrieval.bm25TopKFromLayout(spark, out2,
      queries, k = 10)
    assert(grown.exceptAll(folded).count() == 0 &&
      folded.exceptAll(grown).count() == 0)
    assert(grown.count() > 0)
  }

  test("live edges adopt frozen LPA labels at batch cost") {
    // q71's incremental member runs in foreachBatch: arriving
    // co-purchase edges vote against the STANDING label table (one
    // round, frozen-majority, ties smallest) — no multi-round re-run
    // on the live path; the accumulated stream output must equal the
    // one-shot batch assignment of the same arrivals
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def copurchase(side: org.apache.spark.sql.DataFrame) =
      side.as("x").join(side.as("y"), "ok")
        .where(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    // frozen graph: edges among ESTABLISHED parts (pk % 5 != 0);
    // arrivals: edges touching the new parts
    val frozen = operators.Graph.labelPropagation(
      copurchase(li)
        .where(col("src") % 5 =!= 0 && col("dst") % 5 =!= 0),
      rounds = 2)
      .localCheckpoint()
    def arrivalEdges(side: org.apache.spark.sql.DataFrame) =
      copurchase(side)
        .where(col("src") % 5 === 0 || col("dst") % 5 === 0)
    val schema = spark.read.parquet(s"$sf/lineitem.parquet").schema
    val liStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = liStream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= operators.Graph
          .labelPropagationAgainst(frozen, arrivalEdges(b))
          .collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val batch = operators.Graph.labelPropagationAgainst(frozen,
      arrivalEdges(li))
    assert(got.nonEmpty && got.toSet == asSet(batch))
  }

  test("standing bm25 index ingests a live document stream") {
    // t25's postings builder is per-row (tf counted inside the doc's
    // own token array — no Aggregate), so the SAME operator maps a
    // live crawl into index rows in append mode; the accumulated
    // stream output must equal the batch-built index exactly
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    runToMemory(operators.Retrieval.bm25Index(
      docStream.select("doc_id", "text")), "bm25_idx_out", "append")
    val batch = operators.Retrieval.bm25Index(
      Tables.documents(spark, sf).select("doc_id", "text"))
    assert(asSet(spark.table("bm25_idx_out")) == asSet(batch))
    assert(spark.table("bm25_idx_out").count() > 0)
  }

  test("dsir scoring runs unchanged on a document stream") {
    // ds2's probe is per-row (the packed weight maps ride a 1-row
    // broadcast, masses fold over the doc's own gram array — no
    // Aggregate on the stream side), so the SAME operator scores a
    // live crawl in append mode against the standing model
    val docsB = Tables.documents(spark, sf)
    val model = operators.Mixture.dsirModel(
      docsB.filter(col("source") =!= "src0"),
      docsB.filter(col("source") === "src0"), buckets = 256)
      .localCheckpoint() // standing: trained once, eagerly
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    runToMemory(operators.Mixture.dsirScoreAgainst(model,
      docStream.select("doc_id", "text"), buckets = 256),
      "dsir_out", "append")
    val batch = operators.Mixture.dsirScoreAgainst(model,
      docsB.select("doc_id", "text"), buckets = 256)
    assert(asSet(spark.table("dsir_out")) == asSet(batch))
    assert(spark.table("dsir_out").count() > 0)
  }

  test("span-corruption and fim manifests run unchanged on a document stream") {
    // tp12/tp13 are pure per-row manifests (token count + integer
    // arithmetic + an explode/slice) — the scaladocs say
    // streaming-legal by construction; this is the live proof
    val docsB = Tables.documents(spark, sf)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    runToMemory(operators.Packing.spanCorruptionPlan(
      docStream.select("doc_id", "text")), "tp12_out", "append")
    assert(asSet(spark.table("tp12_out")) ==
      asSet(operators.Packing.spanCorruptionPlan(
        docsB.select("doc_id", "text"))))
    runToMemory(operators.Packing.fimSplit(
      docStream.select("doc_id", "text")), "tp13_out", "append")
    assert(asSet(spark.table("tp13_out")) ==
      asSet(operators.Packing.fimSplit(docsB.select("doc_id", "text"))))
    assert(spark.table("tp12_out").count() > 0)
    assert(spark.table("tp13_out").count() > 0)
  }

  test("tfidf tagging runs unchanged on a document stream") {
    // t28's probe is per-row (tf counted inside the doc's own token
    // array, df via a stream-static equi-join, a per-row score
    // floor — no aggregation on the stream side), so the SAME
    // operator tags a live crawl in append mode
    val docsB = Tables.documents(spark, sf)
    val model = operators.Retrieval.tfidfModel(docsB)
      .localCheckpoint() // standing: trained once, eagerly
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    runToMemory(operators.Retrieval.tfidfTagsAgainst(model,
      docStream.select("doc_id", "text"), floorPpm = 1000000L),
      "tfidf_tags_out", "append")
    val batch = operators.Retrieval.tfidfTagsAgainst(model,
      docsB.select("doc_id", "text"), floorPpm = 1000000L)
    assert(asSet(spark.table("tfidf_tags_out")) == asSet(batch))
    assert(spark.table("tfidf_tags_out").count() > 0)
  }

  test("stream-static join decontaminates a document stream") {
    // the eval gram set is a STATIC frame joined into a streaming
    // scan — Structured Streaming's stream-static join, the shape
    // dc1 takes when the corpus arrives as a live crawl
    val docsB = Tables.documents(spark, sf)
    val evalGrams = docsB.filter(col("doc_id") % 50 === 0)
      .select(explode(operators.Dedup.shingles(col("text"), 5)).as("s"))
      .distinct()
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val docStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val hits = docStream.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        explode(operators.Dedup.shingles(col("text"), 5)).as("s"))
      .join(evalGrams, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    runToMemory(hits, "decon_out", "complete")
    val batch = operators.Decontaminate
      .ngramOverlap(docsB, col("doc_id") % 50 === 0, k = 5)
      .filter(col("n_hits") > 0).select("doc_id", "n_hits")
    assert(asSet(spark.table("decon_out")) == asSet(batch))
  }

  test("incremental embedding dedup runs unchanged on a vector stream") {
    // dd11's daily batch as a LIVE stream: arriving vectors bucket
    // against the standing (static) index — the SAME operator code,
    // no streaming variant; dropDuplicates keeps the candidate dedup
    // streaming-legal ahead of the stream-static verify joins
    val embsB = Tables.embeddings(spark, sf)
    val index = embsB.filter(col("vec_id") % 10 =!= 0)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .filter(col("vec_id") % 10 === 0)
    val live = operators.Similarity.lshCosinePairsAgainst(
      newStream, index, threshold = 0.4)
    runToMemory(live, "inc_vec_out", "append")
    val batch = operators.Similarity.lshCosinePairsAgainst(
      embsB.filter(col("vec_id") % 10 === 0), index, threshold = 0.4)
    assert(asSet(spark.table("inc_vec_out")) == asSet(batch))
    assert(spark.table("inc_vec_out").count() > 0)
  }

  test("incremental simhash dedup runs unchanged on a document stream") {
    // dd19's batch as a LIVE stream: arriving documents probe the
    // standing index's guarded SimHash blocks — the SAME operator
    // code, no streaming variant. The new side carries no checkpoint
    // and no Aggregate (hash collapse is a Deduplicate), which is
    // exactly what this test pins: a distinct()/localCheckpoint on
    // that side would make this an AnalysisException, not a result
    val docsB = Tables.documents(spark, sf)
    val index = docsB.filter(col("doc_id") % 10 =!= 0)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .filter(col("doc_id") % 10 === 0)
    val live = operators.Dedup.simhashPairsAgainst(
      newStream.select("doc_id", "text"), index.select("doc_id", "text"))
    runToMemory(live, "inc_sh_out", "append")
    val batch = operators.Dedup.simhashPairsAgainst(
      docsB.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
      index.select("doc_id", "text"))
    assert(asSet(spark.table("inc_sh_out")) == asSet(batch))
    assert(spark.table("inc_sh_out").count() > 0)
  }

  test("incremental image near-dup runs unchanged on a media stream") {
    // m11's batch as a LIVE stream: arriving media decode + dHash in
    // the same mapPartitions pass (stateless, streaming-legal), then
    // probe the standing index's guarded blocks — the SAME operator
    // code, no streaming variant, exactly the dd19 contract for the
    // image family
    val docsB = Tables.documents(spark, sf)
    val index = docsB.filter(col("doc_id") % 2 =!= 0)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val newStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .filter(col("doc_id") % 2 === 0)
    val live = operators.Multimodal.imageNearDupAgainst(spark,
      newStream, index)
    runToMemory(live, "inc_img_out", "append")
    val batch = operators.Multimodal.imageNearDupAgainst(spark,
      docsB.filter(col("doc_id") % 2 === 0), index)
    assert(asSet(spark.table("inc_img_out")) == asSet(batch))
    assert(spark.table("inc_img_out").count() > 0)
  }

  test("centroid assignment runs unchanged on a vector stream") {
    // the map-side argmin has no stateful aggregation, so the SAME
    // operator does realtime inference: arriving vectors against
    // broadcast static centroids trained offline
    val embsB = Tables.embeddings(spark, sf)
    val cents = operators.VectorStats.kmeansCentroids(embsB, k = 4, iters = 1)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val vecStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
    val live = operators.VectorStats.assignToCentroids(vecStream, cents)
    runToMemory(live, "kmeans_assign_out", "append")
    val batch = operators.VectorStats.assignToCentroids(embsB, cents)
    assert(asSet(spark.table("kmeans_assign_out")) == asSet(batch))
    assert(spark.table("kmeans_assign_out").count() == embsB.count())
  }

  test("pq encoding runs unchanged on a vector stream") {
    // like centroid assignment, the PQ encoder is stateless map-side
    // folds against broadcast codebooks — the realtime ingest path of
    // a PQ index trained offline
    val embsB = Tables.embeddings(spark, sf)
    val books = operators.Similarity.pqCodebooks(embsB, m = 4, ksub = 4,
      iters = 1)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val vecStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
    val live = operators.Similarity.pqEncode(vecStream, books)
    runToMemory(live, "pq_encode_out", "append")
    val batch = operators.Similarity.pqEncode(embsB, books)
    assert(asSet(spark.table("pq_encode_out")) == asSet(batch))
    assert(spark.table("pq_encode_out").count() == embsB.count())
  }

  test("count-min sketch maintains itself over a stream with bounded state") {
    val stream = graft.operators.Profile.cmsSketch(
      EventStreams.eventsStream(spark, sf), "user_id")
    runToMemory(stream, "cms_out", "complete")
    val streamed = spark.table("cms_out")
    // bounded state: at most depth × width rows regardless of stream size
    assert(streamed.count() <= 4 * 256)
    val batch = graft.operators.Profile.cmsSketch(
      Tables.events(spark, sf), "user_id")
    assert(asSet(streamed) == asSet(batch))
  }

  test("watermark dedup stream preserves distinct event ids") {
    val stream = EventStreams.dedupStream(
      EventStreams.eventsStream(spark, sf))
      .select("event_id")
    runToMemory(stream, "dedup_out", "append")
    val streamed = spark.table("dedup_out")
    assert(streamed.count() ==
      Tables.events(spark, sf).select("event_id").distinct().count())
  }

  test("stateful sessionizer emits closed sessions consistent with batch") {
    val out = EventStreams.statefulSessionize(spark,
      Tables.events(spark, sf)).collect()
    // batch twin: number of CLOSED sessions = total sessions - open one
    // per user (the last session never closes in one batch)
    val batchSessions = EventStreams.sessionAggBatch(Tables.events(spark, sf))
    val totalSessions = batchSessions.count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.length == totalSessions - users)
    // per-user event conservation: closed + open = all events
    val closedEvents = out.map(_.n_events).sum
    val total = Tables.events(spark, sf).count()
    assert(closedEvents < total)
  }

  test("checkpointed stream resumes incrementally across restarts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val inDir = Files.createTempDirectory("graft-ckpt-in")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val schema = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet").schema

    def startQuery() = {
      val stream = spark.readStream.schema(schema).parquet(inDir.toString)
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      stream.writeStream.format("memory").queryName("ckpt_out")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
    }

    // batch 1: one file
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("e1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q1 = startQuery()
    q1.processAllAvailable()
    val after1 = spark.table("ckpt_out")
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    q1.stop()

    // restart with a second file appended: only the delta is new work
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("e2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q2 = startQuery()
    q2.processAllAvailable()
    val after2 = spark.table("ckpt_out")
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    q2.stop()

    assert(after1 == 1000L, s"first batch counted $after1")
    assert(after2 == 2000L, s"resume counted $after2")
  }

  test("stream-stream interval join equals batch twin") {
    val stream = EventStreams.clickToPurchase(
      EventStreams.eventsStream(spark, sf))
    runToMemory(stream, "ssj_out", "append")
    val streamed = spark.table("ssj_out")
    val batch = EventStreams.clickToPurchaseBatch(Tables.events(spark, sf))
    assert(asSet(streamed) == asSet(batch))
    assert(batch.count() > 0, "fixture produced no click→purchase pairs")
  }

  test("outer stream-stream join emits unmatched clicks after watermark") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.clickToPurchaseOuter(
      EventStreams.eventsStream(spark, sf))
    runToMemory(stream, "ssoj_out", "append")
    val streamed = spark.table("ssoj_out")
    val batch = EventStreams.clickToPurchaseOuterBatch(Tables.events(spark, sf))
    // matched rows are exactly the inner join — identical to batch
    assert(asSet(streamed.filter(col("purchase_id").isNotNull)) ==
      asSet(batch.filter(col("purchase_id").isNotNull)))
    // null rows: the stream may only emit a subset (clicks near the
    // end of input are never provably unmatched — the watermark stops
    // advancing), but every click older than max_ts - watermark -
    // window IS provably unmatched and must have been evicted+emitted
    val streamedNull = asSet(streamed.filter(col("purchase_id").isNull))
    val batchNull = asSet(batch.filter(col("purchase_id").isNull))
    assert(streamedNull.subsetOf(batchNull))
    val ev = Tables.events(spark, sf)
    // the GLOBAL watermark is the MIN across both inputs' event-time
    // watermarks — the last CLICK (not the last event) bounds what the
    // engine can prove unmatched, so derive the cutoff from the
    // smaller side's max; 10-minute margin for trigger granularity
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val maxPurchase = ev.filter(col("event_type") === "purchase")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val watermarkBase = math.min(maxClick.getTime, maxPurchase.getTime)
    val cutoff = new java.sql.Timestamp(
      watermarkBase - (60 + 30 + 10) * 60 * 1000L)
    val guaranteed = asSet(
      batch.filter(col("purchase_id").isNull)
        .join(ev.filter(col("event_type") === "click")
          .filter(col("ts") < lit(cutoff))
          .select(col("event_id").as("click_id")), "click_id")
        .select("user_id", "click_id", "purchase_id", "value"))
    assert(guaranteed.nonEmpty, "fixture has no early unmatched clicks")
    assert(guaranteed.subsetOf(streamedNull),
      s"${guaranteed.size} provably-unmatched clicks, " +
        s"${(guaranteed -- streamedNull).size} never emitted")
  }

  test("watermark drops late data in append mode") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val inDir = Files.createTempDirectory("graft-late-in")
    val events = Tables.events(spark, sf)
    // recent half first (advances the watermark), old half second
    // (arrives hours late → beyond the 10-minute watermark)
    val cutoff = events.agg(expr("percentile(unix_micros(ts), 0.5)"))
      .collect()(0).getDouble(0).toLong
    val recent = events.filter(unix_micros(col("ts")) >= cutoff)
    val old = events.filter(unix_micros(col("ts")) < cutoff)
    recent.coalesce(1).write.parquet(inDir.resolve("f1").toString)

    val stream = spark.readStream.schema(recent.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString + "/*/")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      old.coalesce(1).write.parquet(inDir.resolve("f2").toString)
      q.processAllAvailable()
    } finally q.stop()
    // append mode only emits finalized windows; the late file's events
    // fall in windows already finalized by the watermark, so the total
    // emitted count stays below the full event count
    val emitted = spark.table("late_out")
      .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
    assert(emitted < events.count(),
      s"late data was not dropped: emitted=$emitted")
  }

  test("foreachBatch writes idempotent per-batch output") {
    import java.nio.file.Files
    val outDir = Files.createTempDirectory("graft-feb-out").toString
    val stream = EventStreams.eventsStream(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // exactly-once pattern: output path keyed by batchId, full
        // overwrite — replays of the same batch are idempotent
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(s"$outDir/batch=0")
    val expected = EventStreams.tumblingCountsBatch(Tables.events(spark, sf))
      .select("event_type").distinct().count()
    assert(written.count() == Tables.events(spark, sf)
      .select("event_type").distinct().count())
  }

  test("sliding window stream runs with watermark") {
    val stream = EventStreams.slidingCounts(
      EventStreams.eventsStream(spark, sf))
    runToMemory(stream, "sliding_out", "complete")
    val streamed = spark.table("sliding_out")
    assert(streamed.count() > 0)
    // each event lands in exactly 2 windows
    val totalCounted = streamed.agg(sum("n")).collect()(0).getLong(0)
    assert(totalCounted == 2 * Tables.events(spark, sf).count())
  }

  test("transformWithState carries per-user state across micro-batches") {
    import java.nio.file.Files
    import graft.streaming.StatefulProfile
    val ev = Tables.events(spark, sf).select("user_id", "value")
    // two parquet files + maxFilesPerTrigger=1 → two micro-batches,
    // split so most users appear in BOTH (state must carry over)
    val dir = Files.createTempDirectory("graft-tws")
    val withId = Tables.events(spark, sf).select("event_id", "user_id", "value")
    withId.filter(col("event_id") % 2 === 0).drop("event_id")
      .coalesce(1).write.parquet(dir.resolve("chunk0").toString)
    withId.filter(col("event_id") % 2 =!= 0).drop("event_id")
      .coalesce(1).write.parquet(dir.resolve("chunk1").toString)
    val schema = ev.schema
    val stream = StatefulProfile.statefulProfile(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(dir.toString))
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = scala.util.Try(spark.conf.get(key)).toOption
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      runToMemory(stream.toDF(), "tws_out", "update")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val emitted = spark.table("tws_out")
    // some user updated in more than one batch → incremental emission
    assert(emitted.groupBy("user_id").count()
      .filter(col("count") > 1).count() > 0,
      "no user was updated across batches — state never carried")
    // the LAST emission per user (max n_events: counts only grow) is
    // the final state and must equal the batch twin exactly
    val finalState = emitted.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("sum_cents"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.sum_cents"))
    val twin = StatefulProfile.statefulProfileBatch(ev)
    assert(asSet(finalState) == asSet(twin))
  }
}
