package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, Decontaminate, Dedup, Mixture, Multimodal, Similarity, TextAnalysis}

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

  test("recall report covers all nine index families with sane values") {
    val rows = Similarity.annRecallReportAll(embs,
      embs.filter(col("vec_id") < 3), k = 5).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("ivf", "ivfpq", "ivfsq8", "knn_graph", "lsh", "mips", "pq",
        "pq_rerank", "sq8"))
    // within the same coarse quantizer and probe width, SQ8's 8-bit
    // codes can only rank candidates BETTER than PQ's m-byte codes
    val by = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(by("ivfsq8") >= by("ivfpq"),
      s"ivfsq8 ${by("ivfsq8")} < ivfpq ${by("ivfpq")}")
    // 8-bit-per-dim codes barely perturb a dot ranking: sq8's recall
    // against the exact-dot truth must dominate the family floor
    assert(rows.find(_.getString(0) == "sq8").get.getLong(3) >= 800,
      "sq8 recall should be near-exact on the fixture")
    rows.foreach { r =>
      assert(r.getLong(1) == 15, s"${r.getString(0)}: truth should be k*queries")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000,
        s"${r.getString(0)}: recall_x1000 out of range")
    }
    // lsh/ivf recall must agree with the narrower ss4 report (same
    // params, same truth) — the extension cannot change existing rows
    val old = Similarity.annRecallReport(embs,
      embs.filter(col("vec_id") < 3), k = 5).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val all = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(all("lsh") == old("lsh") && all("ivf") == old("ivf"))
  }

  test("standing-index probe at a query sample equals the full kNN " +
      "graph's rows for those queries (the ss12 knn-leg equivalence)") {
    // the r19 optimization serves ss12's knn_graph recall row through
    // knnTopKAgainst at the 3-query sample instead of building
    // all-corpus edges; this pins the claimed bit-equivalence: same
    // (dist², cid) probe order, same capped home lists, same cosine
    // association — per-query rows must be IDENTICAL, scores included
    val sample = embs.filter(col("vec_id") < 4)
    val full = Similarity.knnGraph(embs, k = 3, numCentroids = 16,
        nprobe = 2)
      .filter(col("vec_id") < 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val (cents, home) = Similarity.knnIndex(embs, numCentroids = 16)
    val probed = Similarity.knnTopKAgainst(sample, cents, home,
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(probed == full,
      s"probe-vs-graph rows diverge: ${probed.diff(full)} vs ${full.diff(probed)}")
  }

  test("bpe training stops early when the vocabulary is exhausted") {
    import spark.implicits._
    // one 2-letter word: exactly ONE merge exists; rounds 2..8 have
    // no pair left and must not run (or empty the vocabulary)
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val rows = graft.operators.Tokenizer.bpeTrain(tiny, merges = 8).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "a b" && rows.head.getString(2) == "ab")
  }

  test("t42/t43 script tier: alphabetic non-Latin corpora train real " +
      "vocabularies (the old Latin gate's pinned degrade is lifted)") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val cyr = Seq((1L, "привет мир привет банан банан привет"),
      (2L, "мир банан банан привет мир")).toDF("doc_id", "text")
    // the Latin-only gate still degrades to empty — that contract is
    // unchanged; scriptTier is the opt-in that lifts it
    assert(Tokenizer.bpeTrain(cyr, merges = 4).isEmpty)
    assert(Tokenizer.unigramTrain(cyr, rounds = 2).isEmpty)
    val m = Tokenizer.bpeTrain(cyr, merges = 4, scriptTier = true)
      .collect()
    assert(m.nonEmpty, "script tier must learn merges from Cyrillic")
    assert(m.forall(_.getString(2).matches("^[\\u0430-\\u04FF]+$")),
      "every learned merge is a Cyrillic letter run")
    val v = Tokenizer.unigramTrain(cyr, rounds = 2, maxPiece = 4,
      minCount = 2, maxWordLen = 12, scriptTier = true)
      .localCheckpoint()
    val pieces = v.collect().map(_.getString(0))
    assert(pieces.nonEmpty && pieces.exists(_.length > 1),
      "unigram vocabulary must hold real multi-char Cyrillic pieces")
    // coverage census over the trained vocab: the Cyrillic source
    // reports sane fertility (segmented words, NOT the all-opaque
    // np=1 passthrough) and a positive whole-word rate
    val cov = Tokenizer.tokenizerCoverage(
      cyr.withColumn("source", lit("cyr")), v, scriptTier = true)
      .collect()
    assert(cov.length == 1)
    val (nWords, fert, whole) =
      (cov(0).getLong(2), cov(0).getLong(4), cov(0).getLong(5))
    assert(nWords == 11L, s"11 script-tier words, got $nWords")
    assert(fert >= 1000000L && fert <= 4000000L,
      s"fertility_ppm in the sane 1x-4x band, got $fert")
    assert(whole > 0L, "some words encode as one piece")
    // the trained merges APPLY under scriptTier encode: tokens
    // compress below character count (merges fired) and the encode
    // differs from the opaque-passthrough of the Latin-gate encode
    val rules = m.sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Tokenizer.bpeEncode(cyr, rules, scriptTier = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(enc(1L)._1 == 6 && enc(1L)._2 > 6 &&
      enc(1L)._2 < "приветмирприветбананбананпривет".length,
      s"merges must fire on the Cyrillic corpus: ${enc(1L)}")
    // Arabic and Greek/Hebrew/Devanagari letter runs pass the gate
    val ara = Seq((1L, "كتب كتاب مكتبة كتب كتاب مكتبة كتب"))
      .toDF("doc_id", "text")
    assert(Tokenizer.bpeTrain(ara, merges = 2, scriptTier = true)
      .count() > 0, "Arabic trains a real merge list")
    val gate = graft.operators.TextAnalysis.ScriptWordGate
    Seq("κόσμος", "שלום", "नमस्ते", "привет", "hello").foreach(w =>
      assert(w.matches(gate), s"$w must pass the script word gate"))
    Seq("42", "一", "a1b", "")
      .foreach(w => assert(!w.matches(gate), s"$w must NOT pass"))
  }

  test("soft dedup weights are identical through the shuffle fallback") {
    val viaBroadcast = Dedup.softDedupWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // maxBroadcastLabels = 0 forces the key-equi shuffle join the
    // operator falls back to when the paired frame outgrows a
    // broadcast — the plan changes, the output must not
    val viaShuffle = Dedup.softDedupWeights(docs, maxBroadcastLabels = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaBroadcast == viaShuffle && viaBroadcast.nonEmpty)
  }

  test("survivor policies are identical through the shuffle fallback") {
    // the dd18 guard threaded through every survivor-policy tail
    // (dd14/dd15/dd20/m13 all route here): maxBroadcastLabels = 0
    // forces the key-equi shuffle joins the operators fall back to
    // when the label frame outgrows a broadcast — the plan changes,
    // the output must not
    def snap(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val clusters = Dedup.resolveClusters(
      Dedup.minhashPairs(docs, k = 3, pct = 80))
      .select(col("doc_id"), col("cluster_id"))
    val viaB = snap(Dedup.keepBestByQuality(docs, clusters))
    val viaS = snap(Dedup.keepBestByQuality(docs, clusters,
      maxBroadcastLabels = 0))
    assert(viaB == viaS && viaB.nonEmpty)
    val sdB = snap(Similarity.semanticDedup(embs, threshold = 0.4,
      nBits = 6, tables = 3))
    val sdS = snap(Similarity.semanticDedup(embs, threshold = 0.4,
      nBits = 6, tables = 3, maxBroadcastLabels = 0))
    assert(sdB == sdS && sdB.nonEmpty)
    val sgB = snap(Similarity.semDeDupGraph(embs, threshold = 0.4,
      k = 3, numCentroids = 16, nprobe = 2))
    val sgS = snap(Similarity.semDeDupGraph(embs, threshold = 0.4,
      k = 3, numCentroids = 16, nprobe = 2, maxBroadcastLabels = 0))
    assert(sgB == sgS && sgB.nonEmpty)
  }

  test("jl projection preserves norms within the JL band; zero vector exact") {
    import spark.implicits._
    val rows = graft.operators.VectorStats.jlProject(embs, outDims = 16)
      .collect()
    assert(rows.forall(_.getSeq[Double](1).length == 16))
    // the Achlioptas planes give E[ratio]=1 — individual 16-dim
    // projections can swing widely (that's the JL variance), but the
    // corpus MEAN must sit near 1 and no ratio can go negative
    val ratios = rows.map(_.getLong(2))
    assert(ratios.forall(_ >= 0L))
    val mean = ratios.sum.toDouble / ratios.length
    assert(mean > 500000 && mean < 2000000,
      s"mean norm ratio $mean far from 1e6 — planes are biased")
    val zero = Seq((1L, Array.fill(8)(0.0f).toSeq)).toDF("vec_id", "embedding")
    val z = graft.operators.VectorStats.jlProject(zero, outDims = 4).collect()(0)
    assert(z.getLong(2) == 1000000L)
    assert(z.getSeq[Double](1).forall(_ == 0.0))
  }

  test("epoch plan: integer shares consistent, budget respected") {
    val plan = graft.operators.Mixture
      .epochPlan(docs, targetTokens = 1000000L).collect()
    assert(plan.nonEmpty)
    val wSum = plan.map(_.getLong(3)).sum
    assert(wSum <= 1000000L && wSum > 1000000L - plan.length * 2,
      s"weight_ppm sum $wSum not a floor-partition of 1e6")
    assert(plan.map(_.getLong(4)).sum <= 1000000L, "plan exceeds the budget")
    plan.foreach { r =>
      val (nTok, target, epochs) = (r.getLong(2), r.getLong(4), r.getLong(5))
      assert(epochs == (if (nTok == 0) 0L else target * 1000000L / nTok))
    }
    // temperature flattening: a bigger source never gets MORE epochs
    val byTok = plan.sortBy(_.getLong(2)).map(_.getLong(5)).toSeq
    assert(byTok.zip(byTok.drop(1)).forall { case (a, b) => a >= b },
      "epochs_ppm must be non-increasing in source size")
  }

  test("doremi reweighting: hard source gains monotonically, " +
      "smoothing floor holds, uniform losses stay uniform") {
    import spark.implicits._
    val S = 1000000L
    // two sources with very different chars-per-token hardness
    val mixed = Seq(
      (1L, "hard", "supercalifragilistic antidisestablishmentarian"),
      (2L, "hard", "electroencephalographically uncharacteristically"),
      (3L, "easy", "a b c d e f g h i j k l m n o p"),
      (4L, "easy", "x y z w v u t s r q p o n m l k"))
      .toDF("doc_id", "source", "text")
    val traj = graft.operators.Mixture
      .doremiWeights(mixed, rounds = 6).collect()
    assert(traj.length == 12) // 6 rounds x 2 sources
    // per round, alpha is a floor-partition of 1e6
    traj.groupBy(_.getLong(0)).foreach { case (rnd, rows) =>
      val a = rows.map(_.getLong(4)).sum
      assert(a <= S && a > S - 8, s"round $rnd alphas sum $a")
    }
    val hard = traj.filter(_.getString(1) == "hard").sortBy(_.getLong(0))
      .map(_.getLong(4)).toSeq
    val easy = traj.filter(_.getString(1) == "easy").sortBy(_.getLong(0))
      .map(_.getLong(4)).toSeq
    assert(hard.zip(hard.drop(1)).forall { case (a, b) => b >= a },
      s"hard-source weight must be non-decreasing: $hard")
    assert(hard.last > S / 2 && easy.last < S / 2,
      s"hard source must end above uniform: $hard / $easy")
    // DoReMi smoothing keeps every domain sampled: alpha never drops
    // below c * uniform / S
    assert(easy.forall(_ >= 100000L * (S / 2) / S),
      s"smoothing floor violated: $easy")
    // equal losses: excess is 0 every round, weights stay uniform
    val flat = Seq((1L, "s1", "same text here"), (2L, "s2", "same text here"))
      .toDF("doc_id", "source", "text")
    val ftraj = graft.operators.Mixture.doremiWeights(flat, rounds = 4)
      .collect()
    assert(ftraj.forall(r => r.getLong(3) == 0L && r.getLong(4) == S / 2),
      "uniform losses must keep the uniform mixture")
  }

  test("bitext margin mining: true pairs survive mutual, the hub " +
      "vector is filtered despite a positive cosine") {
    import spark.implicits._
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    val a = (0 until 6).map(i => (i.toLong + 1, oneHot(i)))
      .toDF("vec_id", "embedding")
    // side B: the true twins plus a HUB (all-ones) that has a
    // positive cosine with EVERY source — the exact failure mode a
    // raw-cosine threshold over-selects and the margin criterion
    // exists to reject
    val b = ((0 until 6).map(i => (i.toLong + 101, oneHot(i))) :+
      (200L, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val mined = graft.operators.Similarity.bitextMarginMine(a, b,
      k = 4, numCentroids = 2, nprobe = 2, marginPpmMin = 1200000L)
      .collect()
    val pairs = mined.map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(pairs == (1 to 6).map(i => i.toLong -> (i + 100L)).toSet,
      s"expected exactly the six true pairs, got $pairs")
    assert(mined.forall(_.getBoolean(5)),
      "every surviving true pair must be mutual")
    assert(mined.forall(_.getLong(4) > 2000000L),
      "true-pair margins must dominate the threshold")
    // at a RAW-cosine-permissive threshold the hub would appear; the
    // margin keeps it barely above 1.0 — visible but flagged low
    val loose = graft.operators.Similarity.bitextMarginMine(a, b,
      k = 4, numCentroids = 2, nprobe = 2, marginPpmMin = 1000000L)
      .collect()
    val hubRows = loose.filter(_.getLong(1) == 200L)
    assert(hubRows.nonEmpty && hubRows.forall(_.getLong(4) < 1200000L),
      "hub pairs sit in the [1.0, 1.2) margin band")
  }

  test("bitext mining with SHARED id spaces: the aligned pair (i, i) " +
      "is minable — cross-corpus probes must not self-exclude") {
    import spark.implicits._
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    // parallel corpora aligned by LINE NUMBER: side A line i and side
    // B line i are translations — both sides use ids 1..6
    val a = (0 until 6).map(i => (i.toLong + 1, oneHot(i)))
      .toDF("vec_id", "embedding")
    val b = (0 until 6).map(i => (i.toLong + 1, oneHot(i)))
      .toDF("vec_id", "embedding")
    val mined = graft.operators.Similarity.bitextMarginMine(a, b,
      k = 4, numCentroids = 2, nprobe = 2, marginPpmMin = 1200000L)
      .collect()
    val pairs = mined.map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(pairs == (1 to 6).map(i => i.toLong -> i.toLong).toSet,
      s"the aligned (i, i) pairs must be mined, got $pairs")
    assert(mined.forall(_.getBoolean(5)),
      "aligned identical pairs must be mutual")
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

  test("m1/m3 byte-vs-char oracle assumption holds: documents are ASCII") {
    // Multimodal.sampleFrames hashes raw BYTES while the SQL twin
    // slices by CHARACTER — they agree only while every document is
    // single-byte text. This guard makes a future non-ASCII fixture
    // fail loudly here instead of as a confusing hash mismatch.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val bad = d.filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(bad == 0, s"$sf documents contain multi-byte characters; " +
        "m1/m3's byte-sliced hashes no longer match their char-sliced oracles")
    }
  }

  test("ImageCodec decodes real PNG and BMP payloads exactly") {
    // render a 2x2 image with known channel values, encode with each
    // JDK writer, and require decode to return the exact pixel sums
    val px = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220))
    def img(): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      px.zipWithIndex.foreach { case ((r, g, b), i) =>
        im.setRGB(i % 2, i / 2, (r << 16) | (g << 8) | b)
      }
      im
    }
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img(), fmt, bos))
      val bytes = bos.toByteArray
      assert(Multimodal.ImageCodec.matches(bytes), s"$fmt magic")
      val f = Multimodal.ImageCodec.decode(bytes).get
      assert(f(0) == 2.0 && f(1) == 2.0, s"$fmt dims")
      assert(f(2) == px.map(_._1).sum.toDouble, s"$fmt sum_r")
      assert(f(3) == px.map(_._2).sum.toDouble, s"$fmt sum_g")
      assert(f(4) == px.map(_._3).sum.toDouble, s"$fmt sum_b")
    }
    // non-image payloads fall back to the byte-feature stub
    val txt = "plain text payload".getBytes("UTF-8")
    assert(!Multimodal.ImageCodec.matches(txt))
    assert(Multimodal.decodeAny(txt)
      .sameElements(Multimodal.FakeCodec.decode(txt)))
  }

  test("imageDecode round-trips the closed-form pixels through PNG") {
    val out = Multimodal.imageDecode(spark, docs.limit(5))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      def s(mul: Long, step: Long) =
        (0 until 16).map(i => (id * mul + i * step) % 256).sum
      assert(r.getLong(1) == 4 && r.getLong(2) == 4)
      assert(r.getLong(3) == s(7, 13) && r.getLong(4) == s(11, 17) &&
        r.getLong(5) == s(13, 19))
    }
  }

  test("audioEnergy round-trips closed-form PCM through the real WAV codec") {
    val out = Multimodal.audioEnergy(spark, docs.limit(5))
      .orderBy("media_id", "frame").collect()
    assert(out.length == 5 * 8)
    out.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      val expect = (0 until 32).map { j =>
        val s = ((id * 7349L + (f * 32 + j) * 131L + 17L) % 65536L) - 32768L
        s * s
      }.sum
      assert(r.getLong(2) == expect, s"doc $id frame $f")
    }
    // the container leg is a REAL canonical RIFF/WAVE file: 44-byte
    // header + 2 bytes per sample, parseable magic
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](512)), fmt, 256L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(wav.length == 44 + 512)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
  }

  test("encodingReport counts injected probe chars exactly") {
    import spark.implicits._
    // doc 0 ≡ 0 mod 7, 5 and 3 → all three injections fire:
    // u0001 u0002 + "hello" + U+FFFD + accented pair = 10 chars with
    // 2 control, 1 replacement, 3 non-ASCII; doc 1 gets nothing (1 char)
    val docs = Seq((0L, "s", "hello"), (1L, "s", "x"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.encodingReport(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 2L) // n_docs
    assert(row.getLong(2) == 1L) // ctl_docs: only doc 0
    assert(row.getLong(3) == 2L) // ctl_chars
    assert(row.getLong(4) == 1L) // fffd_chars
    assert(row.getLong(5) == (3L * 1000) / 11) // 3 non-ASCII of 11 chars
  }

  test("exact dedup keeps one representative per normalized text") {
    val n = Dedup.exact(docs).count()
    val distinct = docs.select(Dedup.normKey(col("text"))).distinct().count()
    assert(n == distinct)
  }

  test("cluster resolution labels transitive groups with the min id") {
    import spark.implicits._
    // chain 1-2-3 (pairwise drop would kill 2 AND 3), isolated pair
    // (10,11), triangle (20,21,22)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 20L, false), (22L, 20L, false)))
  }

  test("cluster resolution of an empty pair set is empty, not an error") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.resolveClusters(pairs).count() == 0)
  }

  test("cluster resolution converges on a long chain within maxIters") {
    import spark.implicits._
    // a 12-vertex path: diameter 11, min label must still reach the end
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(1)).toSet
    assert(labels == Set(0L))
  }

  test("cluster resolution refuses to return a non-converged labeling") {
    import spark.implicits._
    // diameter 5 > maxIters 3: a silent return here would emit two
    // keep=true rows for one transitive cluster
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      Dedup.resolveClusters(pairs, maxIters = 3)
    }
  }

  test("star contraction labels the chain/pair/triangle fixture like min-label") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val got = Dedup.resolveClustersStars(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 20L, false), (22L, 20L, false)))
    assert(Dedup.resolveClustersStars(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
  }

  test("star contraction resolves a deep chain in far fewer rounds than its diameter") {
    import spark.implicits._
    // a 41-vertex path: min-label needs ~40 rounds (resolveClusters
    // would throw at maxIters=12); stars contract it within 12
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.resolveClustersStars(pairs, maxIters = 12).collect()
    assert(labels.length == 41)
    assert(labels.map(_.getLong(1)).toSet == Set(0L))
    assert(labels.count(_.getBoolean(2)) == 1)
  }

  test("star contraction agrees with min-label propagation on real pairs") {
    val pairs = Dedup.simhashPairs(docs, maxDist = 3).select("a_id", "b_id")
    val viaStars = Dedup.resolveClustersStars(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaLabels = Dedup.resolveClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaStars == viaLabels)
    assert(viaStars.nonEmpty)
  }

  test("bloom-prefiltered decontamination is exactly the broadcast-set manifest") {
    val isEval = col("doc_id") % 50 === 0
    val exact = Decontaminate.ngramOverlap(docs, isEval, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // a false NEGATIVE would lose a hit; an unconfirmed false
    // POSITIVE would invent one — equality rules out both
    val bloom = Decontaminate.bloomNgramOverlap(docs, isEval, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloom == exact)
    assert(exact.exists(_._3), "fixture should contain contamination")
    // a deliberately tiny bitmap saturates (every probe hits), and the
    // exact confirm must still repair it to the same manifest
    val tiny = Decontaminate.bloomNgramOverlap(docs, isEval, k = 5,
      mBits = 64, nHashes = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(tiny == exact)
  }

  test("sequence packing manifest places and straddle-counts exactly") {
    import spark.implicits._
    // one bucket so the walk is deterministic: docs of 3, 4, 6, 2
    // tokens into seqLen=8: cum = 3, 7, 13, 15
    //   doc 0: off 0, pack 0, fits          -> n_packs 1
    //   doc 1: off 3, pack 0, 3+4 <= 8      -> n_packs 1
    //   doc 2: off 7, pack 0, straddles     -> n_packs 2
    //   doc 3: off 5, pack 1, fits          -> n_packs 1
    val in = Seq((0L, "a b c"), (1L, "a b c d"), (2L, "a b c d e f"),
      (3L, "a b")).toDF("doc_id", "text")
    val got = operators.Packing.packManifest(in, seqLen = 8, buckets = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 3L, 0L, 0L, 1L),
      (1L, 4L, 0L, 3L, 1L),
      (2L, 6L, 0L, 7L, 2L),
      (3L, 2L, 1L, 5L, 1L)))
    // bucketed run: every bucket's packing is internally consistent
    // (offset = previous cum % seqLen) and buckets partition the docs
    val many = operators.Packing.packManifest(docs, seqLen = 512,
      buckets = 8).collect()
    assert(many.length == docs.count())
    assert(many.map(_.getLong(2)).distinct.length > 1, "multiple buckets")
  }

  test("key-skew profile ranks heavy hitters with exact ppm shares") {
    import spark.implicits._
    // key 7 dominates: 6 of 10 rows = 600000 ppm, 4 distinct keys
    val in = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 3L)).map(Tuple1(_))
      .toDF("k")
    val got = operators.Profile.keySkew(in, "k", topN = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (7L, 6L, 600000L, 10L, 4L),
      (3L, 2L, 200000L, 10L, 4L),
      (1L, 1L, 100000L, 10L, 4L)))
  }

  test("quota sample two-phase top-k equals the single-window rank") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val ref = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.fingerprint(col("doc_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    val got = SparkEntry.queries("q49_quota_sample")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == ref)
  }

  test("repetition scores count gram multiplicities exactly") {
    import spark.implicits._
    // "a b a b a b": bigrams = [ab, ba, ab, ba, ab] -> top 3/5;
    // trigrams = [aba, bab, aba, bab] -> every occurrence duplicated
    val in = Seq((0L, "a b a b a b"), (1L, "x y z w")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(
      (0L, 5L, 3L, 0.6, 1.0),
      (1L, 3L, 1L, 1.0 / 3.0, 0.0)))
  }

  test("decontamination flags docs sharing a k-gram with the eval set") {
    import spark.implicits._
    val in = Seq(
      (0L, "one two three four"),          // eval
      (1L, "zzz one two three qqq"),       // shares "one two three"
      (2L, "totally different words here") // clean
    ).toDF("doc_id", "text")
    val got = Decontaminate.ngramOverlap(in, col("doc_id") === 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == Set((1L, 1L, true), (2L, 0L, false)))
  }

  test("mixture rebalance keeps fair-share rates, deterministic coin") {
    import spark.implicits._
    // 10 en + 2 fr: total=12, fair share 6 -> en rate 600‰, fr capped 1000‰
    val in = ((0L until 10L).map(i => (i, "en")) ++
      Seq((100L, "fr"), (101L, "fr"))).toDF("doc_id", "lang")
    val got = Mixture.rebalanceUniform(in)
    val rates = got.select("lang", "rate_mil").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rates.get("fr").contains(1000L))
    assert(rates.get("en").forall(_ == 600L))
    // the coin replays: kept ids are exactly hash(id) mod 1000 < rate
    val expected = in.select(col("doc_id"), col("lang"),
        TextAnalysis.fingerprint(col("doc_id").cast("string")).as("h"))
      .collect()
      .filter(r => r.getLong(2) % 1000 <
        (if (r.getString(1) == "en") 600 else 1000))
      .map(_.getLong(0)).toSet
    assert(got.collect().map(_.getLong(0)).toSet == expected)
  }

  test("pmi pairs score document co-occurrence with integer math") {
    import spark.implicits._
    val in = ((0L until 6L).map(i => (i, "p q")) ++
      (6L until 12L).map(i => (i, "p r"))).toDF("doc_id", "text")
    val got = CorpusStats.pmiTopPairs(in, minPairDocs = 5, topN = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // pmi_x1000 = n_ab * N * 1000 / (n_a*n_b) = 6*12*1000/(12*6) = 1000
    assert(got == Set(
      ("p", "q", 6L, 12L, 6L, 1000L),
      ("p", "r", 6L, 12L, 6L, 1000L)))
  }

  test("label centroids are the exact dimension-wise mean") {
    import spark.implicits._
    val in = Seq(
      (0L, Seq(1.0f, -2.0f), 7),
      (1L, Seq(3.0f, 4.0f), 7),
      (2L, Seq(0.5f, 0.25f), 8)).toDF("vec_id", "embedding", "label")
    val got = operators.VectorStats.labelCentroids(in).collect()
      .map(r => (r.getInt(2 - 2), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (7, 0, 2L, 2.0), (7, 1, 2L, 1.0),
      (8, 0, 1L, 0.5), (8, 1, 1L, 0.25)))
  }

  test("int8 quantization rounds half-up and survives zero vectors") {
    import spark.implicits._
    val in = Seq(
      (0L, Seq(1.0f, -0.5f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = operators.VectorStats.quantizeInt8(in).orderBy("vec_id")
      .collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(0).getSeq[Int](2) == Seq(127, -63, 0))
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(1).getSeq[Int](2) == Seq(0, 0, 0))
  }

  test("split assignment is a pure per-row hash rule") {
    val got = operators.Mixture.splitAssign(docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val h = r.getLong(2)
      val want = if (h < 900) "train" else if (h < 950) "val" else "test"
      assert(r.getString(3) == want)
    }
    // repartitioning must not change any assignment
    val re = operators.Mixture.splitAssign(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    got.foreach(r => assert(re(r.getLong(0)) == r.getString(3)))
  }

  test("incremental minhash equals the full run restricted to the boundary") {
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val indexDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = Dedup.minhashPairsAgainst(newDocs, indexDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the full corpus run emits a<b pairs; normalize and keep only
    // pairs crossing the new/index boundary
    val full = Dedup.minhashPairs(docs, pct = 80).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }
      .toSet
    assert(inc == full)
  }

  test("incremental embedding lsh equals the full run restricted to the boundary") {
    val newVecs = embs.filter(col("vec_id") % 10 === 0)
    val indexVecs = embs.filter(col("vec_id") % 10 =!= 0)
    val inc = Similarity.lshCosinePairsAgainst(newVecs, indexVecs,
      threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.lshCosinePairs(embs, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }
      .toSet
    assert(inc == full)
  }

  test("zorder key interleaves bits; buckets bound both dimensions") {
    import spark.implicits._
    // a=3 (bits 0,1 -> positions 0,2), b=1 (bit 0 -> position 1)
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(operators.Layout.zorderKey(col("a"), col("b")))
      .collect()(0).getLong(0)
    assert(z == 7L)
    // adjacent-in-z rows are close in BOTH dims: each 2^14 bucket of a
    // 16-bit interleave spans at most 2^7 distinct values per dim
    val li = Tables.lineitem(spark, sf)
    val stats = operators.Layout.zorderStats(li, "l_partkey", "l_suppkey")
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 128, "a-range too wide")
      assert(r.getLong(5) - r.getLong(4) < 128, "b-range too wide")
      assert(r.getLong(6) == 0L, "no key outside [0, 2^16) at this sf")
    }
    // out-of-domain keys alias (documented bound) but are NOT silent:
    // zorderStats reports them per-bucket as n_clipped
    val clipped = Seq((65536L + 3L, 1L), (3L, 1L)).toDF("x", "y")
    val cs = operators.Layout.zorderStats(clipped, "x", "y").collect()
    assert(cs.map(_.getLong(1)).sum == 2L)
    assert(cs.map(_.getLong(6)).sum == 1L, "aliased key must be counted")
  }

  test("cluster resolution keeps exactly one representative per group") {
    val clusters = Dedup.resolveClusters(Dedup.minhashPairs(docs, pct = 80))
    val perCluster = clusters.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
      .collect()
    assert(perCluster.nonEmpty && perCluster.forall(_.getLong(1) == 1))
  }

  test("winnowing selects every window's minimum, from the doc's own grams") {
    val k = 3; val w = 4
    val sel = TextAnalysis.winnowFingerprints(docs, k, w).collect()
      .map(r => r.getLong(0) ->
        r.getString(2).split(",").map(_.toLong).toSet).toMap
    val grams = docs.select(col("doc_id"),
      graft.functions.hashFunctions.gram_fps(col("text"), k).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sel.keySet == grams.keySet)
    grams.foreach { case (id, gs) =>
      val fps = sel(id)
      // selected hashes come from the document itself
      assert(fps.subsetOf(gs.toSet))
      // the winnowing guarantee: every complete window of w grams has
      // its minimum selected
      val wins = if (gs.length <= w) Seq(gs) else gs.sliding(w).toSeq
      wins.foreach(win => assert(fps.contains(win.min)))
      // density: never more fingerprints than windows
      assert(fps.size <= wins.size)
    }
  }

  test("boilerplate grams rank within-source df above the pct floor") {
    import spark.implicits._
    val tpl = "copyright acme corp all rights reserved"
    val fixture = (1 to 10).map(i => (i.toLong, s"unique$i words here $tpl", "sA")) ++
      Seq((11L, "copyright acme corp", "sB"), (12L, "other text entirely", "sB"))
    val out = CorpusStats.boilerplateGrams(
      fixture.toDF("doc_id", "text", "source"), k = 3, minPct = 60, topN = 3)
      .collect()
    // source sA: the template's grams are in 10/10 docs — all above 60%
    val sA = out.filter(_.getString(0) == "sA")
    assert(sA.nonEmpty && sA.forall(_.getLong(3) == 10L))
    assert(sA.map(_.getInt(1)).sorted.sameElements(1 to sA.length))
    // source sB: each gram sits in 1 of 2 docs (50%) — below the floor
    assert(!out.exists(_.getString(0) == "sB"))
  }

  test("containment pairs catch an embedded document that Jaccard misses") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val padding = (1 to 160).map(i => s"pad$i").mkString(" ")
    val fixture = Seq((1L, base), (2L, base + " " + padding))
      .toDF("doc_id", "text")
    // doc 1 is wholly embedded in doc 2: every complete window of
    // doc 1's gram stream also occurs in doc 2, so the winnowed
    // fingerprints of 1 are a subset of 2's → containment = 100%
    val cont = Dedup.winnowContainmentPairs(fixture, k = 3, w = 4,
      pct = 60).collect()
    assert(cont.length == 1)
    assert(cont(0).getLong(0) == 1L && cont(0).getLong(1) == 2L)
    val shared = cont(0).getAs[Number]("shared").longValue
    val minFp = cont(0).getAs[Number]("min_fp").longValue
    assert(shared * 100 >= minFp * 60)
    // the same pair under symmetric Jaccard: |A∩B|/|A∪B| ≈ 19%,
    // invisible at any useful threshold
    assert(Dedup.jaccardPairs(fixture, k = 3, pct = 60).collect().isEmpty)
  }

  test("frame sampling emits every 2nd full frame with its byte hash") {
    import spark.implicits._
    val text = "x" * 70 // 4 full 16-byte frames, sampled: idx 0 and 2
    val one = Seq((9L, text, "en", "s", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.sampleFrames(spark, one).collect()
      .sortBy(_.getLong(2))
    assert(rows.length == 2)
    assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 32L))
    val fp16 = graft.functions.HashOps.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("x" * 16))
    assert(rows.forall(_.getLong(4) == fp16))
  }

  test("split leakage flags exactly the cross-split near-dup pairs") {
    import spark.implicits._
    // short numeric ids hash disproportionately into train — search a
    // wide id range for one of each split
    val ids = (1L to 2000L)
    val splitOf = Mixture.splitAssign(
      ids.map(i => (i, "en")).toDF("doc_id", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val trainId = ids.find(splitOf(_) == "train").get
    val otherId = ids.find(i => splitOf(i) != "train").get
    val train2 = ids.find(i => splitOf(i) == "train" && i != trainId).get
    val near = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (trainId, near + " tailone"),
      (otherId, near + " tailtwo"), // near-dup of trainId, other split
      (train2, "completely different words making no shingle overlap"))
      .toDF("doc_id", "text")
    val out = Mixture.splitLeakage(docs).collect()
    assert(out.length == 1)
    assert(Set(out(0).getLong(0), out(0).getLong(1)) == Set(trainId, otherId))
    assert(out(0).getString(2) != out(0).getString(3))
  }

  test("cluster-aware split eliminates near-dup leakage, moves only paired docs") {
    val pairs = Dedup.minhashPairs(docs, pct = 80).select("a_id", "b_id")
    val sp = Mixture.clusterAwareSplit(docs).select(col("doc_id"), col("split"))
    // zero cross-split near-dup pairs by construction
    val crossed = pairs
      .join(sp.toDF("a_id", "a_split"), "a_id")
      .join(sp.toDF("b_id", "b_split"), "b_id")
      .filter(col("a_split") =!= col("b_split"))
    assert(crossed.isEmpty)
    // documents in no pair keep exactly the plain splitAssign rule
    val paired = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    val plain = Mixture.splitAssign(docs).select(col("doc_id"), col("split"))
    val moved = sp.join(plain.toDF("doc_id", "plain_split"), "doc_id")
      .filter(col("split") =!= col("plain_split"))
      .join(paired, Seq("doc_id"), "left_anti")
    assert(moved.isEmpty, "an unpaired document changed split")
  }

  test("clean-chunk pipeline only chunks decontaminated dedup survivors") {
    import graft.operators.CurationPipeline
    val isEval = col("doc_id") % 50 === 0
    val outDocs = CurationPipeline.curateToChunks(docs, isEval)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(outDocs.nonEmpty)
    // eval docs are never chunked
    assert(outDocs.forall(_ % 50 != 0))
    // contaminated docs are never chunked
    val dirty = Decontaminate.ngramOverlap(docs, isEval, 5)
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    assert(outDocs.intersect(dirty).isEmpty)
  }

  test("hashed bow buckets every token exactly once") {
    val rows = TextAnalysis.hashedBow(docs, dim = 32).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val counts = r.getString(2).split(",", -1).map(_.toLong)
      assert(counts.length == 32)
      assert(counts.sum == r.getAs[Number]("n_tokens").longValue,
        "bucket counts must partition the token stream")
    }
  }

  test("chunk manifest tiles documents with the declared overlap") {
    import spark.implicits._
    val one = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ch = operators.Packing
      .chunkManifest(one, chunkTokens = 10, overlap = 2).collect()
      .sortBy(_.getAs[Number]("chunk_id").longValue)
    // stride 8 over 100 tokens: ceil(98/8) = 13 chunks
    assert(ch.length == 13)
    ch.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Number]("start_tok").longValue == 8L * i)
    }
    // full chunks are exactly chunkTokens; the final one is the tail
    assert(ch.init.forall(_.getAs[Number]("n_tok").longValue == 10L))
    val last = ch.last
    assert(last.getAs[Number]("start_tok").longValue +
      last.getAs[Number]("n_tok").longValue == 100L)
    // fingerprints are over the chunk's actual tokens
    val fp0 = graft.functions.HashOps.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        (1 to 10).map(i => s"w$i").mkString(" ")))
    assert(ch.head.getAs[Number]("chunk_fp").longValue == fp0)
  }

  test("ann recall report measures hits against brute-force truth") {
    val rep = Similarity.annRecallReport(embs,
      embs.filter(col("vec_id") < 3), k = 5).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rep.keySet == Set("ivf", "lsh"))
    rep.foreach { case (m, (truth, hits, mille)) =>
      assert(truth == 15, s"$m truth should be k*queries")
      assert(hits >= 0 && hits <= truth, s"$m hits out of range")
      assert(mille == hits * 1000 / truth, s"$m recall formula")
    }
    // on this fixture the 16-list/2-probe IVF index recalls far more
    // than a single 4-bit LSH table — the measurement that motivates
    // dd5/dd6's multi-table LSH
    assert(rep("ivf")._2 > rep("lsh")._2)
  }

  test("int8 reconstruction error stays within half a quantization step") {
    import operators.VectorStats
    val rows = VectorStats.quantError(embs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, maxErr, meanErr) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // round-half-up: every element lands within scale/254 of itself
      assert(maxErr <= scale / 254.0 + 1e-12,
        s"max error $maxErr exceeds half step ${scale / 254.0}")
      assert(meanErr >= 0.0 && meanErr <= maxErr + 1e-12)
    }
  }

  test("edit-distance pairs equal unbounded levenshtein on banded candidates") {
    val got = Dedup.editDistancePairs(docs, maxDist = 60, prefixLen = 160)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty, "fixture should contain small-edit near-dups")
    assert(got.forall(_._3 <= 60))
    // the threshold DP must return the TRUE distance for kept pairs —
    // recompute each with the unbounded form on the same prefixes
    import spark.implicits._
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).take(160)).toMap
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    got.foreach { case (a, b, d) =>
      assert(lev(texts(a), texts(b)) == d, s"pair ($a,$b)")
    }
  }

  test("token-budget selection equals the naive global-window prefix") {
    import org.apache.spark.sql.expressions.Window
    val got = operators.Packing.tokenBudgetSelect(docs, budget = 12000L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    assert(got.nonEmpty && got.forall(_._3 <= 12000L))
    // ranks are the contiguous prefix 1..n
    assert(got.map(_._2).toSeq == (1L to got.length).toSeq)
    // the histogram-refined plan must reproduce the single-window truth
    val w = Window.orderBy(col("quality").desc, col("doc_id"))
    val naive = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("pick_rank", row_number().over(w))
      .withColumn("cum_tokens", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 12000L)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(4)))
      .sortBy(_._2)
    assert(got.toSeq == naive.map(t => (t._1, t._2, t._3)).toSeq)
  }

  test("int8 topk scores cancel scales: hand-computed 2-d fixture") {
    import spark.implicits._
    // v0=[1,0] -> codes [127,0]; v1=[0.5,0.5] -> [127,127];
    // v2=[-0.25,0.75] -> scale .75, codes [floor(-42.33+.5)=-42, 127]
    val vecs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(-0.25f, 0.75f))).toDF("vec_id", "embedding")
    val got = Similarity.int8TopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    def sc(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val c0 = Array(127L, 0L); val c1 = Array(127L, 127L)
    val c2 = Array(-42L, 127L)
    assert(got.length == 2)
    assert(got(0) == ((1, 1L, sc(c0, c1))))
    assert(got(1) == ((2, 2L, sc(c0, c2))))
    // and zero vectors score 0 instead of dividing by zero
    val z = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val zs = Similarity.int8TopK(z, z.filter(col("vec_id") === 0), k = 1)
      .collect()
    assert(zs.length == 1 && zs(0).getDouble(3) == 0.0)
  }

  test("pii report counts and redacts emails, ipv4, and phone fragments") {
    import spark.implicits._
    val in = Seq(
      (0L, "mail me at jo.doe@corp.example.org or box 10.0.0.1 call 555-0199"),
      (1L, "no pii here just words")).toDF("doc_id", "text")
    val got = TextAnalysis.piiReport(in, col("text")).orderBy("doc_id")
      .collect()
    assert((got(0).getInt(1), got(0).getInt(2), got(0).getInt(3)) == ((1, 1, 1)))
    assert((got(1).getInt(1), got(1).getInt(2), got(1).getInt(3)) == ((0, 0, 0)))
    // doc 1 untouched: fingerprint equals the original text's
    val fp1 = in.filter(col("doc_id") === 1)
      .select(TextAnalysis.fingerprint(col("text"))).collect()(0).getLong(0)
    assert(got(1).getLong(4) == fp1)
    // doc 0 fully redacted: the redacted text matches the placeholders
    val red = in.filter(col("doc_id") === 0)
      .select(TextAnalysis.redactPii(col("text"))).collect()(0).getString(0)
    assert(red == "mail me at <EMAIL> or box <IP> call <PHONE>")
  }

  test("sqrt mixture flattens toward the geometric mean, never upsamples") {
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = byLang.values.min
    val out = Mixture.rebalanceSqrt(docs).collect()
    val rates = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    rates.foreach { case (lang, rate) =>
      assert(rate == math.floor(
        1000.0 * math.sqrt(nMin.toDouble / byLang(lang).toDouble)).toLong)
      assert(rate <= 1000L)
    }
    // the smallest group keeps (almost) everything: rate for n_min is
    // exactly 1000 only when sqrt rounds to 1 — with n_g = n_min it is
    assert(rates(byLang.minBy(_._2)._1) == 1000L)
    // flattening, not capping: for groups ABOVE fair share (the ones
    // uniform rebalance cuts hardest) the sqrt rule keeps MORE —
    // below-fair-share groups it keeps less than "everything", which
    // is the temperature trade
    val total = byLang.values.sum
    byLang.foreach { case (lang, n) =>
      val uniform = total * 1000L / (byLang.size * n)
      if (uniform < 1000L)
        assert(rates(lang) >= uniform - 1,
          s"$lang sqrt=${rates(lang)} uniform=$uniform")
    }
  }

  test("lm score is the exact mean conditional per-mille on a hand fixture") {
    import spark.implicits._
    // doc1 bigrams: (a b)(b a)(a b); doc2: (a b)(b c)
    // c2: ab=3, ba=1, bc=1; c1 (bigram-first): a=3, b=2
    // doc1: (1000 + 500 + 1000) div 3 = 833; doc2: (1000+500) div 2 = 750
    val in = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = CorpusStats.lmScore(in).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 833L), (2L, 2L, 750L)))
  }

  test("shard audit: every pack full except each bucket's ragged tail") {
    val audit = operators.Packing.packShardAudit(docs, seqLen = 512,
      buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastPack = audit.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    audit.foreach { case (bucket, pack, _, nToks) =>
      if (pack < lastPack(bucket))
        assert(nToks == 512L, s"bucket $bucket pack $pack has $nToks")
      else assert(nToks <= 512L)
    }
    // the audit partitions the token stream exactly
    val total = docs.select(
      sum(TextAnalysis.tokenCount(col("text")))).collect()(0).getLong(0)
    assert(audit.map(_._4).sum == total)
    // packs are contiguous from 0 within each bucket
    audit.groupBy(_._1).foreach { case (_, rows) =>
      val packs = rows.map(_._2).sorted
      assert(packs.toSeq == (0L to packs.max).toSeq)
    }
  }

  test("compaction bins are contiguous, exact, and boundary-crossing") {
    val target = 1000L
    val bins = operators.Layout.compactionBins(docs, "source", "doc_id",
      "n_chars", target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = docs.agg(sum(col("n_chars").cast("long")))
      .collect()(0).getLong(0)
    assert(bins.map(_._4).sum == total)
    bins.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous bin ids from 0
      assert(sorted.map(_._2).toSeq == (0L until rows.length).toSeq)
      // every non-last bin's cumulative end crossed its boundary (the
      // bin closed because the target was reached, not arbitrarily)
      var cum = 0L
      sorted.dropRight(1).foreach { case (_, bin, _, bytes) =>
        cum += bytes
        assert(cum >= (bin + 1) * target)
      }
    }
  }

  test("duplicate spans: shared substrings merge to one maximal span each") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota" // 9 words
    val other = "one two three four five six seven" // 7 words
    val corpus = Seq(
      (1L, s"unique opening words here $shared and a unique tail"),
      (2L, s"$shared totally different continuation text follows now"),
      (3L, "nothing in this document repeats anywhere else at all"),
      (4L, s"prefix text $other suffix text"),
      (5L, s"another beginning $other and another end"),
      // within-doc repetition only — cross-doc detector must NOT fire
      (6L, s"$other $other")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 5, minGrams = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    // docs 1 and 2 share the 9-word run: 5 consecutive 5-gram
    // positions -> ONE span of n_grams=5, n_tokens=9 in each
    val d1 = spans.filter(_._1 == 1L)
    val d2 = spans.filter(_._1 == 2L)
    assert(d1.length == 1 && d2.length == 1)
    assert(d1.head._4 == 5 && d1.head._5 == 9)
    assert(d2.head._4 == 5 && d2.head._5 == 9)
    assert(d1.head._2 == 4, "doc 1's span starts after its 4-word prefix")
    assert(d2.head._2 == 0, "doc 2's span starts at position 0")
    // the 7-word run shared by 4, 5 and 6: 3 grams, 7 tokens
    assert(spans.filter(_._1 == 4L).map(s => (s._4, s._5)).toSeq ==
      Seq((3L, 7)))
    // doc 3 has no cross-doc overlap
    assert(!spans.exists(_._1 == 3L))
    // doc 6's two copies both match docs 4/5 cross-doc -> spans exist,
    // but remove doc 4 and 5 and ONLY-within-doc repetition is silent
    val solo = Dedup.duplicateSpans(corpus.filter(col("doc_id") >= 6L),
      k = 5, minGrams = 1).collect()
    assert(solo.isEmpty, "within-doc repetition must not fire the CROSS-doc detector")
    // minGrams filters short spans
    val long = Dedup.duplicateSpans(corpus, k = 5, minGrams = 4).collect()
      .map(_.getLong(0)).toSet
    assert(long == Set(1L, 2L), "minGrams=4 keeps only the 5-gram span")
  }

  test("gram matrix equals the driver-side exact second moment") {
    val vecs = embs.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val d = vecs.head.length
    val got = operators.VectorStats.gramMatrix(embs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == d * (d + 1) / 2, "full upper triangle present")
    // exact truth in the same fixed-point arithmetic (sum of
    // floor(product * 2^40) is order-independent over integers)
    val scale = 1099511627776.0
    for (i <- 0 until d; j <- i until d) {
      val s = vecs.map(v => math.floor(
        v(i).toDouble * v(j).toDouble * scale)).map(BigDecimal(_)).sum
      val (n, gram) = got((i, j))
      assert(n == vecs.length)
      assert(gram == (s / BigDecimal(scale)).toDouble,
        s"G[$i][$j] mismatch")
    }
    // diagonal entries are sums of squares -> nonnegative
    assert((0 until d).forall(i => got((i, i))._2 >= 0.0))
  }

  test("pca projection: unit direction, exact distributed dot, top-axis variance") {
    val dir = operators.VectorStats.pcaDirection(embs)
    // the L2 norm the fixed-point normalization targeted
    assert(math.abs(dir.map(x => x * x).sum - 1.0) < 1e-9, "unit direction")
    val got = operators.VectorStats.pcaProject(embs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(got.size == vecs.length)
    // distributed HOF projection == plain scalar fixed-point dot
    val scale = 1099511627776.0
    vecs.foreach { case (id, v) =>
      val s = v.indices.map(i =>
        math.floor(v(i).toDouble * dir(i) * scale).toLong).sum
      assert(got(id) == s.toDouble / scale, s"pc1 mismatch for vec $id")
    }
    // the trained direction captures at least as much variance as any
    // single coordinate axis (the floor of what a converged top
    // component guarantees)
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val pcVar = variance(vecs.map { case (id, _) => got(id) })
    val d = vecs.head._2.length
    (0 until d).foreach { i =>
      val axis = variance(vecs.map(_._2(i).toDouble))
      assert(pcVar >= axis - 1e-12, s"pc1 variance below axis $i")
    }
  }

  test("pq top-k equals a driver-side ADC reranking from the same codebooks") {
    val m = 4; val ksub = 4; val k = 3
    val got = Similarity.pqTopK(embs, embs.filter(col("vec_id") < 2),
        k = k, m = m, ksub = ksub, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val d = vecs.head._2.length; val len = d / m
    // independent plain-Scala replication: slice, read the trained
    // codebooks, encode by (dist2, cid)-min, rank by ADC
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s = s + a(i) * b(i); i += 1 }; s
    }
    val books = (0 until m).map { s =>
      operators.VectorStats.kmeansCentroids(
        embs.select(col("vec_id"),
          slice(col("embedding"), s * len + 1, len).as("embedding")),
        ksub, 2).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    }
    def subv(v: Array[Float], s: Int): Array[Double] =
      v.slice(s * len, s * len + len).map(_.toDouble)
    def nearest(v: Array[Float], s: Int): (Long, Double) = {
      val q = subv(v, s); val xx = dot(q, q)
      books(s).map { case (cid, c) =>
        (cid, xx - 2.0 * dot(q, c) + dot(c, c))
      }.minBy { case (cid, dist) => (dist, cid) }
    }
    for (qid <- 0L until 2L) {
      val qv = vecs.find(_._1 == qid).get._2
      val tables = (0 until m).map { s =>
        val q = subv(qv, s); val xx = dot(q, q)
        books(s).map { case (cid, c) =>
          cid -> (xx - 2.0 * dot(q, c) + dot(c, c))
        }.toMap
      }
      val want = vecs.filter(_._1 != qid).map { case (id, v) =>
        var adist = 0.0
        (0 until m).foreach(s => adist += tables(s)(nearest(v, s)._1))
        (id, adist)
      }.sortBy { case (id, a) => (a, id) }.take(k)
      want.zipWithIndex.foreach { case ((id, a), i) =>
        assert(got((qid, i + 1)) == ((id, a)),
          s"query $qid rank ${i + 1} mismatch")
      }
    }
  }

  test("strip spans cuts exactly the dd16-reported token ranges") {
    val k = 4
    val spans = Dedup.duplicateSpans(docs, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    val toks = docs.selectExpr("doc_id",
        "filter(split(trim(lower(text)), '\\\\s+'), t -> t != '') AS t")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = Dedup.stripSpans(docs, k = k).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(got.size == toks.size, "every input doc is emitted")
    toks.foreach { case (id, ts) =>
      val cut = spans.getOrElse(id, Array.empty[(Long, Int, Int)])
        .flatMap { case (_, s, e) => s to (e + k - 1) }.toSet
      val kept = ts.indices.filterNot(cut).map(ts)
      val (n, rem, text) = got(id)
      assert(n == ts.length && rem == (ts.length - kept.length)
        && text == kept.mkString(" "), s"doc $id rewrite mismatch")
    }
    // at least one doc in the synthetic corpus actually gets cut, and
    // none is cut beyond its length
    assert(got.values.exists(_._2 > 0))
    assert(got.values.forall(v => v._2 <= v._1))
  }

  test("ivf-pq top-k equals a driver-side probed-ADC replication") {
    import scala.jdk.CollectionConverters._
    val (nc, nprobe, m, ksub, k) = (4, 2, 4, 4, 3)
    val got = Similarity.ivfPqTopK(embs, embs.filter(col("vec_id") < 2),
        k = k, numCentroids = nc, nprobe = nprobe, m = m, ksub = ksub,
        iters = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .sortBy(_._1)
    val d = vecs.head._2.length; val len = d / m
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s = s + a(i) * b(i); i += 1 }; s
    }
    def argmin(v: Array[Double], books: Seq[(Long, Array[Double])])
        : (Long, Double) = {
      val xx = dot(v, v)
      books.map { case (cid, c) => (cid, xx - 2.0 * dot(v, c) + dot(c, c)) }
        .minBy { case (cid, dist) => (dist, cid) }
    }
    val coarse = operators.VectorStats.kmeansCentroids(embs, nc, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toSeq.sortBy(_._1)
    // residuals re-derived independently, then the SAME training code
    // (training exactness itself is the oracle's job)
    val resid = vecs.map { case (id, v) =>
      val (lcid, _) = argmin(v, coarse)
      val c = coarse.find(_._1 == lcid).get._2
      (id, lcid, v.indices.map(i => v(i) - c(i)).toArray)
    }
    val residDf = spark.createDataFrame(
      resid.map { case (id, _, r) => org.apache.spark.sql.Row(id, r.toSeq) }
        .toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val books = operators.Similarity.pqCodebooks(residDf, m, ksub, 1)
      .map(_.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
        .sortBy(_._1))
    for (qid <- 0L until 2L) {
      val qv = vecs.find(_._1 == qid).get._2
      val probedLists = coarse
        .map { case (cid, c) =>
          (cid, dot(qv, qv) - 2.0 * dot(qv, c) + dot(c, c)) }
        .sortBy { case (cid, dist) => (dist, cid) }.take(nprobe)
      val cands = probedLists.flatMap { case (lcid, _) =>
        val c = coarse.find(_._1 == lcid).get._2
        val qr = qv.indices.map(i => qv(i) - c(i)).toArray
        val tables = (0 until m).map { s =>
          val qs = qr.slice(s * len, s * len + len)
          books(s).map { case (bcid, b) =>
            bcid -> (dot(qs, qs) - 2.0 * dot(qs, b) + dot(b, b)) }.toMap
        }
        resid.filter(r => r._2 == lcid && r._1 != qid).map {
          case (id, _, rv) =>
            var adist = 0.0
            (0 until m).foreach { s =>
              val rs = rv.slice(s * len, s * len + len)
              adist += tables(s)(argmin(rs, books(s))._1)
            }
            (id, adist)
        }
      }
      val want = cands.sortBy { case (id, a) => (a, id) }.take(k)
      want.zipWithIndex.foreach { case ((id, a), i) =>
        assert(got((qid, i + 1)) == ((id, a)),
          s"query $qid rank ${i + 1} mismatch")
      }
    }
  }

  test("whitened pca map has unit variance and decorrelated axes") {
    // more iterations than the declared query's 24: this test checks
    // CONVERGENCE properties (the oracle checks exactness at any
    // iteration count), and the tiny fixture's eigengap is small
    val rows = operators.VectorStats.pcaWhiten2(embs, iters = 96).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == embs.count())
    val n = rows.length.toDouble
    val (w1, w2) = (rows.map(_._2), rows.map(_._3))
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // whitening contract: each coordinate has variance ≈ 1 (exact at
    // full eigen-convergence; 24 power iterations get within a few %)
    assert(math.abs(variance(w1) - 1.0) < 0.05, s"var(w1)=${variance(w1)}")
    assert(math.abs(variance(w2) - 1.0) < 0.05, s"var(w2)=${variance(w2)}")
    // deflation contract: the two axes are decorrelated
    val (m1, m2) = (w1.sum / n, w2.sum / n)
    val cov12 = w1.zip(w2).map { case (a, b) => (a - m1) * (b - m2) }.sum / n
    assert(math.abs(cov12) < 0.05, s"cov(w1,w2)=$cov12")
  }

  test("count-min sketch never under-counts and brackets the hot key") {
    import spark.implicits._
    val keys = (Seq.fill(500)("hot") ++ (1 to 300).map(i => s"k$i"))
    val df = keys.toDF("k")
    val rep = operators.Profile.cmsHeavyHitters(df, "k", topN = 301,
      depth = 4, width = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // CMS guarantee: estimate >= truth, for every probed key
    assert(rep.forall { case (_, t, e) => e >= t })
    val hot = rep.find(_._1 == "hot").get
    assert(hot._2 == 500L)
    // overestimate bounded by total colliding mass
    assert(hot._3 <= 500L + 300L)
    // deterministic: re-run bit-identical
    val again = operators.Profile.cmsHeavyHitters(df, "k", topN = 301,
      depth = 4, width = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rep.toSeq)
  }

  test("image dhash equals the closed form through the real PNG codec") {
    import spark.implicits._
    // 102 is a planted variant of 101 (id ≡ 1 mod 101); 353 and 609
    // share id mod 256 with 97 and 353 under the OLD fixture rule —
    // the new mix must separate them
    val ids = Seq(0L, 1L, 97L, 101L, 102L, 255L, 353L, 609L)
    val out = Multimodal.imageDHash(spark, ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def pix(id: Long, p: Int): Long = {
      val variant = id % 101 == 1 && id >= 101
      val eff = if (variant) id - 1 else id
      val e = (eff * 2654435761L + 12345L) % 2147483647L
      val base = e * Multimodal.DHashPlanes(p) % 2147483647L % 256L
      if (variant && p == (eff % 72).toInt) (base + 64) % 256 else base
    }
    ids.foreach { id =>
      var hi = 0L; var lo = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        if (pix(id, r * 9 + c + 1) > pix(id, r * 9 + c)) {
          val bit = r * 8 + c
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
      }
      assert(out(id) == ((9L, 8L, hi, lo)), s"doc $id")
    }
    // content-like diversity: every non-variant image hashes distinct
    assert(out.values.map(v => (v._3, v._4)).toSet.size >= ids.size - 1)
    // the planted variant sits within Hamming 2 of its base: one
    // perturbed pixel feeds at most two dHash comparisons
    val d = java.lang.Long.bitCount(out(101L)._3 ^ out(102L)._3) +
      java.lang.Long.bitCount(out(101L)._4 ^ out(102L)._4)
    assert(d <= 2, s"planted pair Hamming $d")
  }

  test("histogram drift: disjoint snapshots saturate at 2e6 ppm, identical at 0") {
    import spark.implicits._
    // ref mass entirely in bin 4 (x=0.1), cur entirely in bin 7 (x=0.9)
    val shifted = (1L to 40L)
      .map(i => (i, Array.fill(3)(if (i % 2 == 0) 0.1f else 0.9f)))
      .toDF("vec_id", "embedding")
    val sep = operators.VectorStats
      .histogramDrift(shifted, col("vec_id") % 2 === 0).collect()
    assert(sep.length == 3)
    assert(sep.forall(_.getAs[Long]("l1_ppm") == 2000000L))
    // identical distributions: zero distance, totals split evenly
    val same = (1L to 40L).map(i => (i, Array.fill(3)(0.25f)))
      .toDF("vec_id", "embedding")
    val zero = operators.VectorStats
      .histogramDrift(same, col("vec_id") % 2 === 0).collect()
    assert(zero.forall(r => r.getAs[Long]("l1_ppm") == 0L &&
      r.getAs[Long]("n_ref") == 20L && r.getAs[Long]("n_cur") == 20L))
    // out-of-range values clamp into the edge bins instead of vanishing
    val wild = Seq((1L, Array(-9f)), (2L, Array(9f))).toDF("vec_id", "embedding")
    val clamped = operators.VectorStats
      .histogramDrift(wild, col("vec_id") % 2 === 0).collect()
    assert(clamped.head.getAs[Long]("n_ref") == 1L &&
      clamped.head.getAs[Long]("n_cur") == 1L)
  }

  test("pagerank: star center dominates, leaves tie, mass ≈ conserved") {
    import spark.implicits._
    // undirected star: center 0 <-> leaves 1..4
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val ranks = operators.Graph.pageRank(star, iters = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 5)
    // symmetry: all leaves identical; center strictly dominant
    assert((1L to 4L).map(ranks).distinct.size == 1)
    assert(ranks(0L) > ranks(1L) * 2)
    // fixed-point mass: floor drift only (≤ 1 ulp per node per round)
    val total = ranks.values.sum
    val S = 1L << 40
    assert(total <= S && total > S - 5 * 12 * 4, s"mass drifted: $total vs $S")
  }

  test("pagerank: dangling sink keeps its mass in the system") {
    import spark.implicits._
    // 1 -> 2 -> 3, node 3 dangling (no out-edges)
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = operators.Graph.pageRank(chain, iters = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the sink accumulates most rank; redistribution keeps sources alive
    assert(out(3L) > out(2L) && out(2L) > out(1L))
    val total = out.values.sum
    val S = 1L << 40
    // without dangling redistribution node 3's whole inflow would
    // leak every round and total would collapse toward (1-d)·S
    assert(total > (S * 7) / 10, s"dangling mass leaked: $total")
    // deterministic: a second run is bit-identical
    val again = operators.Graph.pageRank(chain, iters = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("triangles: K4, triangle-free cycle, and messy-input normalization") {
    import spark.implicits._
    // K4: every node has degree 3 and sits on C(3,2) = 3 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val t4 = operators.Graph.triangles(k4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(t4.size == 4 && t4.values.forall(_ == ((3L, 3L))))
    // 4-cycle: connected, degree 2, zero triangles — zero rows kept
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val tc = operators.Graph.triangles(cyc).collect()
    assert(tc.length == 4 && tc.forall(r => r.getLong(2) == 0L))
    // hub star + one leaf-leaf edge = exactly ONE triangle, found once
    // despite duplicate edges, reversed direction, and a self-loop
    val messy = ((1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))) ++
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))).toDF("src", "dst")
    val tm = operators.Graph.triangles(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tm(0L) == 1L && tm(1L) == 1L && tm(2L) == 1L)
    assert((3L to 6L).forall(tm(_) == 0L))
    // degenerate: all self-loops → empty graph, empty result
    assert(operators.Graph.triangles(
      Seq((7L, 7L)).toDF("src", "dst")).collect().isEmpty)
  }

  test("label propagation: bridge-joined triangles split into two " +
      "communities a components pass cannot separate") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the single bridge
    // 3-4: ONE connected component, but LPA's density grain should
    // split them — the reason the operator exists next to
    // resolveClusters
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val lbl = operators.Graph.labelPropagation(g, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.keySet == (1L to 6L).toSet)
    val left = Set(1L, 2L, 3L).map(lbl)
    val right = Set(4L, 5L, 6L).map(lbl)
    assert(left.size == 1 && right.size == 1 && left != right,
      s"expected two communities, got $lbl")
    // deterministic trajectory: the exact labels are pinned (mode of
    // neighbor labels, ties to the smallest — hand-replayed)
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"trajectory drifted: $lbl")
    // components for contrast: one cluster
    val comp = operators.Dedup.resolveClusters(
      g.select(col("src").as("a_id"), col("dst").as("b_id")))
      .select("cluster_id").distinct().count()
    assert(comp == 1L)
  }

  test("kCore: cascade peel, clique survival, and bounded-rounds contract") {
    import spark.implicits._
    // K5 (nodes 1-5) with a pendant path 5-6-7: peeling at k=2 drops
    // 7 (deg 1) in round 1, which strands 6 (deg 1) for round 2 — a
    // genuine cascade; the clique plus nothing else survives
    val g = ((for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)) ++
      Seq((5L, 6L), (6L, 7L))).toDF("src", "dst")
    def coreMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k2r1 = coreMap(operators.Graph.kCore(g, k = 2, rounds = 1))
    assert(k2r1.contains(6L)) // one round is NOT enough: 6 still in
    val k2 = coreMap(operators.Graph.kCore(g, k = 2, rounds = 2))
    assert(k2 == (1L to 5L).map(_ -> 4L).toMap) // converged: K5 only
    assert(coreMap(operators.Graph.kCore(g, k = 2, rounds = 3)) == k2)
    // k above the clique degree dissolves everything
    assert(operators.Graph.kCore(g, k = 5, rounds = 2).collect().isEmpty)
    // normalization: duplicates, reversed direction, self-loops
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)).toDF("src", "dst")
    assert(coreMap(operators.Graph.kCore(messy, k = 2, rounds = 1)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // the triangle, each deg 2
    // q62's declared bound converges on the real sf0.001 graph: one
    // extra round changes nothing
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("x").join(li.as("y"), "ok")
      .where(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    val r6 = coreMap(operators.Graph.kCore(edges, k = 80, rounds = 6))
    val r7 = coreMap(operators.Graph.kCore(edges, k = 80, rounds = 7))
    assert(r6 == r7)
  }

  test("global shuffle is reproducible, seed-sensitive, and a true permutation") {
    val a = operators.Packing.globalShuffle(docs, "doc_id", 8, 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = operators.Packing.globalShuffle(docs, "doc_id", 8, 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq,
      "same seed must reproduce the identical order")
    // permutation: every doc appears once; positions within a shard
    // are exactly 0..n-1
    assert(a.map(_._1).distinct.length == docs.count())
    a.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // all shards populated and no shard hogs the corpus (hash balance)
    val sizes = a.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max < 2 * sizes.values.min + 8,
      s"shard sizes unbalanced: $sizes")
    // a different seed actually reshuffles
    val c = operators.Packing.globalShuffle(docs, "doc_id", 8, 43L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .map(r => r._1 -> (r._2, r._3)).toMap
    val moved = a.count(r => c(r._1) != ((r._3, r._4)))
    assert(moved > a.length / 2, "changing the seed must move most rows")
  }

  test("repetition spans localize within-doc repeats; unique docs are silent") {
    import spark.implicits._
    val loop = "buy now click here" // 4 words, repeated -> looping text
    val corpus = Seq(
      (1L, s"a perfectly unique sentence with no repeats at all whatsoever"),
      (2L, s"intro words $loop $loop $loop closing words"),
      // repetition ACROSS docs but not within -> intra-doc detector silent
      (3L, s"first document ends with $loop"),
      (4L, s"second document ends with $loop")).toDF("doc_id", "text")
    val spans = TextAnalysis.repetitionSpans(corpus, k = 3, minGrams = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    assert(!spans.exists(_._1 == 1L))
    assert(!spans.exists(_._1 == 3L) && !spans.exists(_._1 == 4L),
      "cross-doc-only repetition must not fire the INTRA-doc detector")
    // doc 2: "buy now click here" × 3 -> trigrams of the loop repeat;
    // the repeated positions are consecutive -> ONE span covering the
    // loop region (grams 2..9 of the doc: intro(2) + 12 loop words)
    val d2 = spans.filter(_._1 == 2L)
    assert(d2.length == 1, s"expected one merged loop span, got ${d2.toSeq}")
    assert(d2.head._4 >= 8, "the loop's repeated trigram run spans >= 8 grams")
    // sanity vs t08: the same doc scores a nonzero duplicate-trigram
    // fraction (the span is WHERE that fraction lives)
    val t08 = TextAnalysis.repetitionScores(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(t08(2L) > 0.0 && t08(1L) == 0.0)
  }

  test("compaction executes its plan: bins round-trip to one file each") {
    val target = 1000L
    val plan = operators.Layout.compactionBins(docs, "source", "doc_id",
      "n_chars", target).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val out = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString
    try {
      operators.Layout.compact(docs, "source", "doc_id", "n_chars",
        target, out)
      // re-read the rewritten table and audit the files it is made of
      val back = spark.read.parquet(out)
      assert(back.count() == docs.count(), "rewrite must lose no rows")
      val files = back.select(col("source"), col("bin").cast("long").as("bin"),
          input_file_name().as("f"), col("doc_id"),
          col("n_chars").cast("long").as("bytes"))
        .groupBy("source", "bin")
        .agg(countDistinct("f").as("n_files"), count(lit(1)).as("n_docs"),
          sum("bytes").as("bytes"), min("doc_id").as("lo"),
          max("doc_id").as("hi"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      assert(files.keySet == plan.keySet, "rewritten bins != planned bins")
      files.foreach { case (key, (nFiles, nDocs, bytes, _, _)) =>
        assert(nFiles == 1, s"bin $key split across $nFiles files")
        val (planDocs, planBytes) = plan(key)
        assert(nDocs == planDocs && bytes == planBytes,
          s"bin $key stats diverge from the plan")
      }
      // bins partition the order column: within a part, bin b's doc_id
      // range ends before bin b+1's begins (the sorted-table property
      // that makes per-file min/max stats prune)
      files.groupBy(_._1._1).foreach { case (_, bins) =>
        bins.toSeq.sortBy(_._1._2).sliding(2).foreach {
          case Seq((_, a), (_, b)) => assert(a._5 < b._4,
            "consecutive bins overlap in doc_id")
          case _ => ()
        }
      }
    } finally {
      val dir = java.nio.file.Paths.get(out)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("keep-best survivor is the cluster's quality argmax, ties to low id") {
    val rows = Dedup.keepBestPerCluster(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (_, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, "exactly one survivor per cluster")
      val best = members.maxBy(m => (m._5, -m._1))
      assert(keepers.head._1 == best._1)
      // the keep_id column agrees for every member
      assert(members.forall(_._3 == best._1))
    }
    // the policy must actually differ from min-id somewhere on this
    // fixture (otherwise the test exercises nothing)
    assert(rows.exists(r => r._4 && r._3 != r._2),
      "no cluster picked a non-min-id survivor")
  }

  test("classifier margin is the exact integer dot of t12 counts and weights") {
    val weights = spark.range(32).select(col("id").cast("int").as("bucket"),
      ((col("id") * 37 + 11) % 21 - 10).cast("long").as("weight"))
    val w = weights.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val scored = TextAnalysis.classifierScore(docs, weights,
      dim = 32, bias = -3L).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getString(3)))
      .toMap
    val bows = TextAnalysis.hashedBow(docs, dim = 32).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
    assert(bows.nonEmpty && scored.size == bows.length)
    bows.foreach { case (id, (nTok, csv)) =>
      val counts = csv.split(",").map(_.toLong)
      val expected = counts.zipWithIndex.map { case (c, b) => c * w(b) }.sum - 3L
      val (gotTok, gotMargin, gotLabel) = scored(id)
      assert(gotTok == nTok && gotMargin == expected)
      assert(gotLabel == (if (expected >= 0) "keep" else "drop"))
    }
    // the fixture must exercise both labels or the sign test is vacuous
    val labels = scored.values.map(_._3).toSet
    assert(labels == Set("keep", "drop"))
  }

  test("semantic dedup: one max-norm survivor per cluster, pairs co-clustered") {
    val res = Similarity.semanticDedup(embs, threshold = 0.4,
      nBits = 6, tables = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(res.length == embs.count(), "every vector labeled (singletons too)")
    val cluster = res.map(r => r._1 -> r._2).toMap
    // every verified near-dup pair must land in one cluster
    val pairs = Similarity.lshCosinePairs(embs, 0.4, 6, 3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // exactly one survivor per cluster, and it is the norm argmax
    val norms = embs.select(col("vec_id"),
      Similarity.norm(col("embedding")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    res.groupBy(_._2).foreach { case (_, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, "exactly one survivor per cluster")
      val best = members.maxBy(m => (norms(m._1), -m._1))
      assert(keepers.head._1 == best._1)
      assert(members.forall(_._3 == best._1))
    }
  }

  test("trained IVF scores are exact cosines and recall the brute truth") {
    val queries = embs.filter(col("vec_id") < 3)
    val got = Similarity.ivfTopKTrained(embs, queries, k = 5,
      numCentroids = 8, iters = 2, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.groupBy(_._1).forall(_._2.length <= 5))
    assert(got.nonEmpty)
    // every emitted score is the TRUE cosine of that pair (probing
    // restricts candidates, never distorts scores)
    val truth = Similarity.bruteForceTopK(embs, queries, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    got.foreach { case (q, _, n, s) => assert(truth((q, n)) == s) }
    // and the probed lists recall a reasonable share of the true top-5
    val top5 = Similarity.bruteForceTopK(embs, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = got.map(g => (g._1, g._3)).toSet.intersect(top5)
    assert(hits.size * 5 >= top5.size,
      s"recall ${hits.size}/${top5.size} below 20%")
  }

  test("eval-overlap report is the transpose of the corpus manifest") {
    val isEval = col("doc_id") % 50 === 0
    val corpusSide = Decontaminate.ngramOverlap(docs, isEval, k = 5)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val evalSide = Decontaminate.evalOverlapReport(docs, isEval, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // both directions see the same (corpus, eval) gram-sharing
    // relation: contamination exists on one side iff on the other
    assert(corpusSide.exists(_._2) == evalSide.exists(_._4))
    // each compromised eval doc's corpus-doc count is bounded by the
    // total contaminated corpus docs, and zeros are complete rows
    val nContaminated = corpusSide.count(_._2)
    evalSide.foreach { case (_, nDocs, nGrams, comp) =>
      assert(nDocs <= nContaminated)
      assert(comp == (nDocs > 0))
      assert((nDocs > 0) == (nGrams > 0))
    }
    assert(evalSide.length == docs.filter(isEval).count())
  }

  test("kmeans assigns every vector and Lloyd rounds never raise the SSE") {
    import operators.VectorStats
    def sse(iters: Int): Double =
      VectorStats.kmeansAssign(embs, k = 4, iters = iters)
        .agg(sum("dist2")).collect()(0).getDouble(0)
    val a2 = VectorStats.kmeansAssign(embs, k = 4, iters = 2).collect()
    assert(a2.length == embs.count())
    assert(a2.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    assert(a2.forall(_.getDouble(2) >= 0.0))
    // Lloyd's monotonicity: each (assign, update) round can only lower
    // the total within-cluster squared distance
    val s0 = sse(0); val s1 = sse(1); val s2 = sse(2)
    assert(s1 <= s0 + 1e-9, s"update 1 raised SSE: $s0 -> $s1")
    assert(s2 <= s1 + 1e-9, s"update 2 raised SSE: $s1 -> $s2")
  }

  test("funnel counts only strictly ordered step chains per user") {
    import spark.implicits._
    import operators.Profile
    val ev = Seq(
      // u1: clean view→click→purchase chain
      (1L, 1L, 1000000L, "view"), (1L, 2L, 2000000L, "click"),
      (1L, 3L, 3000000L, "purchase"),
      // u2: click BEFORE first view — chain never starts past step 0
      (2L, 4L, 1000000L, "click"), (2L, 5L, 2000000L, "view"),
      (2L, 6L, 3000000L, "purchase"),
      // u3: click at the SAME µs as the view — strictly-after misses
      (3L, 7L, 1000000L, "view"), (3L, 8L, 1000000L, "click"),
      // u4: purchase lands between view and click — step 2 unreached
      (4L, 9L, 1000000L, "view"), (4L, 10L, 2000000L, "purchase"),
      (4L, 11L, 3000000L, "click"),
      // u5: full chain again
      (5L, 12L, 1000000L, "view"), (5L, 13L, 2000000L, "click"),
      (5L, 14L, 3000000L, "purchase"),
      // u6: purchase only — no step reached
      (6L, 15L, 1000000L, "purchase"))
      .toDF("user_id", "event_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Profile.funnel(ev, Seq("view", "click", "purchase"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out == Seq(
      (0, "view", 5L, 1000000L),
      (1, "click", 3L, 600000L),
      (2, "purchase", 2L, 400000L)))
  }

  test("hll registers are duplicate-insensitive and estimate sanely") {
    import spark.implicits._
    import operators.Profile
    val ev = (1 to 500).map(i => ("g" + (i % 2), i.toLong))
      .toDF("event_type", "user_id")
    val whole = Profile.hllRegisters(ev, "event_type", "user_id")
      .collect().toSeq
    whole.foreach { r =>
      assert(r.getLong(1) <= 256, "more registers than exist")
      assert(r.getLong(4) == 250L, "exact probe wrong")
      // raw estimate in the right decade (no bias corrections by
      // design — the report measures error, it doesn't hide it)
      assert(r.getLong(3) > 125L && r.getLong(3) < 500L,
        s"estimate ${r.getLong(3)} wildly off for n=250")
    }
    // the sketch is a set-cardinality object: feeding every row twice
    // must not move a single register (max-merge idempotence)
    val dup = Profile.hllRegisters(ev.union(ev), "event_type", "user_id")
      .collect().toSeq
    assert(dup == whole)
  }

  test("bpe merges overlapping runs greedily and breaks ties ascending") {
    import spark.implicits._
    // "llll" x3: round 1 must merge "l l" (count 9 = 3 positions x 3
    // words) and apply it to BOTH halves of each word (the
    // double-space expansion — a naive single-space replace would
    // leave "ll l l"), so round 2 sees "ll ll"
    val runs = Seq((1L, "llll llll llll")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeTrain(runs, merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m.toSeq == Seq((1, "l l", "ll", 9L), (2, "ll ll", "llll", 3L)))
    // equal counts: "a b" and "c d" both 2 -> lexicographically first
    val ties = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val t = graft.operators.Tokenizer.bpeTrain(ties, merges = 1)
      .collect()(0)
    assert(t.getString(1) == "a b" && t.getLong(3) == 2L)
  }

  test("scene cuts: zero distance within scenes, scene_no sums the cuts") {
    val rows = Multimodal.sceneCuts(spark, docs.limit(6))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, fs) =>
      val ordered = fs.sortBy(_._2)
      // frame 0 has no predecessor and is never a cut
      assert(ordered.head._3.isEmpty && !ordered.head._4 &&
        ordered.head._5 == 0L)
      val sceneLen = 2 + (id % 3).toInt
      ordered.tail.foreach { case (_, f, dist, cut, _) =>
        val sameScene = (f / sceneLen) == ((f - 1) / sceneLen)
        if (sameScene) assert(dist.contains(0L) && !cut,
          s"media $id frame $f: intra-scene dist $dist")
        assert(cut == dist.exists(_ >= 10L))
      }
      // scene_no is the running cut count
      var cuts = 0L
      ordered.foreach { case (_, _, _, cut, sceneNo) =>
        if (cut) cuts += 1
        assert(sceneNo == cuts)
      }
    }
  }

  test("keyframes: one row per detected scene, first frame as the rep") {
    val sample = docs.limit(5)
    val frames = Multimodal.sceneCuts(spark, sample)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6))) // media, frame, hi, lo, scene_no
    val keys = Multimodal.keyframes(spark, sample)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    keys.groupBy(_._1).foreach { case (id, ks) =>
      val fs = frames.filter(_._1 == id)
      // scene_no values agree and every scene has exactly one row
      assert(ks.map(_._2).sorted.toSeq == fs.map(_._5).distinct.sorted.toSeq)
      assert(ks.map(_._6).sum == fs.length) // n_frames partitions frames
      ks.foreach { case (_, scene, kf, hi, lo, _) =>
        val inScene = fs.filter(_._5 == scene)
        assert(kf == inScene.map(_._2).min)
        val first = inScene.minBy(_._2)
        assert(hi == first._3 && lo == first._4)
      }
    }
  }

  test("corpus health: exact integer ppm over a known vocabulary") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b", "A"), (2L, "c", "A"),
      (3L, "", "B")).toDF("doc_id", "text", "source")
    val rows = CorpusStats.corpusHealth(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // A: 5 tokens {a:3,b:1,c:1} -> 3 types, top 3, 2 hapaxes
    assert(rows.toSeq == Seq(
      ("A", 5L, 3L, 600000L, 600000L, 666666L),
      // empty doc contributes its one empty-gram token (fp 0)
      ("B", 1L, 1L, 1000000L, 1000000L, 1000000L)))
  }

  test("fuzzy contamination flags paraphrased eval items, exact misses ok") {
    import spark.implicits._
    // a truncated/extended copy (the benchmark item plus trailing
    // chrome): Jaccard 17/22 = 77% — above the 60% fuzzy threshold,
    // invisible to an exact whole-doc filter, and this pair's band
    // keys collide under the deterministic hash family (banding has
    // legitimate false NEGATIVES; recall properties are pinned in the
    // minhash subset test above)
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen geese wander slowly across the quiet frozen pond"
    val d = Seq(
      (50L, base),
      (1L, base + " and then some extra words"),
      (2L, "completely different content with no overlap at all here"))
      .toDF("doc_id", "text")
    val rows = Decontaminate.fuzzyContamination(d,
        isEval = col("doc_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSet == Set(1L))
    val (_, n, evalId, score) = rows.head
    assert(n == 1L && evalId == 50L)
    // 17/22 shingles shared: high but sub-1e6 Jaccard
    assert(score == 17L * 1000000L / 22L)
  }

  test("filtered top-k returns only matching-label neighbors, exact order") {
    import org.apache.spark.sql.expressions.Window
    val rows = Similarity.bruteForceTopK(
        embs.filter(col("label") === 3), embs.filter(col("vec_id") < 3),
        k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nid, _) => assert(labels(nid) == 3) }
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
      val scores = rs.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("audio trim finds the gated active range through the WAV codec") {
    val rows = Multimodal.audioTrim(spark, docs.limit(8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, first, last, nActive, nSilent) =>
      assert(first == id % 3)
      assert(last == 7 - id % 2)
      assert(nActive == 8 - id % 3 - id % 2)
      assert(nSilent == id % 3 + id % 2)
    }
  }

  test("whiten outliers are the top-20 by squared whitened distance") {
    val coords = graft.operators.VectorStats.pcaWhiten2(embs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = coords
      .map { case (id, w1, w2) => (id, w1 * w1 + w2 * w2) }
      .sortBy { case (id, d2) => (-d2, id) }.take(20).toSeq
    val got = graft.operators.VectorStats.whitenOutliers(embs)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("pack execution fills every non-tail sequence and matches the audit") {
    val exec = graft.operators.Packing
      .packExecute(docs, seqLen = 128, buckets = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val audit = graft.operators.Packing
      .packShardAudit(docs, seqLen = 128, buckets = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(exec.keySet == audit.keySet)
    // token/doc counts agree with the interval-arithmetic audit
    exec.foreach { case (k, (nDocs, nToks, _)) =>
      assert(audit(k) == ((nDocs, nToks)), s"pack $k")
    }
    // every sequence is exactly full except each bucket's ragged tail
    exec.groupBy(_._1._1).foreach { case (_, packs) =>
      val last = packs.keys.map(_._2).max
      packs.foreach { case ((_, p), (_, nToks, _)) =>
        if (p != last) assert(nToks == 128L)
      }
    }
    // fingerprints are sensitive to the stream, not just the counts:
    // all full packs hashing equal would mean a degenerate fold
    val fullFps = exec.collect { case ((_, _), (_, 128L, fp)) => fp }
    assert(fullFps.toSeq.distinct.length > 1)
  }

  test("soft dedup halves duplicate weight and keeps every document") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one completely different document body"),
      (4L, "another unrelated text entirely here")).toDF("doc_id", "text")
    val rows = Dedup.softDedupWeights(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    assert(rows(1L) == ((1L, 2L, 500000L)))
    assert(rows(2L) == ((1L, 2L, 500000L)))
    assert(rows(3L) == ((3L, 1L, 1000000L)))
    assert(rows(4L) == ((4L, 1L, 1000000L)))
  }

  test("interleave equals the naive per-source window; slots are unique") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.Packing.interleaveSources(docs, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // two-phase rank == naive single-window rank
    val naiveW = Window.partitionBy("source").orderBy("h", "doc_id")
    val naive = docs.select(col("doc_id"), col("source"),
        TextAnalysis.fingerprint(concat_ws(":", lit(42L), col("doc_id")))
          .as("h"))
      .withColumn("src_rank", row_number().over(naiveW).cast("long") - 1L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    got.foreach { case (id, _, rank, _) => assert(naive(id) == rank) }
    // slots are unique, and consecutive occupied slots cycle sources
    assert(got.map(_._4).distinct.length == got.length)
    val bySlot = got.sortBy(_._4)
    val nSrc = got.map(_._2).distinct.length.toLong
    bySlot.foreach { case (_, _, rank, slot) =>
      assert(slot % nSrc >= 0 && slot / nSrc == rank)
    }
  }

  test("mips ranks by raw dot, not cosine, through augmented buckets") {
    import spark.implicits._
    // q=[1,0]: cosine prefers a=[0.9,0] (cos 1.0), but the inner
    // product prefers b=[10,5] (dot 10 vs 0.9) — MIPS must return b
    // first; with nBits=1 all three collide in hyperplane table 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(10.0f, 5.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.mipsTopK(vecs, vecs.filter(col("vec_id") === 0L),
        k = 2, nBits = 1)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.head == ((1, 2L, 10.0)))
    assert(rows.toSeq.contains((2, 1L, 0.9f.toDouble)))
    // on the fixture: scores are the exact fixed-order dots
    val got = Similarity.mipsTopK(embs, embs.filter(col("vec_id") < 2), k = 3)
    val recomputed = got.alias("g")
      .join(embs.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), "query_id")
      .join(embs.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne")), "neighbor_id")
      .select((col("score") - Similarity.dot(col("qe"), col("ne")))
        .as("err")).collect()
    assert(recomputed.forall(_.getDouble(0) == 0.0))
  }

  test("exact stratified split meets per-stratum quotas exactly") {
    val rows = graft.operators.Mixture.exactStratifiedSplit(docs, seed = 43L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (_, strat) =>
      val n = strat.head._4
      assert(strat.length.toLong == n)
      // ranks are the dense 0..n-1
      assert(strat.map(_._3).sorted.toSeq == (0L until n).toSeq)
      val train = strat.count(_._5 == "train").toLong
      val vl = strat.count(_._5 == "val").toLong
      val test = strat.count(_._5 == "test").toLong
      assert(train == (0L until n).count(r => r * 100 < n * 80))
      assert(train + vl == (0L until n).count(r => r * 100 < n * 90))
      assert(train + vl + test == n)
      // split boundaries follow the rank order: no test doc ranks
      // below a train doc's threshold band
      strat.foreach { case (_, _, rk, _, sp) =>
        val expected = if (rk * 100 < n * 80) "train"
          else if (rk * 100 < n * 90) "val" else "test"
        assert(sp == expected)
      }
    }
  }

  test("retention cohorts count returning users per week offset") {
    import spark.implicits._
    // weeks starting Mon 2024-01-01 and Mon 2024-01-08
    val ev = Seq(
      (1L, 1L, "2024-01-02 10:00:00"), (1L, 2L, "2024-01-09 10:00:00"),
      (2L, 3L, "2024-01-03 10:00:00"),
      (3L, 4L, "2024-01-10 10:00:00")).toDF("user_id", "event_id", "s")
      .select(col("user_id"), col("event_id"),
        to_timestamp(col("s")).as("ts"))
    val rows = graft.operators.Profile.retentionCohorts(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 1000000L),
      ("2024-01-01", 1L, 1L, 500000L),
      ("2024-01-08", 0L, 1L, 1000000L)))
  }

  test("event transitions count ordered successors with exact ppm shares") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (2L, 1L, "A"), (2L, 2L, "B"),
      (3L, 1L, "A"), (3L, 2L, "C")).toDF("user_id", "seq", "event_type")
      .select(col("user_id"), col("seq").as("event_id"),
        timestamp_micros(col("seq") * 1000000L).as("ts"),
        col("event_type"))
    val rows = graft.operators.Profile.eventTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("A", "B", 2L, 666666L), ("A", "C", 1L, 333333L),
      ("B", "A", 1L, 1000000L)))
  }

  // driver-side exact-L2 truth with the operator's fold order and
  // (dist, id) tie rule; excludes self like pqTopK does
  private def bruteL2TopK(k: Int,
      isQuery: Long => Boolean): Set[(Long, Int, Long)] = {
    val vecs = embs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    vecs.filter(v => isQuery(v._1)).flatMap { case (qid, q) =>
      val qq = dot(q, q)
      vecs.filter(_._1 != qid)
        .map { case (cid, c) => (cid, qq - 2.0 * dot(q, c) + dot(c, c)) }
        .sortBy { case (cid, dist) => (dist, cid) }
        .take(k).zipWithIndex
        .map { case ((cid, _), i) => (qid, i + 1, cid) }
    }.toSet
  }

  test("pq rerank with a full-corpus shortlist equals brute-force L2 top-k") {
    // with the shortlist as wide as the corpus the ADC stage cannot
    // drop anything, so the exact re-rank must reproduce the brute
    // truth — this pins the stage-2 arithmetic and tie rule
    val n = embs.count().toInt
    val queries = embs.filter(col("vec_id") < 2)
    val rerank = Similarity.pqRerankTopK(embs, queries, k = 5,
      shortlist = n, m = 4, ksub = 4, iters = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rerank == bruteL2TopK(5, _ < 2))
  }

  test("pq rerank never worsens recall vs raw ADC ranking") {
    val queries = embs.filter(col("vec_id") < 3)
    val truth = bruteL2TopK(5, _ < 3).map(t => (t._1, t._3))
    def recall(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.map(r => (r.getLong(0), r.getLong(2))).count(truth.contains)
    val adc = recall(Similarity.pqTopK(embs, queries, k = 5,
      m = 4, ksub = 4, iters = 1).collect())
    val rr = recall(Similarity.pqRerankTopK(embs, queries, k = 5,
      shortlist = 20, m = 4, ksub = 4, iters = 1).collect())
    assert(rr >= adc, s"rerank recall $rr < adc recall $adc")
  }

  test("image near-dup pairs equal brute-force dhash hamming") {
    val dh = Multimodal.imageDHash(spark, docs).collect()
      .map(r => (r.getLong(0), (r.getLong(3) << 32) | r.getLong(4)))
    val brute = (for {
      (a, ha) <- dh; (b, hb) <- dh
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Multimodal.imageNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture should contain near-dup images")
  }

  test("cross-codec near-dup: planted PNG/JPEG pairs surface with " +
      "small distances, nothing spurious, JPEG magic dispatches") {
    // JPEG magic dispatch joins PNG/BMP in the codec gate
    assert(Multimodal.ImageCodec.matches(
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)))
    assert(!Multimodal.ImageCodec.matches(
      Array(0xff.toByte, 0xd9.toByte, 0xff.toByte)))
    val media = Multimodal.mixedCodecMedia(spark, docs)
    // the fixture really is mixed-codec: every planted variant is
    // JPEG, everything else PNG, and the payload magics agree
    val codecs = media.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getString(2)))
    assert(codecs.exists(_._3 == "jpeg") && codecs.exists(_._3 == "png"))
    codecs.foreach { case (id, payload, codec) =>
      assert(Multimodal.ImageCodec.matches(payload), s"magic missing: $id")
      val isJpeg = (payload(0) & 0xff) == 0xff
      assert(isJpeg == (codec == "jpeg"), s"codec/magic mismatch: $id")
    }
    // every planted pair survives the codec boundary; nothing else
    val got = Multimodal.imageNearDupAcrossCodecs(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = codecs.map(_._1).filter(id => id % 101 == 1 && id >= 101)
      .filter(id => codecs.exists(_._1 == id - 1))
      .map(id => (id - 1, id)).toSet
    assert(got == planted, s"got=$got planted=$planted")
    assert(got.nonEmpty, "fixture must contain planted cross-codec pairs")
    // distances: planted pairs sit well under the radius even with
    // JPEG noise; unrelated hashes sit far above it (the margin that
    // makes the pair set codec-stable)
    val dh = Multimodal.imageDHashFromBytes(spark, media).collect()
      .map(r => (r.getLong(0), (r.getLong(3) << 32) | r.getLong(4))).toMap
    planted.foreach { case (a, b) =>
      val dist = java.lang.Long.bitCount(dh(a) ^ dh(b))
      assert(dist <= 3, s"planted pair ($a,$b) at dist $dist")
    }
    val unrelated = (for {
      (a, ha) <- dh.take(60); (b, hb) <- dh.take(60)
      if a < b && !planted.contains((a, b))
    } yield java.lang.Long.bitCount(ha ^ hb)).min
    assert(unrelated > 8, s"unrelated floor $unrelated too close to radius")
  }

  test("incremental image near-dup equals the full run's cross-boundary pairs") {
    val full = Multimodal.imageNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossOnly = full.filter { case (a, b) => (a % 2) != (b % 2) }
      .map { case (a, b) => if (a % 2 == 0) (a, b) else (b, a) }
    val inc = Multimodal.imageNearDupAgainst(spark,
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == crossOnly)
    assert(inc.nonEmpty, "planted variant pairs are consecutive ids, " +
      "so every one crosses the parity boundary")
  }

  test("bpe encode applies trained merges in order; counts are exact") {
    import spark.implicits._
    val d = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val rules = graft.operators.Tokenizer.bpeTrain(d, merges = 2)
      .orderBy("rnd").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules.map(_._2) == Seq("aa", "ab"))
    def enc(rs: Seq[(String, String)]) = graft.operators.Tokenizer
      .bpeEncode(d, rs).collect()(0)
    val full = enc(rules)
    assert(full.getLong(1) == 3L && full.getLong(2) == 3L,
      "both merges: every word one symbol")
    assert(enc(rules.take(1)).getLong(2) == 4L,
      "first merge only: ab stays two symbols")
    assert(enc(Nil).getLong(2) == 6L, "no merges: raw characters")
    // non-alpha tokens pass through as ONE opaque symbol
    val mixed = Seq((1L, "aa 123 a-b")).toDF("doc_id", "text")
    val m = graft.operators.Tokenizer.bpeEncode(mixed, rules).collect()(0)
    assert(m.getLong(1) == 3L && m.getLong(2) == 3L) // aa, 123, a-b: 1 each
  }

  test("knn graph: exact scores, sorted ranks, measured recall vs brute") {
    val g = Similarity.knnGraph(embs, k = 3, numCentroids = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    // ranks are dense and scores descend within each vector
    g.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
    // every edge's score equals the exact cosine (probe routing can
    // miss neighbors, never mis-score them)
    val brute = Similarity.bruteForceTopK(embs, embs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bruteAll = Similarity.cosinePairs(embs, threshold = -2.0).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    g.foreach { case (q, _, n, sc) => assert(bruteAll((q, n)) == sc) }
    // recall vs the true graph, measured not guessed
    val hits = g.count { case (q, _, n, _) => brute.contains((q, n)) }
    val recall = hits.toDouble / brute.size
    assert(recall > 0.3, s"knn-graph recall $recall too low for the params")
  }

  test("bm25: both-term docs outrank single-term docs; self-retrieval wins") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple orange"),
      (2L, "banana banana kiwi"),
      (3L, "pear pear pear pear"),
      (4L, "apple banana cherry")).toDF("doc_id", "text")
    val q = Seq((100L, "apple banana")).toDF("query_id", "text")
    val rows = graft.operators.Retrieval.bm25TopK(corpus, q, k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4)))
    // docs 0 and 4 match both terms and must outrank every
    // single-term doc; doc 3 matches nothing and must be absent
    val ranked = rows.sortBy(_._1).map(_._2)
    assert(ranked.take(2).toSet == Set(0L, 4L), s"got ${ranked.toSeq}")
    assert(!ranked.contains(3L))
    assert(rows.forall { case (_, d, hits) =>
      if (d == 0L || d == 4L) hits == 2 else hits == 1 })
    // self-retrieval on the real fixture: a document used as its own
    // query must surface in its own top-3 (exact rank 1 is NOT
    // guaranteed — the dedup fixture plants near-copies that can
    // legitimately outscore the original on length normalization)
    val self = graft.operators.Retrieval.bm25TopK(docs,
      docs.filter(col("doc_id") === 7)
        .select(col("doc_id").as("query_id"), col("text")), k = 3)
      .collect().map(_.getLong(2))
    assert(self.contains(7L), s"doc 7 missing from ${self.toSeq}")
  }

  test("rm3: expansion terms retrieve docs the original query misses") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "car road trip"), (1L, "automobile road journey"),
      (2L, "car automobile dealer"), (3L, "kitchen sink faucet"))
      .toDF("doc_id", "text")
    val q = Seq((9L, "car")).toDF("query_id", "text")
    val idx = graft.operators.Retrieval.bm25Index(corpus)
    def hits(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(2)).toSet
    val plain = hits(graft.operators.Retrieval.bm25TopKAgainst(idx, q, k = 10))
    val rm3 = hits(graft.operators.Retrieval.rm3Expand(idx, q, k = 10,
      fbDocs = 2, fbTerms = 4))
    // "car" alone can never see doc 1; feedback docs 0/2 supply
    // "automobile"/"road", which retrieve it on the second pass
    assert(plain == Set(0L, 2L))
    assert(rm3.contains(1L) && rm3.contains(0L) && rm3.contains(2L))
    assert(!rm3.contains(3L), "off-topic doc must stay unretrieved")
  }

  test("dsir: target-like docs outscore unrelated ones, selection ∝ weight") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma delta"),
      (101L, "alpha gamma epsilon")).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "alpha beta gamma"), // pure target vocabulary
      (1L, "xx yy zz ww vv"), // disjoint vocabulary
      (2L, "alpha xx yy zz")).toDF("doc_id", "text") // mixed
    val rows = graft.operators.Mixture
      .dsirSelect(raw, target, buckets = 512, seed = 7L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows(0L)._1 > rows(2L)._1 && rows(2L)._1 > rows(1L)._1,
      s"target-likeness must order the scores: $rows")
    // the arg-max document is ALWAYS selected (coin < 1e6 ≤ ratio·1e6)
    assert(rows(0L)._2)
    // selection replays the exact coin rule, doc by doc
    val mx = rows.values.map(_._1).max
    raw.select(col("doc_id"), (graft.operators.TextAnalysis.fingerprint(
        concat_ws(":", lit(7L), col("doc_id"))) % 1000000L).as("coin"))
      .collect().foreach { r =>
        val (score, sel) = rows(r.getLong(0))
        assert(sel == (BigInt(r.getLong(1)) * mx < BigInt(score) * 1000000L))
      }
  }

  test("hard negatives: graph rows for hard, pool draws for random, no self-pairs") {
    val rows = Similarity.hardNegatives(embs, kHard = 2, kRand = 2,
      numCentroids = 4, nprobe = 2, poolSize = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // never a self-pair, in either kind
    assert(!rows.exists(r => r._1 == r._4), "self-negative emitted")
    // hard rows carry scores and equal the graph verbatim
    val hard = rows.filter(_._2 == "hard")
    assert(hard.forall(_._5.isDefined))
    val graph = Similarity.knnGraph(embs, 2, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .toSet
    assert(hard.map(r => (r._1, r._3, r._4)).toSet == graph)
    // random rows: exactly kRand per vector, scoreless, drawn from
    // the 8-member pool
    val rand = rows.filter(_._2 == "random")
    assert(rand.groupBy(_._1).values.forall(_.length == 2))
    assert(rand.forall(_._5.isEmpty))
    assert(rand.map(_._4).distinct.length <= 8)
    // determinism: a second run yields the identical pair set
    val again = Similarity.hardNegatives(embs, kHard = 2, kRand = 2,
      numCentroids = 4, nprobe = 2, poolSize = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again == rows.map(r => (r._1, r._2, r._3, r._4)).toSet)
  }

  test("strip eval spans: only the quoted span leaves, clean docs untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "benchmark question alpha beta gamma", true), // the eval item
      // quotes the eval item mid-document — only those tokens go
      (1L, "intro words benchmark question alpha beta gamma outro text", false),
      (2L, "totally unrelated clean document here", false),
      // fully contaminated: the whole doc IS the eval item
      (3L, "benchmark question alpha beta gamma", false))
      .toDF("doc_id", "text", "is_eval")
    val got = graft.operators.Decontaminate
      .stripEvalSpans(docs, isEval = col("is_eval"), k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((9, 5, "intro words outro text")))
    assert(got(2L) == ((5, 0, "totally unrelated clean document here")))
    assert(got(3L) == ((5, 5, "")))
    assert(!got.contains(0L), "eval rows stay out of the manifest")
  }

  test("standing tfidf tags equal t26's pre-rank rows on the model corpus") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "cat sat on the mat"), (1L, "dog sat on the log"),
      (2L, "bird flew over the log log")).toDF("doc_id", "text")
    val tags = graft.operators.Retrieval.tfidfTagsAgainst(
        graft.operators.Retrieval.tfidfModel(corpus), corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .toSet
    // t26 at k ≥ max distinct terms/doc exposes every scored row
    val t26 = graft.operators.Retrieval.tfidfKeywords(corpus, k = 100)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .toSet
    assert(tags == t26)
    // tf is counted in-row: "log log" in doc 2 carries tf = 2
    val log2 = graft.operators.Retrieval.tfidfTagsAgainst(
        graft.operators.Retrieval.tfidfModel(corpus), corpus)
      .filter(col("doc_id") === 2 && col("term") === "log")
      .collect().head
    assert(log2.getLong(2) == 2L)
    // unseen terms drop: a doc with out-of-model vocabulary tags nothing
    val alien = Seq((9L, "zz yy xx")).toDF("doc_id", "text")
    assert(graft.operators.Retrieval.tfidfTagsAgainst(
      graft.operators.Retrieval.tfidfModel(corpus), alien).count() == 0)
  }

  test("quality floor: grouped histogram pick equals the naive per-source quantile") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 8 docs in "a" (distinct qualities), 3 in "b", 1 in "c"
    val docs = (0L to 7L).map(i =>
        (i, (1 to (3 + i.toInt)).map(j => s"w$j").mkString(" "), "a")) ++
      Seq((10L, "x", "b"), (11L, "x y z w", "b"), (12L, "x y", "b"),
        (13L, "solo", "c"))
    val df = docs.toDF("doc_id", "text", "source")
    val got = graft.operators.CurationPipeline
      .qualityFloor(df, pctPpm = 250000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // naive twin: threshold = quality at 0-based rank (n-1)*0.25 (the
    // q69 integer split) per source, keep quality >= thr
    val q = df.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy("source").orderBy(col("quality"), col("doc_id"))
    val naive = q.withColumn("rn", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rn") === expr(
        "(n - 1) div 1000000 * 250000 + ((n - 1) % 1000000) * 250000 div 1000000"))
      .select(col("source"), col("quality").as("thr"))
    val expect = q.join(naive, "source")
      .filter(col("quality") >= col("thr"))
      .collect().map(r => (r.getLong(1), r.getString(0), r.getDouble(3)))
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // the 1-doc source keeps its only doc; src a drops its bottom 25%
    assert(got.exists(_._1 == 13L))
    assert(got.count(_._2 == "a") == 7)
  }

  test("sq8: codes stay in [0,255], max/min dims hit the rails") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0.0f, 10.0f)), (1L, Array(5.0f, 20.0f)),
      (2L, Array(10.0f, 30.0f)), (3L, Array(2.5f, 15.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((9L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(corpus, q, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // dequantized dots: dim0 spans [0,10], dim1 [10,30]; vec 2 sits on
    // both rails (codes 255/255 → dequantizes exactly to 10 and 30)
    assert(got.head == ((1, 2L, 40.0)))
    // vec 0 sits on the low rails (codes 0/0 → exactly 0 and 10)
    assert(got.last == ((4, 0L, 10.0)))
    // dot ordering preserved under quantization on this fixture
    assert(got.map(_._2).toSeq == Seq(2L, 1L, 3L, 0L))
  }

  test("fim split: cuts in range, part fingerprints match the slice content") {
    import spark.implicits._
    val docs = (0L to 39L).map(i =>
      (i, (1 to 8).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val rows = graft.operators.Packing.fimSplit(docs, fimMil = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    rows.foreach { case (_, n, c1, c2, mode, _, _, _) =>
      assert(0 <= c1 && c1 <= c2 && c2 <= n)
      if (mode == "none") assert(c1 == n && c2 == n)
    }
    // pass-through docs: prefix is the whole doc, middle/suffix empty
    val none = rows.filter(_._5 == "none")
    assert(none.nonEmpty && rows.exists(_._5 != "none"),
      "coin must split the population both ways")
    assert(none.forall(r => r._7 == 0L && r._8 == 0L))
    // part fingerprints equal fingerprints of the literal slice text,
    // computed through the independent expression path
    def fpOf(s: String): Long = docs.sparkSession.range(1)
      .select(graft.operators.TextAnalysis.fingerprint(lit(s)))
      .head().getLong(0)
    val sample = rows.filter(_._5 != "none").head
    val toks = (1 to 8).map(j => s"w${sample._1}_$j")
    assert(sample._6 == fpOf(toks.take(sample._3.toInt).mkString(" ")))
    assert(sample._7 == fpOf(
      toks.slice(sample._3.toInt, sample._4.toInt).mkString(" ")))
    assert(sample._8 == fpOf(toks.drop(sample._4.toInt).mkString(" ")))
  }

  test("span corruption: spans tile the budget inside disjoint segments") {
    import spark.implicits._
    val docs = Seq(
      (0L, (1 to 100).map(i => s"w$i").mkString(" ")), // n=100
      (1L, "a b c d e f"), // n=6 → masked 0 → no rows
      (2L, (1 to 40).map(i => s"t$i").mkString(" "))) // n=40
      .toDF("doc_id", "text")
    val rows = graft.operators.Packing
      .spanCorruptionPlan(docs, rateMil = 150, meanSpan = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(!rows.exists(_._1 == 1L), "too-short doc must emit nothing")
    for (doc <- Seq(0L, 2L)) {
      val sp = rows.filter(_._1 == doc).sortBy(_._3)
      val n = sp.head._2
      val masked = n * 150 / 1000
      val spans = math.max(1, masked / 3)
      assert(sp.length == spans)
      // lengths tile the budget exactly (no clamp at this rate)
      assert(sp.map(_._5).sum == masked)
      // each span lives in its own segment → strictly ordered,
      // non-overlapping, in-bounds
      sp.zipWithIndex.foreach { case ((_, _, i, start, len), idx) =>
        assert(i == idx)
        assert(start >= i * n / spans && start + len <= (i + 1) * n / spans)
      }
    }
  }

  test("span corruption stays legal at extreme rates (clamp engages)") {
    import spark.implicits._
    // rateMil = 900 makes spans longer than their segments; the
    // least-clamp must keep every span inside its segment and the
    // plan legal, trading the exact tiling identity for <=
    val docs = Seq((0L, (1 to 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sp = graft.operators.Packing
      .spanCorruptionPlan(docs, rateMil = 900, meanSpan = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._2)
    val n = sp.head._1
    val masked = n * 900 / 1000
    val spans = math.max(1, masked / 3)
    assert(sp.map(_._4).sum <= masked)
    sp.foreach { case (_, i, start, len) =>
      assert(len >= 1)
      assert(start >= i * n / spans && start + len <= (i + 1) * n / spans)
    }
  }

  test("topic mixture: argmax-keyword topics, sqrt flatten over them") {
    import spark.implicits._
    // two "subjects": cat-docs dominate 4:2; every doc's top keyword
    // is its subject word (df 4 or 2 — rarer than the df-6 fillers)
    val docs = Seq(
      (0L, "cat alpha beta"), (1L, "cat alpha beta"),
      (2L, "cat alpha beta"), (3L, "cat alpha beta"),
      (4L, "dog alpha beta"), (5L, "dog alpha beta"))
      .toDF("doc_id", "text")
    val rows = graft.operators.Mixture.topicMixture(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every kept doc is labeled by its subject word
    rows.foreach { case (id, topic, _) =>
      assert(topic == (if (id <= 3) "cat" else "dog"), s"$id -> $topic") }
    // α = ½ rates: dog (the min group) keeps 1000, cat gets
    // floor(1000·sqrt(2/4)) = 707
    val byTopic = rows.groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(byTopic.get("dog").forall(_ == 1000L))
    assert(byTopic.get("cat").forall(_ == 707L))
  }

  test("dsir standing-model probe scores equal the batch selector's") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val raw = Seq((0L, "alpha beta gamma"), (1L, "xx yy zz ww vv"),
      (2L, "alpha xx yy zz"), (3L, "totally unseen vocabulary here"))
      .toDF("doc_id", "text")
    // model trained on the SAME corpus ⇒ probe scores ≡ dsirSelect's
    // (Σ over gram occurrences ≡ Σ c_b·w_b; doc 3 exercises the
    // smoothed full-domain defaults for buckets unseen in target)
    val model = graft.operators.Mixture.dsirModel(raw, target, buckets = 64)
    val probe = graft.operators.Mixture
      .dsirScoreAgainst(model, raw, buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batch = graft.operators.Mixture
      .dsirSelect(raw, target, buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(probe == batch)
  }

  test("source caps: prune boundary keeps the bucket holding rank == cap") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 6 docs, ~distinct qualities → ~one bucket each; cap = 3 means
    // the bucket whose cumulative base == 2 still holds rank 3 and
    // must survive the base < cap prune, while base == 3 is cut
    val docs = (0L to 5L).map(i =>
      (i, (1 to (4 + 3 * i.toInt)).map(j => s"w$j").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.CurationPipeline.sourceCaps(docs, cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._2)
    val naive = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("q").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    assert(got.toSeq == naive.toSeq)
    assert(got.length == 3 && got.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("source caps: two-phase rank equals the naive per-source quality rank") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // src "a" is over the cap (5 docs), "b" exactly at it, "c" under;
    // quality varies with text shape, ties resolved by doc_id
    val docs = Seq(
      (0L, "the quick brown fox jumps over a lazy dog near the river", "a"),
      (1L, "x y z", "a"), (2L, "a a a a a a a a", "a"),
      (3L, "the of and to in is a good clean sentence", "a"),
      (4L, "!!! ??? ;;; ,,, ...", "a"),
      (5L, "one two three four five six", "b"),
      (6L, "the cat sat on the mat", "b"),
      (7L, "solo doc for c", "c")).toDF("doc_id", "text", "source")
    val got = graft.operators.CurationPipeline.sourceCaps(docs, cap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .sortBy(r => (r._2, r._3))
    val naive = docs.select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("q").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .sortBy(r => (r._2, r._3))
    assert(got.toSeq == naive.toSeq)
    // every source keeps min(n, cap) docs — the census identity
    assert(got.count(_._2 == "a") == 2 && got.count(_._2 == "b") == 2
      && got.count(_._2 == "c") == 1)
  }

  test("bm25 dfCapPpm scores only discriminative terms") {
    import spark.implicits._
    // "common" is in 4/5 docs (800000 ppm), "rare" in 1/5 (200000)
    val corpus = Seq(
      (0L, "common rare"), (1L, "common x"), (2L, "common y"),
      (3L, "common z"), (4L, "w v")).toDF("doc_id", "text")
    val idx = graft.operators.Retrieval.bm25Index(corpus)
    val q = Seq((9L, "common rare")).toDF("query_id", "text")
    val full = graft.operators.Retrieval
      .bm25TopKAgainst(idx, q, k = 10).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
    val capped = graft.operators.Retrieval
      .bm25TopKAgainst(idx, q, k = 10, dfCapPpm = Some(500000L)).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
    // full BM25 matches every common-term doc; the cap keeps only the
    // rare-term match (doc 0), with exactly one contributing term
    assert(full.keySet == Set(0L, 1L, 2L, 3L))
    assert(capped.keySet == Set(0L))
    assert(capped(0L) == 1L, "only the rare term may contribute")
  }

  test("tfidf keywords: rare terms outrank common ones, tf breaks within-doc") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "the bird flew over the log")).toDF("doc_id", "text")
    val rows = graft.operators.Retrieval.tfidfKeywords(corpus, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    // doc 0's top keywords are its unique terms (df=1), never "the"
    // (df=3, idf_ppm small) — and every doc has exactly k rows here
    val d0 = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._3).toSet.subsetOf(Set("cat", "mat", "sat", "on")))
    assert(!rows.exists(r => r._3 == "the" && r._2 == 1))
    assert(rows.groupBy(_._1).values.forall(_.length == 3))
    // exact integer arithmetic: df=1 term in a 3-doc corpus has
    // idf_ppm = (2*3-2+1)*1e6 div 3 = 1666666; tf=1 → score equals it
    assert(d0.head._4 == 1666666L)
  }

  test("incremental knn probe: exact scores, dense ranks, index-only neighbors") {
    val g = Similarity.knnGraphAgainst(
      embs.filter(col("vec_id") % 10 === 0),
      embs.filter(col("vec_id") % 10 =!= 0),
      k = 3, numCentroids = 16, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(g.nonEmpty)
    // queries come only from the arriving batch, neighbors only from
    // the standing index
    g.foreach { case (q, _, n, _) =>
      assert(q % 10 == 0); assert(n % 10 != 0)
    }
    g.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
    // probe routing can miss neighbors, never mis-score them
    val exact = Similarity.cosinePairs(embs, threshold = -2.0).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    g.foreach { case (q, _, n, sc) => assert(exact((q, n)) == sc) }
  }

  test("semDeDup over the graph: labels = union-find truth, keeps = max norm") {
    val out = Similarity.semDeDupGraph(embs, threshold = 0.4, k = 3,
      numCentroids = 16, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == embs.count())
    val edges = Similarity.knnGraph(embs, k = 3, numCentroids = 16,
      nprobe = 2)
      .filter(col("score") >= 0.4)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find with min-id roots = the expected labels
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    out.foreach { case (v, c, _, _) =>
      assert(c == find(v), s"vec $v labeled $c, expected ${find(v)}")
    }
    // keep is each cluster's largest-norm member, ties to lower id
    val nrm = embs.select(col("vec_id"),
      Similarity.norm(col("embedding")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.groupBy(_._2).foreach { case (_, rows) =>
      val expectKeep = rows.map(_._1).minBy(v => (-nrm(v), v))
      rows.foreach { case (v, _, keepId, keep) =>
        assert(keepId == expectKeep)
        assert(keep == (v == expectKeep))
      }
    }
  }

  test("standing bm25 index: probe ≡ fresh bm25TopK, CDF fold ≡ rebuild") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple orange"),
      (2L, "banana banana kiwi"),
      (3L, ""), // token-less doc must still count in the n_docs census
      (4L, "apple banana cherry")).toDF("doc_id", "text")
    val q = Seq((100L, "apple banana"), (101L, "kiwi"))
      .toDF("query_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // index probe is bit-identical to the one-shot scorer
    val idx = graft.operators.Retrieval.bm25Index(corpus)
    assert(rows(graft.operators.Retrieval.bm25TopKAgainst(idx, q, k = 5)) ==
      rows(graft.operators.Retrieval.bm25TopK(corpus, q, k = 5)))
    // CDF fold (delete 2, update 1, insert 5) ≡ fresh build + probe
    val cdf = Seq(
      (2L, "banana banana kiwi", "delete"),
      (1L, "apple apple apple orange", "update_preimage"),
      (1L, "grape orange", "update_postimage"),
      (5L, "kiwi kiwi pear", "insert"))
      .toDF("doc_id", "text", "_change_type")
    val folded = graft.operators.Retrieval.bm25ApplyCdf(idx, cdf)
    // the leave leg must be a doc-keyed anti-join (pinned here, not in
    // PlanCheck: the declared query checkpoints the standing frame, so
    // the fold's plan is truncated behind a Scan ExistingRDD there)
    assert(folded.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val after = Seq(
      (0L, "apple banana"), (1L, "grape orange"), (3L, ""),
      (4L, "apple banana cherry"), (5L, "kiwi kiwi pear"))
      .toDF("doc_id", "text")
    def idxRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(idxRows(folded) ==
      idxRows(graft.operators.Retrieval.bm25Index(after)))
    assert(rows(graft.operators.Retrieval.bm25TopKAgainst(folded, q, k = 5))
      == rows(graft.operators.Retrieval.bm25TopK(after, q, k = 5)))
    // unknown change types fail loudly, never silently drop
    val bad = Seq((9L, "x", "upsert")).toDF("doc_id", "text", "_change_type")
    val e = intercept[Exception] {
      graft.operators.Retrieval.bm25ApplyCdf(idx, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("rrf fusion: both-list docs outrank single-list docs, ppm sums exact") {
    import spark.implicits._
    // query 1: doc 10 is rank 1 in BOTH lists; doc 11 lexical-only
    // rank 1; doc 12 vector-only rank 2
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 10L, 2), (1L, 12L, 1))
      .toDF("query_id", "doc_id", "rank")
    val fused = graft.operators.Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byDoc = fused.map(f => f._3 -> f).toMap
    // exact integer contributions: 1e6 div 61 = 16393, div 62 = 16129
    assert(byDoc(10L)._4 == 16393L + 16129L && byDoc(10L)._5 == 2L)
    assert(byDoc(11L)._4 == 16129L && byDoc(11L)._5 == 1L)
    assert(byDoc(12L)._4 == 16393L && byDoc(12L)._5 == 1L)
    // the both-list doc wins; singles order by their own contribution
    assert(fused.sortBy(_._2).map(_._3).toSeq == Seq(10L, 12L, 11L))
  }

  test("qualityReport: hand-checked MRR / capped recall / ndcg integers") {
    import spark.implicits._
    // qrels: query 0 has 2 relevant docs, query 1 has 1
    val qrels = Seq((0L, 10L), (0L, 11L), (1L, 20L))
      .toDF("query_id", "doc_id")
    // system a: q0 hits doc 10 at rank 1 (misses 11), q1 hits at rank 1
    val a = Seq((0L, 1, 10L), (0L, 2, 99L), (1L, 1, 20L))
      .toDF("query_id", "rank", "doc_id")
    // system b: zero relevant hits anywhere; q1 entirely absent
    val b = Seq((0L, 1, 99L)).toDF("query_id", "rank", "doc_id")
    val rep = graft.operators.Retrieval
      .qualityReport(Seq("a" -> a, "b" -> b), qrels, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: rr = 1e6 + 1e6 → mrr (2e6 div 2); hits 2 of cap 3;
    // q0 ndcg = (1e6 div 2)·1e6 div (1e6 div 2 + 1e6 div 3) = 600000,
    // q1 ndcg = 1000000 → mean 800000
    assert(rep("a") == ((2L, 1000000L, 666666L, 800000L)))
    // b scores zeros on every metric but still reports all queries
    assert(rep("b") == ((2L, 0L, 0L, 0L)))
  }

  test("classifierCalibration: grid endpoints and confusion totals are exact") {
    import spark.implicits._
    // margins are fully controlled: dim=2, weight 1 on the bucket of
    // token 'k' only — margin = count('k') in the doc
    val fp = TextAnalysis.fingerprint(lit("k"))
    val bucket = docs.sparkSession.range(1)
      .select((fp % 2).cast("int").as("b")).head().getInt(0)
    val weights = Seq((bucket, 1L), (1 - bucket, 0L))
      .toDF("bucket", "weight")
    val labeled = Seq(
      (0L, "k k k", 1L), (1L, "k z", 1L), (2L, "z z", -1L),
      (3L, "k k z", -1L)).toDF("doc_id", "text", "y")
    val rep = TextAnalysis
      .classifierCalibration(labeled, weights, dim = 2, gridN = 2)
      .orderBy("i").collect()
    // margins: 3, 1, 0, 2 — grid thr ∈ {0, 1, 3} (mn=0, mx=3, step 3 div 2)
    assert(rep.map(_.getAs[Long]("thr")).toSeq == Seq(0L, 1L, 3L))
    // thr=0: all keep → tp=2 fp=2 fn=0 tn=0
    assert((rep(0).getAs[Long]("tp"), rep(0).getAs[Long]("fp"),
      rep(0).getAs[Long]("fn"), rep(0).getAs[Long]("tn")) == ((2L, 2L, 0L, 0L)))
    // thr=1: margins {3,1,2} keep → tp=2 fp=1 fn=0 tn=1
    assert((rep(1).getAs[Long]("tp"), rep(1).getAs[Long]("fp"),
      rep(1).getAs[Long]("fn"), rep(1).getAs[Long]("tn")) == ((2L, 1L, 0L, 1L)))
    assert(rep(1).getAs[Long]("precision_ppm") == 666666L &&
      rep(1).getAs[Long]("recall_ppm") == 1000000L &&
      rep(1).getAs[Long]("f1_ppm") == 799999L)
    // thr=3: only margin 3 keeps → tp=1 fp=0 → precision 1e6
    assert((rep(2).getAs[Long]("tp"), rep(2).getAs[Long]("fp")) == ((1L, 0L)))
    assert(rep(2).getAs[Long]("precision_ppm") == 1000000L)
    // every row partitions the corpus
    assert(rep.forall(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn") == 4L))
  }

  test("audio near-dup pairs equal brute-force fingerprint hamming") {
    val fp = Multimodal.audioFingerprint(spark, docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1) << 32) | r.getLong(2)))
    val brute = (for {
      (a, ha) <- fp; (b, hb) <- fp
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Multimodal.audioNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    // planted variants (id = 1 mod 103) are consecutive-id pairs
    assert(got.nonEmpty && got.forall { case (a, b) => b == a + 1 })
  }

  test("hammingPairs rejects a radius the pigeonhole cannot cover") {
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(docs.select(col("doc_id"), col("doc_id").as("sh")),
        maxDist = 4, blocks = 4)
    }
  }

  test("semantic contamination flags only true above-threshold matches") {
    val isEval = col("vec_id") % 50 === 0
    val flagged = Decontaminate.semanticContamination(embs, isEval,
      threshold = 0.4).collect()
    // every reported (vec, eval, score) must be a genuine pair of the
    // underlying detector, with the argmax tie rule applied
    val pairs = Similarity.lshCosinePairsAgainst(
      embs.filter(isEval), embs.filter(!isEval), threshold = 0.4)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    val byDoc = pairs.groupBy(_._1)
    assert(flagged.length == byDoc.size)
    flagged.foreach { r =>
      val (doc, evalId, score) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val best = byDoc(doc).maxBy(p => (p._3, -p._2))
      assert((best._2, best._3) == (evalId, score))
      assert(r.getLong(1) == byDoc(doc).length)
    }
  }

  test("source overlap is bounded by the smaller side and matches brute") {
    val rows = CorpusStats.sourceOverlap(docs).collect()
    rows.foreach { r =>
      val (ga, gb, ov, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(ov <= math.min(ga, gb))
      assert(ppm == math.floor(ov.toDouble * 1e6 / math.min(ga, gb)).toLong)
    }
    // brute twin over the exploded shingle frame
    val g = docs.select(col("source"),
        explode(Dedup.shingles(col("text"), 5)).as("fp"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = g.groupBy(_._1).map { case (s, v) => (s, v.map(_._2).toSet) }
    val brute = (for {
      (a, sa) <- bySrc; (b, sb) <- bySrc if a < b
      n = (sa & sb).size if n > 0
    } yield ((a, b), n.toLong)).toMap
    assert(rows.map(r => ((r.getString(0), r.getString(1)),
      r.getLong(4))).toMap == brute)
  }

  test("curriculum order is a stage-monotone permutation") {
    val rows = graft.operators.Packing.curriculumOrder(docs, stages = 4)
      .collect()
    val n = rows.length
    assert(rows.map(_.getLong(4)).sorted.toSeq == (0L until n).toSeq,
      "curriculum_pos must be a 0-based permutation")
    // every stage-s position precedes every stage-(s+1) position
    val maxByStage = rows.groupBy(_.getInt(2))
      .map { case (s, v) => (s, (v.map(_.getLong(4)).min,
        v.map(_.getLong(4)).max)) }
    maxByStage.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((_, (_, maxA)), (_, (minB, _))) => assert(maxA < minB)
      case _ =>
    }
  }

  test("exact quantiles equal the sorted-corpus elements") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val qs = Seq(0L, 250000L, 500000L, 750000L, 990000L, 1000000L)
    val got = graft.operators.Profile
      .exactQuantiles(li, "l_extendedprice", qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val sorted = li.select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    qs.foreach { q =>
      val r = ((n - 1).toLong * q / 1000000L).toInt
      assert(got(q) == sorted(r), s"q=$q: ${got(q)} != ${sorted(r)}")
    }
    assert(got(0L) == sorted.head && got(1000000L) == sorted.last)
  }

  test("length batches pad within the band and fill slots densely") {
    val rows = graft.operators.Packing.lengthBatches(docs,
      batchTokens = 2048, bandWidth = 64).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (n, band, pad) = (r.getLong(1), r.getLong(2), r.getLong(6))
      assert(band == n / 64)
      assert(pad >= 1 && pad <= 64, s"pad $pad out of band range")
      assert(pad == (band + 1) * 64 - n)
    }
    // within each band: batches numbered densely, slots dense within
    // every batch except possibly the last
    rows.groupBy(_.getLong(2)).foreach { case (band, brs) =>
      val perBatch = math.max(1L, 2048L / ((band + 1) * 64))
      brs.groupBy(_.getLong(4)).foreach { case (batch, bs) =>
        assert(bs.map(_.getLong(5)).sorted.toSeq ==
          (0L until bs.length).toSeq, s"band $band batch $batch slots")
        assert(bs.length <= perBatch)
      }
      val ranks = brs.map(_.getLong(3)).sorted.toSeq
      assert(ranks == (0L until brs.length).toSeq,
        s"band $band ranks must be a dense permutation")
    }
  }

  test("effective mixture discounts the smaller side of each overlap") {
    val rows = graft.operators.Mixture.effectiveMixture(docs).collect()
    val ov = CorpusStats.sourceOverlap(docs).collect()
    val grams = (ov.map(r => (r.getString(0), r.getLong(2))) ++
      ov.map(r => (r.getString(1), r.getLong(3)))).toMap
    // recompute each source's worst containment against a larger peer
    val expect = ov.flatMap { r =>
      val (a, b, ga, gb, ppm) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(5))
      val loser = if (ga < gb || (ga == gb && a > b)) a else b
      Seq(loser -> ppm)
    }.groupBy(_._1).map { case (s, v) => (s, v.map(_._2).max) }
    rows.foreach { r =>
      val (s, n, dup, eff, w) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dup == expect.getOrElse(s, 0L), s"dup_ppm of $s")
      assert(eff == n - math.floor(n.toDouble * dup / 1e6).toLong)
      assert(w >= 0 && w <= 1000000L)
    }
    assert(math.abs(rows.map(_.getLong(4)).sum - 1000000L) <= rows.length,
      "weights must sum to ~1e6 (floor slack <= 1 ppm per source)")
    assert(grams.nonEmpty)
  }

  test("covariance drift is zero between identical halves") {
    import spark.implicits._
    // mirror the corpus into both halves: every (i, j) drift must be
    // exactly 0.0 (the two slices see identical moment sums)
    val base = embs.limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mirrored = (base.map { case (id, e) => (id * 2, e) } ++
      base.map { case (id, e) => (id * 2 + 1, e) })
      .toSeq.toDF("vec_id", "embedding")
    val drift = graft.operators.VectorStats
      .covDrift(mirrored, col("vec_id") % 2 === 0)
      .collect()
    assert(drift.nonEmpty)
    drift.foreach(r => assert(r.getDouble(4) == 0.0,
      s"drift at (${r.getInt(0)},${r.getInt(1)}) = ${r.getDouble(4)}"))
  }

  test("pack masks tile every sequence exactly") {
    val masks = graft.operators.Packing.packMasks(docs, seqLen = 512)
      .collect()
    // per (bucket, pack): spans are disjoint, contiguous from 0, and
    // sum to the audited token count
    val audit = graft.operators.Packing
      .packShardAudit(docs, seqLen = 512).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    masks.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case (key, spans) =>
        val ordered = spans.sortBy(_.getLong(2))
        assert(ordered.map(_.getLong(2)).toSeq ==
          (0L until ordered.length).toSeq, "slots must be dense")
        var pos = 0L
        ordered.foreach { s =>
          assert(s.getLong(4) == pos, s"gap at $key slot ${s.getLong(2)}")
          assert(s.getLong(5) > 0)
          pos += s.getLong(5)
        }
        assert(pos == audit(key), s"span total != audited tokens at $key")
    }
  }

  test("m13 pair curation merges clusters across modalities") {
    import spark.implicits._
    // (101, 102): an IMAGE variant pair (the planted dHash perturb at
    // id % 101 == 1) under UNRELATED captions; (5, 9): identical
    // captions under unrelated images; 7 is a singleton
    val tiny = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different caption about mountains and rivers"),
      (5L, "a red bicycle leaning against a brick wall outside"),
      (9L, "a red bicycle leaning against a brick wall outside"),
      (7L, "nothing here resembles anything else in this fixture"))
      .toDF("doc_id", "text")
    val out = Multimodal.pairCuration(spark, tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // the image edge merges 101/102 despite disjoint captions
    assert(out(101L)._1 == out(102L)._1, "image edge must cluster")
    assert(Seq(out(101L), out(102L)).count(_._2) == 1,
      "exactly one survivor in the image cluster")
    // the caption edge merges 5/9 despite unrelated images
    assert(out(5L)._1 == out(9L)._1, "caption edge must cluster")
    assert(Seq(out(5L), out(9L)).count(_._2) == 1)
    // the two clusters stay separate; the singleton survives
    assert(out(101L)._1 != out(5L)._1)
    assert(out(7L) == ((7L, true)))
  }

  test("t33 unigram DP: fewest pieces, then count, then seg string; coverage holds") {
    import graft.operators.Tokenizer
    // "abcd": one 4-char piece beats any split regardless of counts
    assert(Tokenizer.viterbiSeg("abcd", Seq(
      (0, "abcd", 1L), (0, "ab", 99L), (2, "cd", 99L),
      (0, "a", 9L), (1, "b", 9L), (2, "c", 9L), (3, "d", 9L)))
      .contains("abcd"))
    // equal piece count: higher summed count wins
    assert(Tokenizer.viterbiSeg("abcd", Seq(
      (0, "ab", 5L), (2, "cd", 5L), (0, "abc", 1L), (3, "d", 1L)))
      .contains("ab cd"))
    // full tie on (n, s): lexicographically smaller seg string wins
    assert(Tokenizer.viterbiSeg("abcd", Seq(
      (0, "ab", 5L), (2, "cd", 5L), (0, "abc", 4L), (3, "d", 6L)))
      .contains("ab cd"))
    // uncoverable position -> None (the encode identity fallback)
    assert(Tokenizer.viterbiSeg("abcd", Seq(
      (0, "ab", 5L), (3, "d", 5L))).isEmpty)
  }

  test("t33/t34 unigram round-trip: trained pieces reconstruct every word") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val tiny = Seq((1L, "banana band bandana banana band"),
      (2L, "ana band banana bandana ana")).toDF("doc_id", "text")
    val vocab = Tokenizer.unigramTrain(tiny, rounds = 2, maxPiece = 4,
      minCount = 2, maxWordLen = 12)
    val pieces = vocab.collect().map(_.getString(0)).toSet
    // coverage: every char of the corpus words is in the vocab
    assert(Seq("b", "a", "n", "d").forall(pieces.contains))
    val enc = Tokenizer.unigramEncode(tiny, vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(1L)._1 == 5 && enc(2L)._1 == 5) // n_words
    // segmentation compresses: fewer tokens than characters
    assert(enc(1L)._2 < "banana band bandana banana band"
      .replace(" ", "").length)
    assert(enc(1L)._2 >= 5) // at least one piece per word
  }

  test("t38 soft EM: posterior mass spreads beyond the Viterbi path, " +
      "coverage holds, hard fallback when weights floor out") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val tiny = Seq((1L, "banana band bandana banana band"),
      (2L, "ana band banana bandana ana")).toDF("doc_id", "text")
    val hard = Tokenizer.unigramTrain(tiny, rounds = 2, maxPiece = 4,
      minCount = 2, maxWordLen = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val soft = Tokenizer.unigramTrainSoft(tiny, rounds = 2,
      maxPiece = 4, minCount = 2, maxWordLen = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // coverage chars survive in both
    assert(Seq("b", "a", "n", "d").forall(soft.contains))
    // genuinely SOFT: the count vector differs from Viterbi's — some
    // piece carries posterior mass the single best path never credits
    assert(soft != hard, s"soft EM degenerated to Viterbi: $soft")
    // soft credits are per-word floor-bounded by the hard credit's
    // scale: no piece count explodes past total word mass
    val totalWords = 10L
    assert(soft.values.forall(c => c >= 0 && c <= totalWords * 12),
      s"implausible soft counts: $soft")
    // the one-word fixture where every multi-piece segmentation
    // floors to zero relative to the dominant whole... the fallback
    // path: a vocabulary whose maxCnt dwarfs every piece drives all
    // weights to 0 and the word must still train (hard credit)
    val seq = Tokenizer.softCredits("ab", 3L,
      Seq((0, "a", 1L), (1, "b", 1L)), maxCnt = 10000000L)
    assert(seq.toMap == Map("a" -> 3L, "b" -> 3L),
      s"Z=0 fallback must emit the Viterbi hard credit: $seq")
  }

  test("t36 tokenizer coverage: whole-word vocab drives fertility to 1") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val tiny = Seq(
      (1L, "alpha", "banana band banana band banana band"),
      (2L, "beta", "bandana banana bandana banana"))
      .toDF("doc_id", "source", "text")
    // every distinct word appears >= 2 times and is <= 7 chars, so at
    // maxPiece = 8 each full word is itself a surviving candidate and
    // the DP picks it whole: fertility exactly 1e6, whole-word 1e6
    val v = Tokenizer.unigramTrain(tiny, rounds = 2, maxPiece = 8,
      minCount = 2, maxWordLen = 12)
    val cov = Tokenizer.tokenizerCoverage(tiny, v, maxPiece = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(cov("alpha") == ((6L, 6L, 1000000L, 1000000L)))
    assert(cov("beta") == ((4L, 4L, 1000000L, 1000000L)))
    // a cramped vocab (maxPiece = 2) must raise fertility above 1
    val v2 = Tokenizer.unigramTrain(tiny, rounds = 2, maxPiece = 2,
      minCount = 2, maxWordLen = 12)
    val cov2 = Tokenizer.tokenizerCoverage(tiny, v2, maxPiece = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(cov2("alpha") > 1000000L && cov2("beta") > 1000000L)
    // a source whose docs produce ZERO words must still emit a row —
    // it is the most under-served source the census exists to flag
    val withEmpty = tiny.union(Seq(
      (3L, "gamma", "   "), (4L, "gamma", ""))
      .toDF("doc_id", "source", "text"))
    val cov3 = Tokenizer.tokenizerCoverage(withEmpty, v, maxPiece = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(cov3.keySet == Set("alpha", "beta", "gamma"))
    assert(cov3("gamma") == ((2L, 0L, 0L, 0L, 0L, 0L)))
    assert(cov3("alpha")._1 == 1L && cov3("alpha")._3 == 6L)
  }
}
