package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for training-data pipelines (north-star
  * scope): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on the 128-bit md5 content key
  *    ([[contentKey]]) — 32 bytes + id per document on the wire,
  *    never document bodies;
  *  - the Jaccard path is the verify stage: it joins on shingles, so
  *    its cost is bounded by candidate generation — never run it
  *    all-pairs at scale, always behind MinHash banding;
  *  - MinHash+LSH is the scale path: signatures are computed per-row
  *    (no shuffle), then one shuffle per band on the band key; only
  *    bucket-colliding pairs reach the exact verifier;
  *  - SimHash reduces each document to one 60-bit word per row; the
  *    pair join runs over DISTINCT hashes on four 15-bit pigeonhole
  *    blocks (complete at Hamming distance ≤ 3) with an
  *    oversized-bucket sub-split + hard cap — see [[simhashBlocks]];
  *  - embedding near-dup brute-force is quadratic — kept for oracle
  *    verification; the scale path is [[Similarity]] LSH bucketing.
  *
  * All hashes are polynomial mod 1e9+7 — integer-exact, so every
  * stage (including MinHash band keys) is reproducible in ANSI SQL
  * for the DuckDB oracle.
  */
object Dedup {
  import TextAnalysis.{Mod, fingerprint, tokens}

  /** Normalized text key: lower-cased, whitespace-collapsed. */
  def normKey(text: Column): Column =
    array_join(tokens(text), " ")

  /** 128-bit content key: md5 of the normalized text. The exact-dedup
    * shuffle moves this 32-byte digest instead of the document body —
    * at 25B documents that is ~1 TB of key shuffle versus shipping
    * the whole corpus. 128 bits keeps the collision expectation at
    * ~2^-61 per pair (the standard content-hash dedup trade); md5 is
    * bit-identical across engines, so the grouping is reproducible
    * anywhere (the oracle can even keep grouping by the raw text —
    * absent collisions the partitions of rows are the same). */
  def contentKey(text: Column): Column =
    md5(normKey(text).cast("binary"))

  /** Exact dedup: one representative (min doc_id) per normalized
    * text, with the duplicate count. Groups on [[contentKey]], so the
    * shuffle carries (digest, id) — never document bodies. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(contentKey(col("text")).as("text_key"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Distinct word-k-shingle fingerprints per document (per-row,
    * shuffle-free). Native expression — one JVM loop per document
    * instead of interpreted HOFs; math matches the SQL oracle. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.hashFunctions.shingle_fps(text, k)

  /** The per-doc shingle frame is consumed 3–5 times downstream
    * (df count, candidate join's two sides, hot-array build, verify) —
    * as a pure lazy plan every consumer would re-run the ENTIRE
    * upstream (in [[CurationPipeline.curate]] that is the
    * annotate→filter→md5-dedup chain) plus the shingling itself.
    * A lazy `localCheckpoint` materializes (doc_id, shingles, n_sh)
    * exactly once at first use; every later scan reads the cached
    * (memory-then-disk) leaf. Cache size ≈ 8 bytes × corpus token
    * count — strictly smaller than one extra upstream recompute, and
    * it is paid once versus four recomputes. On a real cluster swap
    * for a reliable `checkpoint()` if executor loss matters (same
    * trade as [[resolveClusters]]). */
  private def docShingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      shingles(col("text"), k).as("sh"),
      size(shingles(col("text"), k)).as("n_sh"))
      .localCheckpoint(eager = false)

  /** N-gram Jaccard near-dup pairs, in two stages:
    *
    *  1. **candidate generation** — explode distinct shingles, drop
    *     shingles whose document frequency exceeds `maxShingleDf`
    *     (a shingle shared by d documents otherwise lands d rows on
    *     ONE shuffle key and emits d² candidate pairs — boilerplate
    *     text makes that a single-task quadratic blowup at 100 TB),
    *     then self-join on the surviving shingles;
    *  2. **exact verify** — join candidates back to the FULL
    *     (uncapped) shingle arrays and threshold on exact
    *     intersection/union with INTEGER math
    *     (`common*100 >= pct*union`), so every emitted pair's Jaccard
    *     is computed over all shingles, capped or not.
    *
    * The cap can only lose pairs whose every common shingle is in
    * > `maxShingleDf` documents. For documents with below-cap
    * multiplicity that means boilerplate-only matches (the standard
    * df-cut trade-off) — but it also means a duplicate CLUSTER larger
    * than the cap is invisible here, since all of its shared shingles
    * exceed the cap by construction. Run exact dedup first (identical
    * copies collapse before df is counted), and enumerate mega-cluster
    * near-dups with [[minhashPairs]] — band keys are df-insensitive,
    * so its candidate cost is proportional to the true (inherently
    * quadratic) pair output — then resolve transitively with
    * [[resolveClusters]].
    *
    * Verify never shuffles the corpus's full shingle arrays: the
    * candidate join's `groupBy(pair).count` IS the exact common count
    * over rare shingles (shingles are distinct per document), and the
    * hot remainder comes from per-doc HOT-only arrays (tiny — a doc
    * has few boilerplate shingles), so the per-doc payload joined to
    * candidates is (n_sh, hot array) ≈ tens of bytes instead of the
    * whole shingle set — at 25B documents that is the difference
    * between ~1 TB and tens of TB of verify shuffle. */
  def jaccardPairs(docs: DataFrame, k: Int = 3, pct: Int = 85,
      maxShingleDf: Int = 100): DataFrame =
    cappedCommonCounts(docShingles(docs, k), maxShingleDf)
      .withColumn("u", col("a_n") + col("b_n") - col("common"))
      .filter(col("common") * 100 >= col("u") * pct)
      .select(col("a_id"), col("b_id"), col("common"),
        col("u").as("union_size"))

  /** Shared engine of [[jaccardPairs]] and [[winnowContainmentPairs]]:
    * from a per-doc distinct-key frame `(doc_id, sh, n_sh)`, emit
    * every pair sharing at least one sub-cap-df key, with the EXACT
    * common-key count over ALL keys (capped or not) and both set
    * sizes: `(a_id, b_id, common, a_n, b_n)`. The caller applies its
    * own threshold arithmetic (Jaccard over the union, containment
    * over the smaller set, ...). */
  private def cappedCommonCounts(ds: DataFrame, maxDf: Int): DataFrame = {
    val ex = ds.select(col("doc_id"), explode(col("sh")).as("s"))
    // anti-join against the HOT set (df > cap), not inner-join against
    // the rare set: hot keys are by construction the small side
    // (≤ total-occurrences/cap distinct values), so AQE turns this
    // into a broadcast anti-join. (Measured alternative: computing df
    // with a window over `s` saves the second scan but its
    // whole-partition sort is ~2× slower than the hash agg here.)
    val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("s")
    val capped = ex.join(hot, Seq("s"), "left_anti")
    // candidate pairs + exact |A∩B∩rare| in ONE shuffle (the distinct
    // and the count are the same aggregation)
    val cands = capped.select(col("s"), col("doc_id").as("a_id"))
      .join(capped.select(col("s"), col("doc_id").as("b_id")), "s")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common_rare"))
    // per-doc hot-key arrays (empty for most docs) + key count
    val hotOfDoc = ex.join(hot, Seq("s"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("s"))).as("hot_sh"))
    val slim = ds.select(col("doc_id"), col("n_sh"))
      .join(hotOfDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("hot_sh"), array().cast("array<bigint>")).as("hot_sh"))
    cands
      .join(slim.toDF("a_id", "a_n", "a_hot"), "a_id")
      .join(slim.toDF("b_id", "b_n", "b_hot"), "b_id")
      .withColumn("common", col("common_rare") +
        size(array_intersect(col("a_hot"), col("b_hot"))))
      .select("a_id", "b_id", "common", "a_n", "b_n")
  }

  /** Containment near-dup pairs over WINNOWED fingerprints: two
    * documents pair when they share a sub-cap fingerprint and
    * `|A∩B| ≥ pct% of min(|A|, |B|)` — the asymmetric
    * containment score that catches a document EMBEDDED in a larger
    * one (quote-and-extend plagiarism, boilerplate-wrapped reposts),
    * which symmetric Jaccard dilutes toward zero as the size ratio
    * grows. Input keys are each doc's winnowing minima
    * ([[TextAnalysis.winnowFingerprintSets]]), so the index is
    * ~2/(w+1) the size of the full shingle index and any shared run
    * of ≥ w+k-1 words is guaranteed represented. Same candidate /
    * df-cap / exact-verify machinery as [[jaccardPairs]]
    * ([[cappedCommonCounts]]) — one hash-join pipeline, no cartesian. */
  def winnowContainmentPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
      pct: Int = 60, maxFpDf: Int = 100): DataFrame = {
    // the pair stage scans the fingerprint frame 3-4 times (df count,
    // both candidate sides, hot arrays) and the window pass above it
    // is the expensive part — checkpoint it once, like docShingles
    val sets = TextAnalysis.winnowFingerprintSets(docs, k, w)
      .select(col("doc_id"), col("fps").as("sh"), col("n_fp").as("n_sh"))
      .localCheckpoint(eager = false)
    cappedCommonCounts(sets, maxFpDf)
      .withColumn("min_fp", least(col("a_n"), col("b_n")))
      .filter(col("common") * 100 >= col("min_fp") * pct)
      .select(col("a_id"), col("b_id"), col("common").as("shared"),
        col("min_fp"))
  }

  /** MinHash signature: for hash i in 0..n, min over shingle
    * fingerprints of `(fp*(2i+1) + i*12345 + 1) mod M` — affine
    * permutations with deterministic, SQL-reproducible parameters. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.functions.hashFunctions.minhash_sig(sh, numHashes)

  /** (doc_id, band, key) band-key rows for LSH banding: band key =
    * fingerprint-combine of the band's signature slice. Carries only
    * ids and keys — never the shingle arrays. */
  private def bandKeys(ds: DataFrame, numHashes: Int, bands: Int): DataFrame =
    bandKeyVectors(ds, numHashes, bands)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"), element_at(col("keys"), b + 1).as("key"))))
          .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Per-document band-key VECTOR `(doc_id, keys[bands], sigkey)` —
    * `sigkey` folds the whole signature (the all-bands key), used by
    * the identical-signature rescue path of [[bandCandidates]]. */
  private def bandKeyVectors(ds: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val rows = numHashes / bands
    ds.withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(bands - 1)), b =>
          aggregate(slice(col("sig"), b * rows + 1, lit(rows)), lit(0L),
            (acc, x) => (acc * 31L + x) % Mod)).as("keys"))
      .withColumn("sigkey",
        aggregate(col("keys"), lit(0L), (acc, x) => (acc * 31L + x) % Mod))
  }

  /** Exact-Jaccard verification of candidate (aCol, bCol) pairs:
    * joins each side's FULL shingle array back in and keeps pairs
    * with `common*100 >= pct*union` (integer math). Shared by
    * [[minhashPairs]] and [[minhashPairsAgainst]] so the threshold
    * arithmetic exists exactly once. */
  private def verifyPairs(candidates: DataFrame, aCol: String,
      dsA: DataFrame, bCol: String, dsB: DataFrame,
      pct: Int): DataFrame =
    candidates
      .join(dsA.select(col("doc_id").as(aCol), col("sh").as("a_sh"),
        col("n_sh").as("a_n")), aCol)
      .join(dsB.select(col("doc_id").as(bCol), col("sh").as("b_sh"),
        col("n_sh").as("b_n")), bCol)
      .withColumn("common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("u", col("a_n") + col("b_n") - col("common"))
      .filter(col("common") * 100 >= col("u") * pct)
      .select(col(aCol), col(bCol), col("common"),
        col("u").as("union_size"))

  /** MinHash+LSH near-dup pairs: band the signature (`bands` bands of
    * `numHashes/bands` rows), shuffle once per band on the band key,
    * then exact-Jaccard-verify only bucket collisions. Output matches
    * [[jaccardPairs]] minus LSH false negatives.
    *
    * The band shuffles carry only (id, band, key) — never the shingle
    * arrays (a document's full shingle set riding `bands` exchanges
    * would dominate shuffle volume at corpus scale); the arrays are
    * joined in only for the deduplicated candidate pairs. */
  /** Deduplicated within-corpus band-collision candidate pairs
    * `(a_id, b_id)`, a_id < b_id — shared by every banded detector
    * ([[minhashPairs]], [[editDistancePairs]]) so the collision join
    * (and its skew treatment) exists exactly once.
    *
    * Oversized-bucket guard (round 10, the [[simhashBlocks]] pattern
    * adapted to an UNBOUNDED key space): the band-key domain is
    * Mod-sized, so there is no broadcastable full census — instead
    * only the HOT keys (population > `maxBucket`, ≤ corpus/maxBucket
    * rows by construction) are aggregated and broadcast. Hot buckets
    * are sub-split by the NEXT band's key (near-dup signatures agree
    * on most bands, so genuine neighbours usually survive together),
    * and refined buckets still above the cap keep a deterministic
    * `maxBucket`-sized prefix — candidate fan-out per join key is
    * `maxBucket`² unconditionally.
    *
    * The cap cannot lose the genuinely-duplicate mass: documents
    * whose WHOLE signature folds to the same `sigkey` are paired by
    * a separate identical-signature join, independent of any bucket
    * cap — quadratic only in identical-signature group size, which is
    * (almost exactly) the verified-duplicate output size. A sigkey
    * fold collision can only ADD candidates; the exact-Jaccard verify
    * stage discards them, so output semantics never change. */
  private def bandCandidates(ds: DataFrame, numHashes: Int,
      bands: Int, maxBucket: Int = 1 << 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = bandKeyVectors(ds, numHashes, bands)
      .localCheckpoint(eager = false) // band explode + census (+ rescue)
    val blocked = vecs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), element_at(col("keys"), b + 1).as("key"),
          element_at(col("keys"), (b + 1) % bands + 1).as("sub0"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"), col("bk.sub0").as("sub0"))
    val hot = blocked.groupBy("band", "key").count()
      .filter(col("count") > maxBucket)
      .select(col("band"), col("key"), lit(true).as("__hot"))
    // PAY-AS-YOU-GO: the census (one narrow key aggregation — the
    // same rows the collision join shuffles anyway) always runs, but
    // the sub-split / cap / rescue machinery only engages when a
    // bucket actually exceeds the cap. The common, healthy corpus
    // pays one aggregate and keeps the plain two-table join; nothing
    // is dropped in that branch, so the rescue join is unnecessary.
    if (hot.isEmpty) {
      val banded = blocked.select("doc_id", "band", "key")
      banded.toDF("a_id", "band", "key")
        .join(banded.toDF("b_id", "band", "key"), Seq("band", "key"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    } else {
      val sized = blocked.join(broadcast(hot), Seq("band", "key"), "left")
      val small = sized.filter(col("__hot").isNull).withColumn("sub", lit(0L))
      val capped = sized.filter(col("__hot").isNotNull)
        .withColumn("sub", col("sub0"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("band", "key", "sub").orderBy("doc_id")))
        .filter(col("rn") <= maxBucket)
      val banded = small.select("doc_id", "band", "key", "sub")
        .unionByName(capped.select("doc_id", "band", "key", "sub"))
      val bandPairs = banded.toDF("a_id", "band", "key", "sub")
        .join(banded.toDF("b_id", "band", "key", "sub"),
          Seq("band", "key", "sub"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
      val intra = vecs.select(col("doc_id").as("a_id"), col("sigkey"))
        .join(vecs.select(col("doc_id").as("b_id"), col("sigkey")), "sigkey")
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
      bandPairs.unionByName(intra).distinct()
    }
  }

  def minhashPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 16,
      bands: Int = 4, pct: Int = 80,
      maxBucket: Int = 1 << 16): DataFrame = {
    val ds = docShingles(docs, k)
    verifyPairs(bandCandidates(ds, numHashes, bands, maxBucket), "a_id", ds,
      "b_id", ds, pct)
  }

  /** Incremental MinHash dedup: near-dup pairs BETWEEN an incoming
    * batch and an existing index — the daily-crawl shape, where
    * re-deduplicating the whole corpus per batch
    * ([[minhashPairs]] over new ∪ index) would re-pay the full-corpus
    * candidate join every day.
    *
    * Same banding/verify math as [[minhashPairs]] (so a pair found
    * here equals the pair the full run would find), but candidates
    * come only from new×index band-key collisions. The batch side is
    * normally ≪ the index, so its band keys are a broadcast-sized
    * frame and the index is probed map-side; the index's shingle
    * arrays are joined in only for deduplicated candidate pairs. */
  def minhashPairsAgainst(newDocs: DataFrame, indexDocs: DataFrame,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      pct: Int = 80, maxBucket: Int = 1 << 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dsN = docShingles(newDocs, k)
    val dsI = docShingles(indexDocs, k)
    // STANDING-INDEX-side oversized-bucket guard (the [[bandCandidates]]
    // pattern, asymmetric): a pile-up bucket in a billion-doc index
    // would otherwise fan every colliding batch doc out by the full
    // bucket. Hot index keys (population > maxBucket — at most
    // index/maxBucket of them) sub-split by the next band's key and
    // cap at a deterministic prefix; the BATCH side probes with both
    // the unsplit (sub = 0) and its own refined key, so it matches
    // whichever way the guard routed the index bucket — and, carrying
    // no aggregation, the batch side stays streaming-legal. The
    // identical-signature rescue join (batch sigkey × index sigkey —
    // a stream-static equi-join) keeps the genuinely-duplicate mass
    // cap-independent; fold collisions only add candidates, which
    // exact verify discards.
    val vecsI = bandKeyVectors(dsI, numHashes, bands)
      .localCheckpoint(eager = false) // band explode + sigkey rescue
    val blockedI = vecsI.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), element_at(col("keys"), b + 1).as("key"),
          element_at(col("keys"), (b + 1) % bands + 1).as("sub0"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"), col("bk.sub0").as("sub0"))
    val hot = blockedI.groupBy("band", "key").count()
      .filter(col("count") > maxBucket)
      .select(col("band"), col("key"), lit(true).as("__hot"))
    // pay-as-you-go, as in [[bandCandidates]]: the INDEX census is a
    // batch-side aggregate either way (the index is the static side),
    // and the guard machinery engages only when a bucket is hot
    val candidates = if (hot.isEmpty) {
      bandKeys(dsN, numHashes, bands)
        .toDF("new_id", "band", "key")
        .join(bandKeys(dsI, numHashes, bands)
          .toDF("index_id", "band", "key"), Seq("band", "key"))
        .select("new_id", "index_id")
        // dropDuplicates, not distinct(): stays a streaming-legal
        // Deduplicate when newDocs is a live stream (distinct() is an
        // Aggregate, which would forbid the downstream verify joins
        // in append mode)
        .dropDuplicates("new_id", "index_id")
    } else {
      val sizedI = blockedI.join(broadcast(hot), Seq("band", "key"), "left")
      val smallI = sizedI.filter(col("__hot").isNull).withColumn("sub", lit(0L))
      val cappedI = sizedI.filter(col("__hot").isNotNull)
        .withColumn("sub", col("sub0"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("band", "key", "sub").orderBy("doc_id")))
        .filter(col("rn") <= maxBucket)
      val indexKeys = smallI.select(col("doc_id").as("index_id"),
          col("band"), col("key"), col("sub"))
        .unionByName(cappedI.select(col("doc_id").as("index_id"),
          col("band"), col("key"), col("sub")))
      val vecsN = bandKeyVectors(dsN, numHashes, bands)
      val probeN = vecsN.select(col("doc_id").as("new_id"),
          explode(transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("band"), element_at(col("keys"), b + 1).as("key"),
              element_at(col("keys"), (b + 1) % bands + 1).as("sub0"))))
            .as("bk"))
        .select(col("new_id"), col("bk.band").as("band"),
          col("bk.key").as("key"),
          explode(array(lit(0L), col("bk.sub0"))).as("sub"))
      val bandPairs = probeN
        .join(indexKeys, Seq("band", "key", "sub"))
        .select("new_id", "index_id")
      val intra = vecsN.select(col("doc_id").as("new_id"), col("sigkey"))
        .join(vecsI.select(col("doc_id").as("index_id"), col("sigkey")),
          "sigkey")
        .select("new_id", "index_id")
      bandPairs.unionByName(intra)
        .dropDuplicates("new_id", "index_id")
    }
    verifyPairs(candidates, "new_id", dsN, "index_id", dsI, pct)
  }

  /** Quality-aware survivor selection over duplicate clusters — the
    * policy layer above [[resolveClusters]]: instead of the arbitrary
    * "keep the min id", keep each cluster's BEST copy by
    * [[TextAnalysis.qualityScore]] (near-dup copies differ — the one
    * with boilerplate stripped, better punctuation balance, fuller
    * text is worth keeping). Ties break on doc_id, so the choice is
    * total-ordered and reproducible. Unpaired documents keep
    * themselves.
    *
    * Output: one row per document — its cluster, whether IT is the
    * survivor, and the cluster's surviving doc — the manifest a
    * delete/rewrite job consumes.
    *
    * Scale shape: clusters exist only for PAIRED docs (a
    * near-dup-sized frame, broadcast only below
    * [[MaxBroadcastLabels]] — see [[keepBestBy]]); the survivor
    * argmax is one map-side-combinable `max_by` per PAIRED cluster
    * over (quality, -id); the corpus pass is a left join + per-row
    * compare — quality is computed per-row in the same scan, never
    * shuffled. */
  def keepBestPerCluster(docs: DataFrame, k: Int = 3,
      pct: Int = 80): DataFrame =
    keepBestByQuality(docs,
      resolveClusters(minhashPairs(docs, k = k, pct = pct))
        .select(col("doc_id"), col("cluster_id")))

  /** Default ceiling on broadcast-joined label frames (rows). Mirrors
    * [[Graph.BroadcastNodeLimit]]'s role: survivor-policy label maps
    * are PAIRED-doc-sized, which at sane dup rates is orders of
    * magnitude below the corpus — but at production near-dup rates
    * (30–50% of a web crawl is paired) the frame is corpus-scale and
    * a forced `broadcast()` hint dies at the broadcast limit / driver
    * OOM. 50M (id, id) rows ≈ 800 MB serialized — comfortably inside
    * an executor, the right handoff point to the shuffle shape. */
  private[graft] val MaxBroadcastLabels: Long = 50L * 1000 * 1000

  /** Shared survivor-selection engine behind dd14/dd15/dd20/m13: over
    * a corpus `scored0 = (idCol, scoreCol)` frame and a PAIRED-only
    * label frame `labels0 = (idCol, cluster_id)`, each cluster keeps
    * its highest-score member (ties → LOWER id); unlabeled rows
    * self-cluster and self-keep map-side.
    *
    * Scale shape: the label frame is checkpointed and COUNTED once
    * (lazy-checkpoint leaves carry no stats for AQE), and everything
    * label-keyed — the labels themselves, the per-cluster argmax, the
    * label+keep map — rides broadcasts only while the count stays
    * under `maxBroadcastLabels`; above it every join falls back to
    * the key-equi shuffle shape, which spills and scales unbounded
    * (the dd18 / [[Graph.BroadcastNodeLimit]] discipline). The
    * survivor argmax aggregates over the PAIRED subset only (one
    * corpus-probe join + a map-side-combinable `max_by` per paired
    * cluster), never over one-row singleton groups, so the `best`
    * frame is paired-cluster-sized — NOT corpus-sized the way a
    * groupBy over coalesced self-clusters would be. The corpus is
    * scanned once for scores (checkpointed) and probed twice. */
  private[graft] def keepBestBy(scored0: DataFrame, idCol: String,
      scoreCol: String, labels0: DataFrame,
      maxBroadcastLabels: Long = MaxBroadcastLabels): DataFrame = {
    val scored = scored0
      .localCheckpoint(eager = false) // survivor agg + final join
    val labels = labels0.select(col(idCol), col("cluster_id"))
      .localCheckpoint(eager = false) // count + argmax join + keep map
    val small = labels.count() <= maxBroadcastLabels
    def mside(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // argmax by (score, then LOWER id), over paired clusters only
    val best = scored.join(mside(labels), idCol)
      .groupBy("cluster_id")
      .agg(max_by(col(idCol),
        struct(col(scoreCol), -col(idCol))).as("keep_id"))
    val labeled = labels.join(mside(best), "cluster_id")
    scored.join(mside(labeled), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        coalesce(col("keep_id"), col(idCol)).as("keep_id"),
        (col(idCol) === coalesce(col("keep_id"), col(idCol))).as("keep"),
        col(scoreCol))
  }

  /** The dd14 survivor rule over an EXPLICIT `(doc_id, cluster_id)`
    * label frame — split out so compositions with a different
    * cluster source (m13's image×caption union) reuse the exact same
    * policy: highest [[TextAnalysis.qualityScore]] survives, ties to
    * the LOWER id; unpaired docs self-cluster via the left join.
    * Size-guarded via [[keepBestBy]]: labels broadcast only below
    * [[MaxBroadcastLabels]]; the corpus is scanned once for
    * quality. */
  private[graft] def keepBestByQuality(docs: DataFrame,
      clusters: DataFrame,
      maxBroadcastLabels: Long = MaxBroadcastLabels): DataFrame =
    keepBestBy(
      docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      "doc_id", "quality", clusters, maxBroadcastLabels)

  /** SOFT dedup (dd18): instead of dropping duplicates, keep every
    * document and DOWN-WEIGHT it by its near-dup multiplicity —
    * `weight_ppm = 1e6 div cluster_size` — so a cluster of n
    * near-copies contributes one document's worth of training mass in
    * expectation. This is the sampling-weight formulation recent data
    * recipes prefer over hard removal (hard dedup throws away the
    * natural frequency signal entirely; soft dedup preserves a
    * flattened version of it), and the weight column drives a
    * downstream [[Mixture]]-style hash coin directly.
    *
    * Scale shape: clusters exist only for PAIRED docs, so the
    * cluster-size aggregation runs on the near-dup-sized label frame
    * (one small key-shuffle), and the corpus pass is a single left
    * join probing that frame — unpaired documents take weight 1e6
    * ppm map-side without touching any exchange
    * ([[keepBestPerCluster]]'s corpus shape). The paired frame rides
    * a broadcast only while it is ACTUALLY broadcast-sized
    * (`maxBroadcastLabels` rows, counted once off the checkpointed
    * frame): at sane dup rates the paired set is orders of magnitude
    * smaller than the corpus, but a pathological corpus — half of
    * everything a near-copy — would make the label frame
    * corpus-scale, and forcing THAT through a broadcast OOMs the
    * driver; above the threshold the join falls back to the key-equi
    * shuffle shape, which scales unbounded.
    *
    * Output: one row per document —
    * `(doc_id, cluster_id, n_copies, weight_ppm)`. */
  def softDedupWeights(docs: DataFrame, k: Int = 3,
      pct: Int = 80, maxBroadcastLabels: Long = MaxBroadcastLabels): DataFrame = {
    val clusters = resolveClusters(minhashPairs(docs, k = k, pct = pct))
      .select(col("doc_id"), col("cluster_id"))
      .localCheckpoint(eager = false) // size agg + corpus join + count
    val small = clusters.count() <= maxBroadcastLabels
    def mside(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_copies"))
    val labeled = clusters.join(mside(sizes), "cluster_id")
    docs.select(col("doc_id"))
      .join(mside(labeled), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("n_copies"), lit(1L)).as("n_copies"))
      .withColumn("weight_ppm", expr("1000000 div n_copies"))
  }

  /** Edit-distance-verified near-dup pairs: MinHash band-key
    * collisions propose candidates (same banding as [[minhashPairs]]
    * — one narrow shuffle per band, never all-pairs), then the exact
    * verifier is character-level Levenshtein over a bounded prefix of
    * each document instead of shingle Jaccard. This is the detector
    * for SMALL edits — a typo fix, a swapped word, an inserted
    * sentence — where Jaccard over k-shingles is blunt (one edited
    * word flips k shingles at once) but edit distance counts the
    * character operations themselves.
    *
    * Scale design: Levenshtein is O(|a|·|b|) per pair, so it must
    * never see full documents or uncandidated pairs — the prefix cap
    * bounds each verification at `prefixLen²` character cells, and
    * banding bounds the pair count. Spark's `levenshtein(l, r, k)`
    * threshold form prunes further: the DP abandons a pair the moment
    * its distance provably exceeds `maxDist` (banded O(maxDist ·
    * prefixLen) cells), returning -1 that the filter drops — the
    * verify cost per candidate is proportional to the answer, not the
    * text. Prefix comparison is exact for the near-identical pairs
    * this targets (edits distribute through the text); a suffix or
    * mid-document-window variant composes the same way.
    *
    * Output: `(a_id, b_id, dist)` for candidate pairs whose prefix
    * edit distance is ≤ `maxDist`. */
  def editDistancePairs(docs: DataFrame, maxDist: Int = 8,
      prefixLen: Int = 160, k: Int = 3, numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val candidates = bandCandidates(docShingles(docs, k), numHashes, bands)
    // prefixes ride the candidate joins only — the corpus text never
    // crosses the band shuffles
    val pre = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("pre"))
    candidates
      .join(pre.toDF("a_id", "a_pre"), "a_id")
      .join(pre.toDF("b_id", "b_pre"), "b_id")
      .withColumn("dist", levenshtein(col("a_pre"), col("b_pre"), maxDist))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id", "dist")
  }

  /** Cross-document duplicate SPANS (substring-level exact dedup —
    * the operation behind "dedup the corpus at the 50-token level,
    * not the document level"): every maximal run of word-`k`-gram
    * positions whose gram also appears in ANOTHER document. Cutting
    * these spans (rather than dropping whole documents) removes the
    * repeated license blocks / navigation chrome / quoted tweets that
    * document-level near-dup keeps, without losing the unique prose
    * around them.
    *
    * Guarantee: a word-for-word substring of ≥ `k + minGrams - 1`
    * words shared verbatim across two documents is reported by both,
    * as one span each (consecutive duplicated grams merge by the
    * gaps-and-islands window). Hash collisions (fingerprints are
    * mod 1e9+7) can only ADD a rare false gram, never split a span.
    *
    * Scale shape: per-row gram expansion (codegen'd `GramFps`), one
    * hash aggregation on the gram fingerprint for document
    * frequency, a LEFT SEMI back-probe on the same key (both sides
    * hash-partitioned on `h` — AQE reuses the exchange), then ONE
    * doc_id-partitioned window to merge islands. Every shuffle
    * carries (doc_id, pos, h) longs — text never moves. At 25B docs
    * the gram-df aggregation is the big exchange (same class as
    * dd3's band shuffle); everything after it is near-dup-sized.
    *
    * Output: `(doc_id, start_pos, end_pos, n_grams, n_tokens)` per
    * maximal span, where positions index the doc's gram stream and
    * `n_tokens = end_pos - start_pos + k` is the span's word length. */
  def duplicateSpans(docs: DataFrame, k: Int = 5,
      minGrams: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs.select(col("doc_id"),
      posexplode(graft.functions.hashFunctions.gram_fps(col("text"), k))
        .as(Seq("pos", "h")))
    val dupFps = g.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select("h")
    val marked = g.join(dupFps, Seq("h"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      // consecutive positions share (pos - row_number): the classic
      // gaps-and-islands grouping, integer-exact
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("start_pos"), max("pos").as("end_pos"),
        count(lit(1)).as("n_grams"))
      .filter(col("n_grams") >= minGrams)
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
        col("n_grams"), (col("end_pos") - col("start_pos") + k).as("n_tokens"))
  }

  /** EXECUTE the span cut — the rewrite side of [[duplicateSpans]]
    * (dd17, pairing with it the way `Layout.compact` executes the
    * q57 plan): every document rewritten over the NORMALIZED token
    * stream the spans index (lower-cased whitespace tokens), with
    * each duplicate span's token range `[start_pos, end_pos+k-1]`
    * removed — license blocks and chrome go, the unique prose around
    * them stays.
    *
    * Scale shape: the span detector's exchanges are dd16's (narrow
    * (doc_id, pos, h) longs); spans then aggregate to ONE bounded row
    * per AFFECTED doc, so the rewrite join is affected-docs-sized on
    * one side — broadcast when that set is small, doc_id
    * co-partitioned otherwise. The cut itself is a per-row indexed
    * `filter` HOF; corpus text crosses at most the one rewrite join.
    *
    * Output: `(doc_id, n_tokens, n_removed, clean_text)` for every
    * input doc (`n_removed = 0` and untouched tokens for docs with no
    * duplicate span). */
  def stripSpans(docs: DataFrame, k: Int = 5,
      minGrams: Int = 1): DataFrame = {
    val spans = duplicateSpans(docs, k, minGrams)
      .select(col("doc_id"),
        struct(col("start_pos").as("s"),
          (col("end_pos") + lit(k - 1)).as("e")).as("sp"))
      .groupBy("doc_id")
      .agg(collect_list(col("sp")).as("spans"))
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept", filter(col("toks"), (_, i) =>
        col("spans").isNull || !exists(col("spans"), sp =>
          i >= sp.getField("s") && i <= sp.getField("e"))))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  /** 30-bit SimHash computed per-row with higher-order functions (no
    * explode, no shuffle): bit j is set when the sum over token
    * fingerprints of `±1` (by bit j of the fp) is positive. 30 bits
    * because fingerprints are mod 1e9+7 (< 2^30); bit extraction uses
    * exact power-of-two double division so the oracle SQL reproduces
    * it bit-for-bit. */
  def simhash(text: Column): Column =
    graft.functions.hashFunctions.simhash30(text)

  /** 60-bit SimHash (two independent 30-bit poly-hash votes — see
    * [[graft.functions.HashOps.simHash60]] for why 60 keeps the
    * DuckDB oracle bit-exact). */
  def simhash60(text: Column): Column =
    graft.functions.hashFunctions.simhash60(text)

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist`, shaped
    * for the 100 TB corpus (the Manku/WWW'07 pigeonhole layout):
    *
    *  - 60-bit hash, FOUR 15-bit blocks (pairs join if ANY block
    *    matches): ≤ 3 differing bits cannot touch all 4 blocks, so
    *    recall at `maxDist` ≤ 3 is pigeonhole-COMPLETE — and the key
    *    space is 4 × 2^15 = 131,072 blocks vs the 3,072 a 30-bit/3×10
    *    scheme allows, so average bucket population drops 40× at the
    *    same corpus size.
    *  - The block self-join runs over DISTINCT hash values, not
    *    documents: a pile-up of a million byte-identical documents
    *    contributes ONE row per block, so bucket size is bounded by
    *    distinct-hash diversity, never by duplication rate. Doc pairs
    *    are recovered afterwards by joining the (doc_id, sh) map onto
    *    the surviving hash pairs — output-proportional work.
    *  - Oversized-bucket guard: block-key populations (≤ 131,072
    *    rows, counted once and broadcast) above `maxBucket` are
    *    sub-split by the NEXT block's 15 bits. Near-dup hashes differ
    *    in ≤ maxDist bits total, so most survive the refinement in
    *    the same sub-bucket; the bounded recall loss under adversarial
    *    pile-ups is the price of capping the join fan-out at
    *    `maxBucket`² instead of bucket² (GuardrailsSpec pins the
    *    bound; docs/SCALING.md §SimHash has the fan-out math).
    *
    * Shuffles: one distinct over 8-byte hashes, one (block, key, sub)
    * exchange of the distinct-hash stream, one distinct over
    * surviving HASH pairs (ids re-attached after — the pair stream
    * through the exchange carries two longs, nothing else), two
    * output-side joins keyed on sh. Document bodies never move. */
  /** Blocked candidate layout for [[simhashPairs]] over a frame of
    * DISTINCT hashes (`sh`): `blocks` (bid, bkey) `bits`-bit block
    * keys per hash (default four 15-bit blocks of the 60-bit text
    * SimHash; [[hammingPairs]] reuses it with four 16-bit blocks for
    * 64-bit perceptual hashes), with the oversized-bucket guard
    * applied. Returns (sh, bid, bkey, sub); candidate pairs are
    * equi-joins on (bid, bkey, sub).
    *
    * The guard is two-stage, and the bound it gives is UNCONDITIONAL:
    *  1. block-key census (≤ 4×2^15 rows whatever the corpus size —
    *     always broadcastable); buckets above `maxBucket` get a
    *     15-bit sub-key from the NEXT block — near-dup hashes agree
    *     on most remaining bits, so genuine near-neighbours survive
    *     the refinement together;
    *  2. refined buckets that are STILL above `maxBucket` (an
    *     adversarial pile-up constant in both blocks) keep a
    *     deterministic `maxBucket`-sized prefix (row_number over sh).
    *     The window runs only on the oversized stream — empty in
    *     non-adversarial corpora — and rank is linear, never
    *     quadratic, in bucket size. Dropped rows lose only CROSS-hash
    *     candidates from that one block (the other three blocks still
    *     route them, and pigeonhole needs just one clean block);
    *     identical-hash (distance-0) pairs are recovered by the
    *     expansion join in [[simhashPairs]], never by the block join.
    *
    * Max candidate fan-out per join key is therefore `maxBucket`²
    * regardless of input: the quadratic-bucket failure mode is
    * structurally closed. */
  /** (sh, bid, bkey) block keys for a DISTINCT-hash frame — the
    * explode [[simhashBlocks]] and [[hammingBlockCensus]] share. */
  private def blockExplode(hashes: DataFrame, blocks: Int,
      bits: Int): DataFrame = {
    val mask = (1L << bits) - 1L
    hashes.select(col("sh"),
      explode(array((0 until blocks).map { b =>
        struct(lit(b).as("bid"),
          shiftright(col("sh"), b * bits).bitwiseAND(mask).as("bkey"))
      }: _*)).as("blk"))
      .select(col("sh"), col("blk.bid").as("bid"), col("blk.bkey").as("bkey"))
  }

  /** The NEXT-block sub-key used to rescue oversized buckets. */
  private def blockSubKey(blocks: Int, bits: Int): Column = {
    val mask = (1L << bits) - 1L
    (0 until blocks).foldLeft(lit(0L)) { (acc, b) =>
      when(col("bid") === b,
        shiftright(col("sh"), ((b + 1) % blocks) * bits).bitwiseAND(mask))
        .otherwise(acc)
    }
  }

  /** Census of the [[simhashBlocks]] oversized-bucket guard over an
    * explicit `(doc_id, sh)` hash frame — the guard engages SILENTLY
    * from the caller's view, so this makes its cost a visible NUMBER
    * (the [[graft.operators.Similarity.knnGraphCensus]] discipline):
    * one row per bucket ABOVE `maxBucket` (empty whenever the cap is
    * disengaged) with the bucket's distinct-hash size and
    * `rows_dropped` = hashes the deterministic prefix cap discards
    * AFTER the next-block sub-split rescue. Same plan shape as the
    * guard itself: distinct hashes, block explode, one (bid, bkey)
    * aggregation, sub-split counted only on the oversized stream. */
  def hammingBlockCensus(hashed: DataFrame, maxBucket: Int,
      blocks: Int = 4, bits: Int = 15): DataFrame = {
    val hashes = hashed.select("sh").distinct()
    val blocked = blockExplode(hashes, blocks, bits)
    val sizes = blocked.groupBy("bid", "bkey").count()
    blocked
      .join(broadcast(sizes.filter(col("count") > maxBucket)
        .withColumnRenamed("count", "bucket_size")), Seq("bid", "bkey"))
      .withColumn("sub", blockSubKey(blocks, bits))
      .groupBy("bid", "bkey", "bucket_size", "sub")
      .agg(count(lit(1)).as("sub_n"))
      .groupBy("bid", "bkey", "bucket_size")
      .agg(sum(greatest(col("sub_n") - lit(maxBucket.toLong), lit(0L)))
        .as("rows_dropped"))
      .select("bid", "bkey", "bucket_size", "rows_dropped")
  }

  private[graft] def simhashBlocks(hashes: DataFrame,
      maxBucket: Int, blocks: Int = 4, bits: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocked = blockExplode(hashes, blocks, bits)
    val sizes = blocked.groupBy("bid", "bkey").count()
    val subKey = blockSubKey(blocks, bits)
    val sized = blocked.join(broadcast(sizes), Seq("bid", "bkey"))
    val small = sized.filter(col("count") <= maxBucket)
      .withColumn("sub", lit(0L))
    val capped = sized.filter(col("count") > maxBucket)
      .withColumn("sub", subKey)
      .withColumn("rn", row_number().over(
        Window.partitionBy("bid", "bkey", "sub").orderBy("sh")))
      .filter(col("rn") <= maxBucket)
    small.select("sh", "bid", "bkey", "sub")
      .unionByName(capped.select("sh", "bid", "bkey", "sub"))
  }

  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 1 << 16): DataFrame =
    hammingPairs(docs.select(col("doc_id"), simhash60(col("text")).as("sh")),
      maxDist, maxBucket)

  /** Hamming-distance pairs over an EXPLICIT `(doc_id, sh)` hash
    * frame — [[simhashPairs]] minus the text hashing, so the SAME
    * guarded pigeonhole machinery serves any 64-bit-or-narrower
    * fingerprint: 60-bit text SimHash (dd4), 64-bit image dHash
    * (`Multimodal.imageNearDup`, m10), audio chromaprints, … The
    * pigeonhole is COMPLETE for `maxDist < blocks` (a pair within
    * maxDist must agree on at least one of `blocks` disjoint
    * `bits`-bit blocks), so with the cap disengaged the output is
    * exactly all pairs at Hamming distance ≤ maxDist.
    *
    * Scale shape as [[simhashPairs]]: block join over DISTINCT
    * hashes (identical inputs collapse before the quadratic step),
    * census-guarded sub-split + hard cap ([[simhashBlocks]]),
    * id expansion proportional to output. */
  def hammingPairs(hashed: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 1 << 16, blocks: Int = 4,
      bits: Int = 15): DataFrame = {
    require(maxDist < blocks,
      s"pigeonhole needs maxDist ($maxDist) < blocks ($blocks)")
    // hash once per doc; the (id, hash) map is read by the block join
    // (distinct side) and twice by the pair expansion
    val withHash = hashed.select(col("doc_id"), col("sh"))
      .localCheckpoint(eager = false)
    val hashes = withHash.select("sh").distinct()
    val refined = simhashBlocks(hashes, maxBucket, blocks, bits)
    val a = refined.toDF("a_sh", "bid", "bkey", "sub")
    val b = refined.toDF("b_sh", "bid", "bkey", "sub")
    // candidate pairs of HASH VALUES (a_sh < b_sh orients the pair);
    // the distinct carries 16 bytes/row — ids re-attach below
    val hashPairs = a.join(b, Seq("bid", "bkey", "sub"))
      .filter(col("a_sh") < col("b_sh"))
      .select("a_sh", "b_sh")
      .distinct()
      .withColumn("dist", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("dist") <= maxDist)
    // expand hash pairs back to doc pairs, re-orienting on doc_id
    val da = withHash.toDF("ida", "a_sh")
    val db = withHash.toDF("idb", "b_sh")
    val cross = hashPairs.join(da, "a_sh").join(db, "b_sh")
      .select(
        least(col("ida"), col("idb")).as("a_id"),
        greatest(col("ida"), col("idb")).as("b_id"),
        when(col("ida") < col("idb"), col("a_sh")).otherwise(col("b_sh")).as("a_sh"),
        when(col("ida") < col("idb"), col("b_sh")).otherwise(col("a_sh")).as("b_sh"),
        col("dist"))
    // identical-hash pairs (distance 0) never enter the block join —
    // recover them from the (id, hash) map; quadratic only in group
    // size, which is exactly the declared output size for them
    val intra = withHash.toDF("a_id", "a_sh")
      .join(withHash.toDF("b_id", "b_sh"),
        col("a_sh") === col("b_sh") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"),
        lit(0).as("dist"))
    cross.unionByName(intra)
      .select("a_id", "b_id", "a_sh", "b_sh", "dist")
  }

  /** Incremental SimHash near-dup detection: pairs BETWEEN an
    * incoming batch and a standing index — the SimHash member of the
    * incremental family ([[minhashPairsAgainst]] for shingles, dd9;
    * `Similarity.lshCosinePairsAgainst` for embeddings, dd11). Same
    * 60-bit hash, four 15-bit pigeonhole blocks, and Hamming ≤
    * `maxDist` contract as [[simhashPairs]] (a pair found here equals
    * the pair a full run over new ∪ index would find across the
    * boundary), but candidates come only from new×index collisions:
    *
    *  - the INDEX side blocks over DISTINCT hashes through
    *    [[simhashBlocks]] — census-guarded, sub-split, hard-capped;
    *  - the BATCH side probes with both the unsplit (sub = 0) and
    *    the refined key, so it matches whichever way the guard routed
    *    an index bucket — and carries no checkpoint and no Aggregate
    *    (hash collapse is `dropDuplicates`, a streaming-legal
    *    Deduplicate, exactly as in [[minhashPairsAgainst]]), so the
    *    operator runs unchanged on a readStream of arriving
    *    documents (StreamingSpec drives it live);
    *  - identical hashes across the boundary are recovered by an
    *    sh-equality join independent of any cap (distance-0 pairs
    *    never depend on the block join).
    *
    * One narrow exchange of distinct index hashes, one batch-side
    * probe join, two output-proportional id expansions; index
    * document bodies never move. */
  def simhashPairsAgainst(newDocs: DataFrame, indexDocs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16): DataFrame =
    hammingPairsAgainst(
      newDocs.select(col("doc_id"), simhash60(col("text")).as("sh")),
      indexDocs.select(col("doc_id"), simhash60(col("text")).as("sh")),
      maxDist, maxBucket)

  /** Incremental Hamming pairs over EXPLICIT `(doc_id, sh)` hash
    * frames — [[simhashPairsAgainst]] minus the text hashing, so the
    * SAME batch-probes-index machinery serves any 64-bit-or-narrower
    * fingerprint family's incremental member: 60-bit text SimHash
    * (dd19), 64-bit image dHash (`Multimodal.imageNearDupAgainst`,
    * m11), audio chromaprints, … — exactly as [[hammingPairs]]
    * generalizes [[simhashPairs]] for the full-corpus case. The NEW
    * side stays streaming-legal (no checkpoint, no Aggregate — hash
    * collapse is a `dropDuplicates` Deduplicate), so the operator
    * runs unchanged on a readStream probing a standing index. */
  def hammingPairsAgainst(newHashed: DataFrame, indexHashed: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16, blocks: Int = 4,
      bits: Int = 15): DataFrame = {
    require(maxDist < blocks,
      s"pigeonhole needs maxDist ($maxDist) < blocks ($blocks)")
    val mask = (1L << bits) - 1L
    // no checkpoint on the NEW side: it may be a live stream
    // (localCheckpoint on a streaming frame is an AnalysisException);
    // the static index keeps its plan-truncating checkpoint
    val hashN = newHashed.select(col("doc_id"), col("sh"))
    val hashI = indexHashed.select(col("doc_id"), col("sh"))
      .localCheckpoint(eager = false)
    val indexBlocks = simhashBlocks(hashI.select("sh").distinct(),
      maxBucket, blocks, bits)
      .toDF("i_sh", "bid", "bkey", "sub")
    // dropDuplicates, not distinct(): the same batch semantics, but a
    // streaming-legal Deduplicate ahead of the downstream joins when
    // the new side is a live stream (cross-batch suppression is
    // recovered by the buffered hashPairs side of the id-expansion
    // join)
    val probe = hashN.select(col("sh").as("n_sh")).dropDuplicates("n_sh")
      .select(col("n_sh"),
        explode(array((0 until blocks).map { b =>
          struct(lit(b).as("bid"),
            shiftright(col("n_sh"), b * bits).bitwiseAND(mask).as("bkey"),
            shiftright(col("n_sh"), ((b + 1) % blocks) * bits)
              .bitwiseAND(mask).as("sub0"))
        }: _*)).as("blk"))
      .select(col("n_sh"), col("blk.bid").as("bid"),
        col("blk.bkey").as("bkey"),
        explode(array(lit(0L), col("blk.sub0"))).as("sub"))
    val hashPairs = probe.join(indexBlocks, Seq("bid", "bkey", "sub"))
      .select("n_sh", "i_sh")
      .dropDuplicates("n_sh", "i_sh")
      .withColumn("dist", bit_count(col("n_sh").bitwiseXOR(col("i_sh"))))
      .filter(col("dist") <= maxDist && col("dist") > 0)
    val cross = hashPairs
      .join(hashN.toDF("new_id", "n_sh"), "n_sh")
      .join(hashI.toDF("index_id", "i_sh"), "i_sh")
      .select(col("new_id"), col("index_id"),
        col("n_sh").as("new_sh"), col("i_sh").as("index_sh"), col("dist"))
    val intra = hashN.toDF("new_id", "new_sh")
      .join(hashI.toDF("index_id", "index_sh"),
        col("new_sh") === col("index_sh"))
      .select(col("new_id"), col("index_id"), col("new_sh"),
        col("index_sh"), lit(0).as("dist"))
    cross.unionByName(intra)
      .select("new_id", "index_id", "new_sh", "index_sh", "dist")
  }

  /** Connected-component resolution of near-dup pairs: every document
    * that appears in at least one pair gets the MINIMUM doc_id of its
    * transitive duplicate cluster as `cluster_id`, and
    * `keep = (doc_id = cluster_id)` marks the one representative per
    * cluster. Pair-at-a-time dropping (drop the higher id of each
    * pair, as [[CurationPipeline.curate]] does) can drop BOTH
    * endpoints of a chain a–b–c when only (a,b) and (b,c) qualify;
    * cluster resolution keeps exactly one document per transitive
    * group.
    *
    * Distributed min-label propagation, shaped for the 100 TB case:
    *  - labels exist only for documents that appear in a pair — at
    *    corpus scale the paired set is orders of magnitude smaller
    *    than the corpus, so the iteration never touches the full
    *    table;
    *  - each round is one equi-join (neighbour labels onto edges) and
    *    one partially-aggregated min per vertex:
    *    label(v) ← min(label(v), min over neighbours u of label(u)),
    *    converging in O(cluster diameter) rounds. Near-dup clusters
    *    are shallow (copies of a common source document), so 2–4
    *    rounds typically reach the fixpoint; `maxIters` bounds
    *    adversarial chains — beyond it the standard escalation is the
    *    large-star/small-star contraction, which needs O(log n)
    *    rounds regardless of diameter;
    *  - the symmetric edge list and each round's labels are
    *    checkpointed (`localCheckpoint` — plan-truncating AND
    *    caching), so a round's plan is one join over two leaf
    *    relations instead of the whole history: plain `persist`
    *    caches data but keeps lineage, and an iterated self-join's
    *    logical plan grows ~3× per round — 12 rounds of that is a
    *    177k-node tree that OOMs the driver before any data moves.
    *    On a real cluster substitute a reliable `checkpoint()` (HDFS
    *    checkpoint dir) for executor-loss tolerance — same shape. */
  def resolveClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialized HASH-PARTITIONED BY src (guide §2.4): every round
    // joins on dst with the (usually broadcast) label table and then
    // groups by src — hash(src) survives the broadcast join, so the
    // per-round aggregation Exchange disappears; one pair-sized
    // shuffle before the loop replaces O(rounds) node-keyed ones.
    // localCheckpoint preserves outputPartitioning.
    val edges = pairs
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    // the vertex-dedup shuffle doubles as the first propagation round:
    // label₀(v) = min(v, min direct neighbour) — one round cheaper
    // than starting from label(v) = v
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(min("dst").as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .localCheckpoint()
      // labels only ever decrease, so "no label got smaller" is the
      // fixpoint test — a short-circuit scan over two cached leaves
      converged = next
        .join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") < col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    // a partially-propagated result is indistinguishable from a
    // correct one (it just has extra keep=true rows) — refuse to
    // return it silently
    if (!converged)
      throw new IllegalStateException(
        s"resolveClusters did not reach its fixpoint in $maxIters rounds: " +
          "a duplicate cluster has diameter > maxIters. Raise maxIters, " +
          "or contract the graph with large-star/small-star rounds first.")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("keep"))
  }

  /** [[resolveClusters]] by alternating large-star / small-star
    * contraction — the escalation that resolver's scaladoc points to
    * for DEEP components: min-label propagation needs O(diameter)
    * rounds (a 10k-link plagiarism chain = 10k joins), while the
    * star operators provably converge in O(log² n) rounds regardless
    * of diameter (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", MR-CC): each round re-points whole subtrees at
    * their local minimum instead of moving labels one hop.
    *
    * Same output contract as [[resolveClusters]] (doc_id, cluster_id
    * = component min, keep = is-min) — interchangeable, one oracle.
    *
    * Per round, on canonical `(hi > lo)` edges:
    *  - **large-star**: for each node u, every neighbour v > u
    *    re-attaches to `m = min(Γ(u) ∪ u)` — one symmetric groupBy
    *    for the minima, one equi-join to emit `(v, m)`;
    *  - **small-star**: each node u and its smaller neighbours all
    *    attach to u's smallest neighbour — one groupBy on `hi`, one
    *    equi-join.
    *
    * Both are plain hash-shuffle aggregations/joins on node ids (no
    * corpus payloads), each round is `localCheckpoint`ed to truncate
    * lineage exactly like [[resolveClusters]], and at the fixpoint
    * the edge set IS the star: every non-min node holds exactly one
    * edge, to its component minimum. */
  def resolveClustersStars(pairs: DataFrame, maxIters: Int = 12): DataFrame = {
    var edges = pairs
      .select(greatest(col("a_id"), col("b_id")).as("hi"),
        least(col("a_id"), col("b_id")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var iter = 0
    var edgeCount = edges.count()
    // the per-round min-label maps are node-keyed (≤ one row per
    // node): below the graph broadcast limit they ride broadcasts
    // into the reattachment joins (checkpoint leaves carry no stats,
    // so Spark would otherwise sort-merge); above it the key-equi
    // shuffle shape scales unbounded
    val small = edgeCount * 2 <= Graph.BroadcastNodeLimit
    def mside(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // v > u >= m, so (v, m) is already canonical and never a loop
      sym.join(mside(m), "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("hi").agg(min("lo").as("m"))
      val reattached = e.join(mside(m), "hi")
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
      val own = m.select(col("hi"), col("m").as("lo"))
      reattached.union(own).distinct()
    }
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // set fixpoint, cheapest test first: counts differ on most
      // rounds (a count over a checkpointed leaf is ~free), and only
      // equal-count rounds pay the two anti-joins that decide true
      // set equality
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("hi", "lo"), "left_anti").isEmpty &&
        edges.join(next, Seq("hi", "lo"), "left_anti").isEmpty
      edgeCount = nextCount
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"resolveClustersStars did not reach its fixpoint in $maxIters " +
          "rounds — raise maxIters (expected O(log^2 n) rounds).")
    edges.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .union(edges.select(col("lo").as("doc_id"), col("lo").as("cluster_id")))
      .distinct()
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }
}
