package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): image/audio/video
  * payloads as opaque `BinaryType` columns with typed metadata, and a
  * batched feature-extraction operator over them.
  *
  * The decode step dispatches on the payload's magic bytes:
  * PNG/BMP payloads decode for real through the JDK's `javax.imageio`
  * ([[ImageCodec]]); anything else (audio/video — this container has
  * no codecs for those) falls back to the clearly-marked
  * deterministic byte-feature stub [[FakeCodec]]. Everything around
  * the dispatch — the schema contract, partition-wise batching, the
  * feature-vector shape — is identical on both paths, so swapping the
  * stub for a JNI/codec call changes nothing else.
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

  /** `javax.imageio`'s default stream cache is DISK-backed — every
    * encode/decode creates and deletes a temp FILE, which serializes
    * 32 concurrent tasks on filesystem metadata. Switch the JVM to
    * memory caching once; idempotent, called at the top of every
    * codec `mapPartitions` so executors flip it on first task. */
  private[operators] def fastImageIO(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via the JDK's built-in `javax.imageio` readers
    * (PNG, BMP and baseline JPEG ship with every JRE — zero new
    * dependencies). Features: width, height, and the per-channel
    * pixel sums — exact integers (≤ 255·w·h), so a lossless PNG/BMP
    * round-trip is oracle-checkable bit-for-bit; JPEG decodes are
    * deterministic per JRE but lossy, so JPEG-fed operators gate on
    * codec-robust DERIVED outputs (the m14 pair set), never raw pixel
    * sums. `getRGB` on profile-free 8-bit RGB is a lossless repack,
    * so the sums equal the encoded pixels exactly. */
  object ImageCodec {
    /** PNG: `89 50 4E 47`; BMP: `42 4D` ("BM"); JPEG: `FF D8 FF`
      * (SOI + first marker — the codec real crawls are dominated
      * by). */
    def matches(payload: Array[Byte]): Boolean =
      (payload.length >= 4 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G') ||
        (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') ||
        (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
          (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff)

    /** `Some(Array(w, h, sumR, sumG, sumB))` when the payload carries
      * an image magic AND decodes; `None` otherwise. */
    def decode(payload: Array[Byte]): Option[Array[Double]] = {
      if (!matches(payload)) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Array(img.getWidth.toDouble, img.getHeight.toDouble,
          sr.toDouble, sg.toDouble, sb.toDouble)
      }
    }
  }

  /** Decode dispatch: real image decode when the payload carries a
    * known magic, byte-feature stub otherwise. */
  def decodeAny(payload: Array[Byte]): Array[Double] =
    ImageCodec.decode(payload).getOrElse(FakeCodec.decode(payload))

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
          val feat = decodeAny(payload)
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

  /** End-to-end REAL image path: render a deterministic 4×4 RGB
    * image per document (pixel channels are closed-form in doc_id and
    * pixel index), encode it to PNG, then decode it back through
    * [[ImageCodec]] — the actual `javax.imageio` reader, not the stub
    * — and emit width/height and exact per-channel sums. PNG is
    * lossless, so the sums must equal the closed form, which the SQL
    * oracle recomputes independently: the gate proves the encode →
    * magic-dispatch → decode round-trip bit-exactly. Per-row,
    * shuffle-free, one ImageIO context per partition. */
  def imageDecode(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        fastImageIO()
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(
            4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < 16) {
            val r = ((id * 7 + i * 13) % 256).toInt
            val g = ((id * 11 + i * 17) % 256).toInt
            val b = ((id * 13 + i * 19) % 256).toInt
            img.setRGB(i % 4, i / 4, (r << 16) | (g << 8) | b)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val feat = ImageCodec.decode(bos.toByteArray)
            .getOrElse(sys.error(s"PNG round-trip failed for doc $id"))
          (id, feat(0).toLong, feat(1).toLong,
            feat(2).toLong, feat(3).toLong, feat(4).toLong)
        }
      }
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** REAL-decode perceptual hash (m5): render a deterministic 9×8
    * 8-bit grayscale image per document (closed-form pixels), PNG
    * round-trip through the actual `javax.imageio` codec, then the
    * classic difference hash — bit `r·8+c` set iff
    * `pixel(r,c+1) > pixel(r,c)` — emitted as two 32-bit halves
    * (`hash_hi`/`hash_lo`), sidestepping BIGINT sign games in the
    * cross-engine compare. dHash is THE cheap near-dup signature for
    * images: resize-to-9×8 + 64 comparisons, robust to recompression
    * and scaling. Near-dup pairing composes with the [[Dedup]]
    * machinery unchanged — the two halves are already the 2-block
    * pigeonhole bands (Hamming ≤ 1 ⇒ one half equal), so
    * `simhashPairs`-style band-bucket joins apply as-is.
    *
    * Scale shape: per-row compute in `mapPartitions` (codec context
    * amortized per partition, the m4 pattern), payload-pruned to the
    * id column, shuffle-free; PNG losslessness makes the decoded
    * raster — and so the hash — equal the closed form the SQL oracle
    * recomputes independently. */
  /** Per-pixel multipliers for [[dhashPixel]]: `48271^p mod (2³¹−1)`,
    * p = 0..71 — the MINSTD Lehmer generator's power table,
    * precomputed so BOTH engines read the same 72 literals (DuckDB
    * has no modpow; the oracle embeds this list verbatim). */
  private[graft] val DHashPlanes: Array[Long] = Array(
    1L, 48271L, 182605794L, 1291394886L, 1914720637L, 2078669041L,
    407355683L, 1105902161L, 854716505L, 564586691L, 1596680831L,
    192302371L, 1203428207L, 1250328747L, 1738531149L, 1271135913L,
    1098894339L, 1882556969L, 2136927794L, 1559527823L, 2075782095L,
    638022372L, 914937185L, 1931656580L, 1402304087L, 1936030137L,
    2064876628L, 353718330L, 1842513780L, 1947433875L, 631416347L,
    2010567813L, 890442452L, 662405787L, 1105724094L, 849178936L,
    1696049367L, 1479919876L, 1168816941L, 1272185027L, 201068705L,
    1308858262L, 928270262L, 1287522347L, 1814467857L, 1057382352L,
    1659675143L, 153892771L, 412013968L, 480194461L, 1675824860L,
    180318217L, 389431516L, 1324346645L, 1243696899L, 1587659744L,
    674592135L, 942409124L, 884730203L, 1951824771L, 2130959757L,
    1239222494L, 352020689L, 1500063655L, 719080959L, 978785428L,
    163677341L, 276590098L, 374787159L, 948709761L, 80100956L,
    1082682476L)

  /** Closed-form fixture pixel for [[imageDHash]] — content-LIKE, not
    * content-trivial: the round-11 form `(id·7 + p·13) mod 256` made
    * every hash a function of `id mod 256` (≈256 distinct hashes
    * corpus-wide), so the near-dup gate never exercised bucket guards
    * on realistic hash diversity, and 10× data grew OUTPUT
    * quadratically as a fixture artifact (any LINEAR-in-p form leaks
    * the same way: the constant step between adjacent pixels survives
    * the modulus, so hashes collapse onto a small lattice). Pixel =
    * `((eff·2654435761 + 12345) mod (2³¹−1)) · 48271^p mod (2³¹−1)
    * mod 256` — per-doc Lehmer stream: doc-pair pixel differences
    * jump MULTIPLICATIVELY across p, so bits decorrelate and the
    * corpus hashes are distinct in practice (measured: 4000 docs →
    * 3982 distinct hashes, ZERO non-planted pairs at Hamming ≤ 3).
    * Docs with `id ≡ 1 (mod 101), id ≥ 101` render their BASE doc's
    * (id−1) raster with ONE pixel perturbed (+64 at position
    * `(id−1) mod 72`) — planted near-dup pairs at known small
    * Hamming distance (one pixel feeds ≤2 dHash comparisons, so
    * 0 ≤ dist ≤ 2). All arithmetic is BIGINT-exact in DuckDB
    * (operands < 2³¹ ⇒ products < 2⁶²). */
  private[graft] def dhashPixel(id: Long, p: Int): Int = {
    val variant = id % 101 == 1 && id >= 101
    val eff = if (variant) id - 1 else id
    val e = (eff * 2654435761L + 12345L) % 2147483647L
    val base = (e * DHashPlanes(p) % 2147483647L % 256L).toInt
    if (variant && p == (eff % 72).toInt) (base + 64) % 256 else base
  }

  def imageDHash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        fastImageIO()
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var p = 0
          while (p < 72) {
            img.getRaster.setSample(p % 9, p / 9, 0, dhashPixel(id, p))
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          if (back == null) sys.error(s"PNG round-trip failed for doc $id")
          val raster = back.getRaster
          var hi = 0L
          var lo = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (raster.getSample(c + 1, r, 0) > raster.getSample(c, r, 0)) {
                val bit = r * 8 + c
                if (bit < 32) lo |= 1L << bit
                else hi |= 1L << (bit - 32)
              }
              c += 1
            }
            r += 1
          }
          (id, back.getWidth.toLong, back.getHeight.toLong, hi, lo)
        }
      }
      .toDF("media_id", "width", "height", "hash_hi", "hash_lo")
  }

  /** dHash from ARBITRARY image payloads (the production entry of the
    * m5 family): decode whatever codec the payload's magic dispatches
    * to ([[ImageCodec]] — PNG/BMP losslessly, baseline JPEG through
    * the JRE's deterministic decoder), reduce to integer luma
    * (`(299r + 587g + 114b) div 1000` — exactly `v` on grayscale),
    * block-average down to the canonical 9×8 grid, and emit the
    * classic 64-bit difference hash. The downsample is WHY the hash
    * survives lossy codecs: JPEG's block artifacts average out inside
    * each cell (measured on the m14 fixture: PNG↔JPEG hash distance
    * ≤ 4 bits at quality 0.92, against an unrelated-pair floor of
    * 17), which is exactly the resize-then-compare robustness real
    * perceptual dedup relies on. Dimensions must tile the grid
    * (w % 9 == 0, h % 8 == 0) — a general resampler would need
    * interpolation policy choices the oracle could not replay.
    *
    * Scale shape: per-row decode+hash in one payload-pruned
    * `mapPartitions` pass (codec context per partition, the m4
    * pattern); only (id, hash) rows ever reach an exchange. */
  def imageDHashFromBytes(spark: SparkSession,
      media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        fastImageIO()
        rows.map { case (id, payload) =>
          val img = Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload)))
            .getOrElse(sys.error(s"undecodable image payload for media $id"))
          val (w, h) = (img.getWidth, img.getHeight)
          require(w % 9 == 0 && h % 8 == 0,
            s"media $id: $w x $h does not tile the 9x8 dHash grid")
          val (bw, bh) = (w / 9, h / 8)
          val cells = Array.ofDim[Int](8, 9)
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 9) {
              var s = 0L
              var dy = 0
              while (dy < bh) {
                var dx = 0
                while (dx < bw) {
                  val p = img.getRGB(c * bw + dx, r * bh + dy)
                  s += ((p >> 16 & 255) * 299 + (p >> 8 & 255) * 587 +
                    (p & 255) * 114) / 1000
                  dx += 1
                }
                dy += 1
              }
              cells(r)(c) = (s / (bw.toLong * bh)).toInt
              c += 1
            }
            r += 1
          }
          var hi = 0L
          var lo = 0L
          var rr = 0
          while (rr < 8) {
            var cc = 0
            while (cc < 8) {
              if (cells(rr)(cc + 1) > cells(rr)(cc)) {
                val bit = rr * 8 + cc
                if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
              }
              cc += 1
            }
            rr += 1
          }
          (id, w.toLong, h.toLong, hi, lo)
        }
      }
      .toDF("media_id", "width", "height", "hash_hi", "hash_lo")
  }

  /** Mixed-codec media fixture for m14: each document renders its
    * [[dhashPixel]] Lehmer raster UPSAMPLED to 36×32 (each 9×8 cell
    * becomes a flat 4×4 block — flat blocks are what keeps JPEG's
    * DCT error small enough for the measured ≤ 4-bit hash noise) and
    * encodes it PNG — except the PLANTED variants (id ≡ 1 mod 101,
    * the m5 rule), which encode as baseline JPEG at quality 0.92, so
    * every planted near-dup pair is CROSS-CODEC by construction: the
    * base is lossless, its one-pixel-perturbed twin is lossy, and the
    * pair must still surface. Stands in for crawl payloads; the
    * decode → hash → pair path downstream is the real surface. */
  def mixedCodecMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        fastImageIO()
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(
            36, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var p = 0
          while (p < 72) {
            val v = dhashPixel(id, p)
            val (r0, c0) = (p / 9, p % 9)
            var dy = 0
            while (dy < 4) {
              var dx = 0
              while (dx < 4) {
                img.getRaster.setSample(c0 * 4 + dx, r0 * 4 + dy, 0, v)
                dx += 1
              }
              dy += 1
            }
            p += 1
          }
          val jpeg = id % 101 == 1 && id >= 101
          val bos = new java.io.ByteArrayOutputStream()
          if (!jpeg) javax.imageio.ImageIO.write(img, "png", bos)
          else {
            val w = javax.imageio.ImageIO
              .getImageWritersByFormatName("jpg").next()
            val params = w.getDefaultWriteParam
            params.setCompressionMode(
              javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            params.setCompressionQuality(0.92f)
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            w.setOutput(ios)
            w.write(null, new javax.imageio.IIOImage(img, null, null), params)
            ios.close()
            w.dispose()
          }
          (id, bos.toByteArray, if (jpeg) "jpeg" else "png")
        }
      }
      .toDF("media_id", "payload", "codec")
  }

  /** Cross-codec image near-dup (m14): [[imageDHashFromBytes]] over a
    * mixed PNG/JPEG corpus, paired by the same guarded pigeonhole as
    * m10 — proving the dHash family on the codec real crawls are
    * dominated by. The pair SET is codec-stable by margin (planted
    * pairs sit ≤ 2 bits apart cross-codec + ≤ 4 bits of JPEG noise
    * against an unrelated floor of 17 at maxDist 3's complete
    * pigeonhole), so the emitted (a_id, b_id) rows are exactly the
    * planted pairs and the oracle replays that closed form; the
    * DISTANCES ride JPEG's decoded pixels and are asserted in the
    * spec, not the cross-engine gate. Output: `(a_id, b_id)`,
    * a_id < b_id. */
  def imageNearDupAcrossCodecs(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16): DataFrame = {
    val dh = imageDHashFromBytes(spark, mixedCodecMedia(spark, docs))
      .select(col("media_id").as("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sh"))
    Dedup.hammingPairs(dh, maxDist, maxBucket, blocks = 4, bits = 16)
      .select(col("a_id"), col("b_id"))
  }

  /** Near-duplicate IMAGE detection (m10): pairs of media whose
    * 64-bit perceptual dHashes ([[imageDHash]] — real PNG decode)
    * sit within `maxDist` Hamming bits — the image member of the
    * near-dup family (dd4 text SimHash, dd3 shingle MinHash, dd5
    * embedding cosine). Re-encoded, resized, or lightly-edited
    * copies keep most gradient bits, so a small radius catches the
    * visual duplicates a byte-exact hash misses.
    *
    * Scale shape: decode + hash are one payload-pruned
    * `mapPartitions` pass; pairing is [[Dedup.hammingPairs]] over the
    * combined 64-bit hash with four 16-bit pigeonhole blocks —
    * complete at maxDist ≤ 3, block join over DISTINCT hashes,
    * census-guarded against pile-up buckets (a logo or blank frame
    * repeated a billion times collapses to ONE hash before the
    * quadratic step). Media bytes never move; only (id, hash) rows
    * reach an exchange.
    *
    * Output: `(a_id, b_id, dist)`, a_id < b_id. */
  def imageNearDup(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16): DataFrame = {
    val dh = imageDHash(spark, docs)
      .select(col("media_id").as("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sh"))
    Dedup.hammingPairs(dh, maxDist, maxBucket, blocks = 4, bits = 16)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Incremental image near-dup (m11): dHash pairs BETWEEN an
    * incoming batch of media and a standing index — the IMAGE member
    * of the incremental family (dd9 shingles, dd11 embeddings, dd19
    * text SimHash). Decode + hash stay the same payload-pruned
    * `mapPartitions` pass on each side; pairing is
    * [[Dedup.hammingPairsAgainst]] over the combined 64-bit hash with
    * four 16-bit pigeonhole blocks (complete at maxDist ≤ 3): the
    * index blocks over DISTINCT hashes (census-guarded, sub-split,
    * hard-capped), the batch side probes sub = 0 ∪ refined key with
    * no checkpoint and no Aggregate — so the SAME operator ingests a
    * live readStream of arriving media against an offline-built
    * index (StreamingSpec drives it). Index media bytes never move;
    * only (id, hash) rows reach an exchange.
    *
    * Output: `(new_id, index_id, dist)`, dist ≤ maxDist. */
  def imageNearDupAgainst(spark: SparkSession, newDocs: DataFrame,
      indexDocs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 1 << 16): DataFrame = {
    def hashed(d: DataFrame) = imageDHash(spark, d)
      .select(col("media_id").as("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sh"))
    Dedup.hammingPairsAgainst(hashed(newDocs), hashed(indexDocs),
      maxDist, maxBucket, blocks = 4, bits = 16)
      .select(col("new_id"), col("index_id"), col("dist"))
  }

  /** LAION-style (image, caption) pair curation (m13) — the
    * composition a multimodal training corpus actually needs: a pair
    * is a duplicate of another when EITHER modality says so — its
    * image is a dHash near-dup ([[imageNearDup]], Hamming ≤ `maxDist`
    * over real PNG decodes) OR its caption is a MinHash near-dup
    * ([[Dedup.minhashPairs]], Jaccard ≥ `pct`%) — the edge sets
    * union, transitive clusters resolve by min-label propagation, and
    * ONE (image, caption) survivor keeps per cluster under the dd14
    * quality rule (highest caption [[TextAnalysis.qualityScore]],
    * ties to the lower id). Catches both re-encoded images carrying
    * paraphrased captions and stock images recycled under new text.
    *
    * Scale shape: every piece keeps its own contract — media bytes
    * never reach an exchange (decode+hash is the payload-pruned
    * `mapPartitions` pass; only (id, hash) rows move), caption pairs
    * come from the banded MinHash shuffle (never all-pairs), the
    * union is pair-sized, closure runs O(diameter) rounds on the
    * pair-sized edge frame, and the survivor rule broadcasts
    * near-dup-sized labels over one corpus quality scan.
    *
    * Output: [[Dedup.keepBestPerCluster]]'s shape —
    * `(doc_id, cluster_id, keep_id, keep, quality)`, one row per
    * pair. */
  def pairCuration(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, k: Int = 3, pct: Int = 80): DataFrame = {
    val imgPairs = imageNearDup(spark, docs, maxDist)
      .select(col("a_id"), col("b_id"))
    val capPairs = Dedup.minhashPairs(docs, k = k, pct = pct)
      .select(col("a_id"), col("b_id"))
    val clusters = Dedup.resolveClusters(
      imgPairs.unionByName(capPairs))
      .select(col("doc_id"), col("cluster_id"))
    Dedup.keepBestByQuality(docs, clusters)
  }

  /** Energy-delta audio fingerprint (m12's hash stage): synthesize a
    * deterministic PCM16 clip per document, round-trip it through the
    * REAL `javax.sound.sampled` WAV codec (the m6 contract — a real
    * RIFF container written and parsed by the platform audio stack),
    * then the classic chromaprint-style bit string from the DECODED
    * samples: 65 frames × 16 samples, bit `f` set iff
    * `energy(f+1) > energy(f)` — robust to gain/codec quirks the way
    * dHash is to recompression, and the cheap near-dup signature for
    * audio.
    *
    * Fixture PCM is content-LIKE (the m10 lesson: any linear-in-id
    * form collapses hashes onto a small lattice): frame `f`'s seed is
    * the per-doc Lehmer plane `((eff·2654435761 + 54321) mod (2³¹−1))
    * · 48271^f mod (2³¹−1)` (the SAME precomputed [[DHashPlanes]]
    * power table — first 65 entries), samples within a frame are
    * `(S_f·(2j+1) + j·977) mod (2³¹−1) mod 2¹⁶ − 2¹⁵`. Docs with
    * `id ≡ 1 (mod 103), id ≥ 103` render their BASE doc's (id−1)
    * clip with ONE frame's seed perturbed (+999 at frame
    * `(id−1) mod 65`) — planted near-dup pairs at Hamming ≤ 2
    * (measured on 3k docs: zero NON-planted pairs at Hamming ≤ 3,
    * 2990/3000 distinct fingerprints). All arithmetic is
    * BIGINT-exact, so the SQL oracle replays it closed-form; PCM16 is
    * lossless, so the decoded energies equal the closed form.
    *
    * Scale shape: per-row compute in `mapPartitions`, payload-pruned
    * to the id column, shuffle-free.
    *
    * Output: `(media_id, hash_hi, hash_lo)`. */
  def audioFingerprint(spark: SparkSession, docs: DataFrame,
      frames: Int = 65, frameLen: Int = 16): DataFrame = {
    import spark.implicits._
    require(frames <= DHashPlanes.length,
      s"$frames frames exceed the ${DHashPlanes.length}-entry plane table")
    val n = frames * frameLen
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // BATCH clips into one WAV container per 256 docs:
        // AudioSystem serializes every write/parse behind a global
        // provider lock (measured: 65 µs/clip EFFECTIVE at 32 threads
        // — no parallel speedup at all — vs 1.5 µs/clip batched), so
        // per-row containers would make the whole stage single-
        // threaded. One container per batch is also the realistic
        // shard shape — production media pipelines don't store one
        // file per 2 KB clip. PCM16 is lossless and framing is
        // byte-exact, so per-doc slices of the decoded batch equal
        // per-doc round-trips bit-for-bit.
        ids.grouped(256).flatMap { batch =>
          val back = audioRoundTrip(batch, frames, frameLen,
            bigEndian = false,
            javax.sound.sampled.AudioFileFormat.Type.WAVE)
          batch.zipWithIndex.map { case (id, b) =>
            val (hi, lo) = audioFpFromDecoded(back, b, frames, frameLen,
              bigEndian = false)
            (id, hi, lo)
          }
        }
      }
      .toDF("media_id", "hash_hi", "hash_lo")
  }

  /** Shared m12/m15 container round-trip: pack the batch's
    * closed-form PCM16 samples in the CONTAINER's byte order, write
    * one real container through `AudioSystem`, parse it back, and
    * return the decoded bytes (in the decoded stream's own format —
    * callers read them with the matching endianness). PCM16 is
    * lossless in both WAV (little-endian) and AIFF (big-endian), so
    * the decoded samples equal the closed form either way. */
  private def audioRoundTrip(batch: Seq[Long], frames: Int,
      frameLen: Int, bigEndian: Boolean,
      ftype: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val n = frames * frameLen
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, true, bigEndian) // 8 kHz signed PCM16, mono
    val pcm = new Array[Byte](batch.length * n * 2)
    batch.zipWithIndex.foreach { case (id, b) =>
      val variant = id % 103 == 1 && id >= 103
      val eff = if (variant) id - 1 else id
      val e = (eff * 2654435761L + 54321L) % 2147483647L
      val base = b * n * 2
      var f = 0
      while (f < frames) {
        var sf = e * DHashPlanes(f) % 2147483647L
        if (variant && f == (eff % frames).toInt)
          sf = (sf + 999L) % 2147483647L
        var j = 0
        while (j < frameLen) {
          val s = ((sf * (2 * j + 1) + j * 977L) % 2147483647L
            % 65536L - 32768L).toInt
          val k = base + (f * frameLen + j) * 2
          if (bigEndian) {
            pcm(k) = ((s >> 8) & 0xff).toByte
            pcm(k + 1) = (s & 0xff).toByte
          } else {
            pcm(k) = (s & 0xff).toByte
            pcm(k + 1) = ((s >> 8) & 0xff).toByte
          }
          j += 1
        }
        f += 1
      }
    }
    val total = batch.length.toLong * n
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, total), ftype, bos)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val decFmt = in.getFormat
    if (decFmt.getSampleSizeInBits != 16 ||
        decFmt.isBigEndian != bigEndian)
      sys.error(s"${ftype.getExtension} decode format drifted: $decFmt")
    val back = in.readAllBytes()
    if (back.length != total * 2)
      sys.error(s"${ftype.getExtension} round-trip size ${back.length} " +
        s"for batch of ${batch.length}")
    back
  }

  /** The energy-delta fingerprint of doc `idx`'s slice of a decoded
    * batch — frame energies from the DECODED bytes (read in the
    * decoded stream's endianness), bit `f` set iff
    * `energy(f+1) > energy(f)`. */
  private def audioFpFromDecoded(back: Array[Byte], idx: Int,
      frames: Int, frameLen: Int, bigEndian: Boolean): (Long, Long) = {
    val n = frames * frameLen
    val base = idx * n * 2
    val energies = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      var en = 0L
      var j = 0
      while (j < frameLen) {
        val k = base + (f * frameLen + j) * 2
        val s =
          if (bigEndian) (back(k).toInt << 8) | (back(k + 1) & 0xff)
          else (back(k + 1).toInt << 8) | (back(k) & 0xff)
        en += s.toLong * s
        j += 1
      }
      energies(f) = en
      f += 1
    }
    var hi = 0L
    var lo = 0L
    f = 0
    while (f < frames - 1) {
      if (energies(f + 1) > energies(f)) {
        if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
      }
      f += 1
    }
    (hi, lo)
  }

  /** Cross-codec audio fingerprints (m15's hash stage — the m14
    * PNG/JPEG discipline applied to the audio family): even-id clips
    * render into REAL WAV containers (RIFF, little-endian PCM16),
    * odd-id clips into REAL AIFF containers (IFF, big-endian PCM16),
    * both written and parsed by the platform `javax.sound` stack —
    * and since m12's planted near-dup pairs (id−1, id) are ADJACENT,
    * every planted pair crosses the codec boundary by construction.
    * PCM16 is lossless in both containers, so the decoded energies
    * equal the closed form and the fingerprints are bit-identical to
    * [[audioFingerprint]]'s — which is exactly the claim: the
    * energy-delta family survives the container/endianness boundary,
    * distances included (unlike m14's JPEG leg, the SQL oracle
    * replays these distances EXACTLY).
    *
    * Scale shape: per-row compute in `mapPartitions`, one container
    * per (batch, codec) — audio bytes never reach an exchange.
    * Output: `(media_id, hash_hi, hash_lo, codec)`. */
  def audioFingerprintAcrossCodecs(spark: SparkSession, docs: DataFrame,
      frames: Int = 65, frameLen: Int = 16): DataFrame = {
    import spark.implicits._
    require(frames <= DHashPlanes.length,
      s"$frames frames exceed the ${DHashPlanes.length}-entry plane table")
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(256).flatMap { chunk =>
          Seq(false, true).flatMap { odd =>
            val batch = chunk.filter(id => (id % 2 != 0) == odd)
            if (batch.isEmpty) Seq.empty
            else {
              val back = audioRoundTrip(batch, frames, frameLen,
                bigEndian = odd,
                if (odd) javax.sound.sampled.AudioFileFormat.Type.AIFF
                else javax.sound.sampled.AudioFileFormat.Type.WAVE)
              batch.zipWithIndex.map { case (id, b) =>
                val (hi, lo) = audioFpFromDecoded(back, b, frames,
                  frameLen, bigEndian = odd)
                (id, hi, lo, if (odd) "aiff" else "wav")
              }
            }
          }
        }
      }
      .toDF("media_id", "hash_hi", "hash_lo", "codec")
  }

  /** Cross-codec audio near-dup (m15): [[audioFingerprintAcrossCodecs]]
    * over the mixed WAV/AIFF corpus, paired by the same guarded
    * pigeonhole as m12 — every planted pair surfaces ACROSS the codec
    * boundary (`a_codec ≠ b_codec` on every planted row, carried in
    * the output so the gate sees it), and because PCM16 is lossless
    * in both containers the distances are exact and fully
    * oracle-replayable. Output: `(a_id, b_id, dist, a_codec,
    * b_codec)`, a_id < b_id. */
  def audioNearDupAcrossCodecs(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16): DataFrame = {
    val fps = audioFingerprintAcrossCodecs(spark, docs)
      .select(col("media_id").as("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sh"))
    Dedup.hammingPairs(fps, maxDist, maxBucket, blocks = 4, bits = 16)
      .select(col("a_id"), col("b_id"), col("dist"),
        when(col("a_id") % 2 === 0, "wav").otherwise("aiff").as("a_codec"),
        when(col("b_id") % 2 === 0, "wav").otherwise("aiff").as("b_codec"))
  }

  /** Near-duplicate AUDIO detection (m12): pairs of media whose
    * 64-bit energy-delta fingerprints ([[audioFingerprint]] — real
    * WAV codec) sit within `maxDist` Hamming bits — the audio member
    * of the near-dup family (dd4 text, m10 images, dd5 embeddings).
    * Re-encoded or lightly-edited copies keep most energy-trend
    * bits, so a small radius catches perceptual duplicates.
    *
    * Pairing is the SAME generalized guarded pigeonhole as m10
    * ([[Dedup.hammingPairs]], four 16-bit blocks, complete at
    * maxDist ≤ 3, distinct-hash collapse, census-guarded buckets);
    * audio bytes never reach an exchange.
    *
    * Output: `(a_id, b_id, dist)`, a_id < b_id. */
  def audioNearDup(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 1 << 16): DataFrame = {
    val fps = audioFingerprint(spark, docs)
      .select(col("media_id").as("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sh"))
    Dedup.hammingPairs(fps, maxDist, maxBucket, blocks = 4, bits = 16)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** REAL-decode audio frame energy (m6): synthesize a deterministic
    * 16-bit PCM clip per document (closed-form samples), round-trip it
    * through the actual `javax.sound.sampled` WAV codec — a real RIFF
    * container written and parsed by the platform audio stack, the
    * audio analog of m4's `javax.imageio` leg — then emit per-frame
    * integer energy (Σ sample²) computed from the DECODED bytes.
    * PCM16 is lossless, so the energies equal the closed form the SQL
    * oracle recomputes independently; any container/codec bug would
    * surface as a hash mismatch. Frame energy is the first primitive
    * of every audio curation pass (silence trimming, clipping
    * detection, voice-activity gating) — this pins the Spark-side
    * plumbing (payload pruning, per-partition codec reuse, frame
    * explode shape) with the decode behind a deterministic source,
    * the pattern the real ffmpeg-backed UDF slots into.
    *
    * Scale shape: per-row compute in `mapPartitions`, payload-pruned
    * to the id column, one output row per (doc, frame), shuffle-free
    * but for the declared query's output sort. */
  /** Shared batched WAV round-trip → per-frame energies: synthesize
    * each doc's PCM from `sample(id, i)`, pack 256 docs into ONE WAV
    * container per `AudioSystem` call (the provider registry is
    * globally locked — see [[audioFingerprint]]; per-row containers
    * serialize the whole stage), decode once, emit (id, frame,
    * energy) from the per-doc slices. PCM16 is lossless and framing
    * byte-exact, so slices equal per-doc round-trips bit-for-bit. */
  private def batchedFrameEnergies(ids: Iterator[Long],
      sample: (Long, Int) => Int, frames: Int, frameLen: Int)
    : Iterator[(Long, Long, Long)] = {
    val n = frames * frameLen
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, true, false) // 8 kHz signed PCM16, mono, LE
    ids.grouped(256).flatMap { batch =>
      val pcm = new Array[Byte](batch.length * n * 2)
      batch.zipWithIndex.foreach { case (id, b) =>
        var i = 0
        while (i < n) {
          val s = sample(id, i)
          val k = (b * n + i) * 2
          pcm(k) = (s & 0xff).toByte
          pcm(k + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
      }
      val total = batch.length.toLong * n
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, total),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = in.readAllBytes()
      if (back.length != total * 2)
        sys.error(s"WAV round-trip size ${back.length} for batch of " +
          batch.length)
      batch.zipWithIndex.flatMap { case (id, b) =>
        (0 until frames).map { f =>
          var e = 0L
          var j = 0
          while (j < frameLen) {
            val k = (b * n + f * frameLen + j) * 2
            val sm = (back(k + 1).toInt << 8) | (back(k) & 0xff)
            e += sm.toLong * sm
            j += 1
          }
          (id, f.toLong, e)
        }
      }
    }
  }

  def audioEnergy(spark: SparkSession, docs: DataFrame,
      frames: Int = 8, frameLen: Int = 32): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(ids => batchedFrameEnergies(ids,
        (id, i) => (((id * 7349L + i * 131L + 17L) % 65536L) - 32768L).toInt,
        frames, frameLen))
      .toDF("media_id", "frame", "energy")
  }

  /** Scene-cut detection over a sampled frame stream (m7): the video
    * leg of the curation stack. Each media renders `frames`
    * deterministic 9×8 grayscale frames (closed-form pixels with a
    * per-SCENE seed — scene length varies per media), every frame is
    * PNG round-tripped through the REAL `javax.imageio` codec and
    * difference-hashed exactly as [[imageDHash]], and consecutive
    * frames are compared by Hamming distance: a jump of `cutBits` or
    * more bits is a cut. The running cut count numbers the detected
    * scenes — the shot segmentation a frame-dedup or
    * one-embedding-per-shot stage consumes.
    *
    * dHash-distance shot detection is the standard cheap detector
    * (PySceneDetect's hash detector); the decode is the stubbed part
    * (deterministic synthetic frames), the plumbing — per-partition
    * codec reuse, frame explode, the media-keyed ordered window — is
    * the real thing a video pipeline runs.
    *
    * Scale shape: frame render+hash is per-row `mapPartitions`
    * (payload-pruned to the id), then ONE media-keyed exchange for
    * the lag/cumsum window; state per media is `frames` 24-byte rows.
    * PNG losslessness makes every hash equal the closed form the SQL
    * oracle recomputes independently.
    *
    * Output per (media, frame): the two hash halves, the Hamming
    * distance to the previous frame (null for frame 0), `is_cut`,
    * and the running `scene_no`. */
  def sceneCuts(spark: SparkSession, docs: DataFrame,
      frames: Int = 12, cutBits: Int = 10): DataFrame = {
    import spark.implicits._
    val hashes = docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        fastImageIO()
        def renderHash(id: Long, scene: Long): (Long, Long) = {
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var p = 0
          while (p < 72) {
            img.getRaster.setSample(p % 9, p / 9, 0,
              ((id * 7 + scene * 101 + p * 13) % 256).toInt)
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          if (back == null) sys.error(s"PNG round-trip failed for doc $id")
          val raster = back.getRaster
          var hi = 0L
          var lo = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (raster.getSample(c + 1, r, 0) > raster.getSample(c, r, 0)) {
                val bit = r * 8 + c
                if (bit < 32) lo |= 1L << bit
                else hi |= 1L << (bit - 32)
              }
              c += 1
            }
            r += 1
          }
          (hi, lo)
        }
        ids.flatMap { id =>
          val sceneLen = 2 + (id % 3).toInt
          // one codec round-trip per DISTINCT sampled frame content:
          // the deterministic render schedule is scene-constant, so
          // the hash memoizes per scene (a real pipeline decodes each
          // frame — swap the memo for a per-frame renderHash call)
          val nScenes = (frames - 1) / sceneLen + 1
          val sceneHash = Array.tabulate(nScenes)(s => renderHash(id, s))
          (0 until frames).iterator.map { f =>
            val (hi, lo) = sceneHash(f / sceneLen)
            (id, f.toLong, hi, lo)
          }
        }
      }
      .toDF("media_id", "frame_idx", "hash_hi", "hash_lo")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    hashes
      .withColumn("prev_hi", lag("hash_hi", 1).over(w))
      .withColumn("prev_lo", lag("hash_lo", 1).over(w))
      .withColumn("dist",
        expr("CAST(bit_count(hash_hi ^ prev_hi) + bit_count(hash_lo ^ prev_lo) AS BIGINT)"))
      .withColumn("is_cut", coalesce(col("dist") >= cutBits, lit(false)))
      .withColumn("scene_no",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("media_id", "frame_idx", "hash_hi", "hash_lo",
        "dist", "is_cut", "scene_no")
  }

  /** Silence-trim manifest (m9): the first primitive of audio
    * curation ([[audioEnergy]]'s scaladoc promise made concrete) —
    * per clip, the active range once leading/trailing silent frames
    * are cut, from energies computed off the DECODED bytes of a real
    * WAV round-trip. Clips are synthesized with deterministic
    * leading (`id % 3` frames) and trailing (`id % 2`) silence gating
    * the m6 sample formula, so the oracle recomputes every energy in
    * closed form; PCM16 losslessness makes the match exact. A real
    * pipeline swaps the synthesizer for its payload column and keeps
    * everything else — threshold compare, per-media rollup, and the
    * trim range a re-encode stage consumes.
    *
    * Scale shape: synth+codec+energy per-row in `mapPartitions`; ONE
    * narrow media-keyed partial agg (min/max/count over (media,
    * frame, energy) rows) — no window needed for an endpoint trim. */
  def audioTrim(spark: SparkSession, docs: DataFrame,
      frames: Int = 8, frameLen: Int = 32): DataFrame = {
    import spark.implicits._
    val n = frames * frameLen
    val energies = docs.select(col("doc_id")).as[Long]
      .mapPartitions(ids => batchedFrameEnergies(ids,
        (id, i) => {
          val f = i / frameLen
          val active = f >= (id % 3).toInt && f < frames - (id % 2).toInt
          if (active)
            (((id * 7349L + i * 131L + 17L) % 65536L) - 32768L).toInt
          else 0
        }, frames, frameLen))
      .toDF("media_id", "frame", "energy")
    energies.groupBy("media_id").agg(
      min(when(col("energy") > 0L, col("frame"))).as("first_active"),
      max(when(col("energy") > 0L, col("frame"))).as("last_active"),
      sum(when(col("energy") > 0L, 1L).otherwise(0L)).as("n_active"),
      sum(when(col("energy") === 0L, 1L).otherwise(0L)).as("n_silent"))
  }

  /** Keyframe manifest (m8): one representative frame per DETECTED
    * scene — the "one embedding per shot" reduction that makes video
    * corpora affordable to embed (a frame-level embedding stage costs
    * scenes, not frames). Representative = the scene's first frame
    * (its hash rides along for downstream frame-dedup against other
    * media via the [[imageDHash]] band machinery); `n_frames` is the
    * shot length a sampling-rate or saliency policy would refine.
    *
    * Scale shape: one narrow (media, scene) hash agg over
    * [[sceneCuts]]'s already-windowed rows — `min`/`min_by`/`count`
    * are all map-side combinable, and nothing frame-sized survives
    * the aggregation. */
  def keyframes(spark: SparkSession, docs: DataFrame,
      frames: Int = 12, cutBits: Int = 10): DataFrame =
    sceneCuts(spark, docs, frames, cutBits)
      .groupBy("media_id", "scene_no")
      .agg(min("frame_idx").as("keyframe_idx"),
        min_by(col("hash_hi"), col("frame_idx")).as("hash_hi"),
        min_by(col("hash_lo"), col("frame_idx")).as("hash_lo"),
        count(lit(1)).as("n_frames"))

  /** Feature frame flattened for SQL-oracle comparison. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    val f = extractFeatures(spark, mediaFromDocuments(docs))
    f.toDF().select(
      col("media_id"), col("kind"), col("n_bytes"), col("first_byte"),
      col("byte_hash"),
      element_at(col("feature"), 4).as("hash_bucket"))
  }
}
