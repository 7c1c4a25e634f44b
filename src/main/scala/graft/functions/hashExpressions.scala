package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy pipeline operators.
  *
  * The same math exists as `functions._` higher-order compositions
  * (see [[graft.operators.TextAnalysis]]), but HOFs evaluate
  * interpreted per element; these expressions do the whole document in
  * one tight JVM loop (and [[PolyHash]] participates in whole-stage
  * codegen), a >10× win on the dedup path. Semantics are identical —
  * the DuckDB oracle replicas of the HOF versions still match.
  */
object HashOps {
  final val Mod = 1000000007L
  final val Mod2 = 1000000009L

  /** Rolling polynomial hash over code points — must stay in lockstep
    * with the `ord`-based SQL oracle (`PipelineQueries.sqlFp`). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Lower-cased whitespace tokens (twin of `TextAnalysis.tokens`). */
  def tokenize(s: UTF8String): Array[String] =
    s.toString.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Distinct word-k-shingle polynomial fingerprints (twin of
    * `Dedup.shingles`): [[gramFps]] deduplicated in first-occurrence
    * order — ONE rolling-hash loop to keep in lockstep with the SQL
    * oracle (`PipelineQueries.sqlFp`), not two copies. */
  def shingleFps(s: UTF8String, k: Int): Array[Long] = {
    val grams = gramFps(s, k)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < grams.length) { seen.add(grams(i)); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    out
  }

  /** ALL word-k-gram fingerprints in document order — the
    * NON-distinct twin of [[shingleFps]]. Repetition statistics
    * (top-gram fraction, duplicate-gram fraction) need gram
    * multiplicities, which the dedup path's distinct set erases.
    *
    * Convention (shared with [[shingleFps]] and every SQL twin via
    * `greatest(len-k,0)+1`): a document with fewer than k tokens —
    * including zero — yields exactly ONE gram covering whatever is
    * there (fingerprint 0 when empty). Empty docs therefore read as
    * 100% repetitive in t08; run them through the quality/min-token
    * filter first, as the curation pipeline does. */
  def gramFps(s: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(s)
    val n = toks.length
    val last = math.max(n - k, 0)
    val out = new Array[Long](last + 1)
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      var h = 0L
      var j = i
      while (j < end) {
        if (j > i) h = (h * 31 + ' '.toInt) % Mod
        val w = toks(j)
        var c = 0
        while (c < w.length) {
          val cp = w.codePointAt(c)
          h = (h * 31 + cp) % Mod
          c += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** 30-bit SimHash over token fingerprints (twin of
    * `Dedup.simhash`). */
  def simHash(s: UTF8String): Long = {
    val toks = tokenize(s)
    val counts = new Array[Long](30)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var h = 0L
      var c = 0
      while (c < w.length) {
        val cp = w.codePointAt(c)
        h = (h * 31 + cp) % Mod
        c += Character.charCount(cp)
      }
      var j = 0
      while (j < 30) {
        counts(j) += (((h >>> j) & 1L) * 2L - 1L)
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 30) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 60-bit SimHash over token fingerprints (twin of
    * `Dedup.simhash60`): bits 0..29 vote on the base-31 mod-1e9+7
    * poly-hash (identical to [[simHash]]'s 30 bits), bits 30..59 on
    * an independent base-131 mod-1e9+9 poly-hash of the same token.
    * 60 bits, not 64, because each half must be < 2^30 so the DuckDB
    * oracle's `floor(fp / 2^j) % 2` bit extraction stays exact in
    * doubles — the price of cross-engine bit-for-bit replayability.
    * Four 15-bit blocks of a 60-bit hash make Hamming distance ≤ 3
    * pigeonhole-COMPLETE (3 differing bits cannot touch all 4
    * blocks), vs the 30-bit/3-block scheme which missed distance-3
    * pairs whose diffs landed in three distinct blocks. */
  def simHash60(s: UTF8String): Long = {
    val toks = tokenize(s)
    val counts = new Array[Long](60)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var h1 = 0L
      var h2 = 0L
      var c = 0
      while (c < w.length) {
        val cp = w.codePointAt(c)
        h1 = (h1 * 31 + cp) % Mod
        h2 = (h2 * 131 + cp) % Mod2
        c += Character.charCount(cp)
      }
      var j = 0
      while (j < 30) {
        counts(j) += (((h1 >>> j) & 1L) * 2L - 1L)
        counts(j + 30) += (((h2 >>> j) & 1L) * 2L - 1L)
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Johnson–Lindenstrauss projection of a float vector onto
    * `outDims` sparse Achlioptas planes (twin of the HOF chain in
    * `VectorStats.jlProject` — one tight JVM loop instead of
    * outDims interpreted fold closures, ~10× on the ve10 hot path).
    * BIT-EXACT contract with the oracle: the inner sum is the same
    * sequential `acc + v` fold with v ∈ {+x, −x, +0.0} — the
    * `acc + 0.0` on skipped components is kept because it normalizes
    * a −0.0 accumulator to +0.0 exactly like the HOF/SQL fold does —
    * and the scale multiply happens once after the fold.
    *
    * The per-(i, j) sign comes from the quadratic residue mix
    * `h = (i·1000003 + j + 715827883) mod p; m = (h² + h) mod p mod 6`
    * with p = 1e9+7 (m = 0 → +1, 1 → −1, else 0). A LINEAR mix like
    * `(i·a + j·b) mod 6` is NOT acceptable here: any (a, b) makes
    * the matrix periodic with period lcm ≤ 6 in each index (output
    * columns repeat, effective rank ≤ 6), silently voiding the JL
    * distance guarantee. The quadratic term kills the residue
    * structure — but ONLY past the modulus: h(h+1) is always even,
    * so while h² + h < p the unreduced value makes m ∈ {0, 2, 4} and
    * the −1 sign is unreachable (the round-11 flaw: for row i = 0,
    * h = j stayed tiny and dim 0 biased every output coordinate
    * positive). The large odd offset pushes every (i, j) into the
    * reduced regime, where parity mixes. GuardrailsSpec pins
    * pairwise-distinct columns, ~1/3 density AND a balanced row-0
    * sign split on the 64→16 default. Both mod operands are
    * non-negative and pre-reduced, so h² ≤ p² < 2⁶³ — the mix is
    * overflow-free for any realistic dimensionality. */
  def jlSign(i: Int, j: Int): Int = {
    val h = (i.toLong * 1000003L + j.toLong + 715827883L) % 1000000007L
    ((h * h + h) % 1000000007L % 6L).toInt
  }

  def jlProject(a: ArrayData, outDims: Int): GenericArrayData = {
    val arr = a.toFloatArray()
    val n = arr.length
    val scale = java.lang.Math.sqrt(3.0 / outDims)
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val m = jlSign(i, j)
        if (m == 0) acc += arr(i).toDouble
        else if (m == 1) acc += -arr(i).toDouble
        else acc += 0.0
        i += 1
      }
      out(j) = acc * scale
      j += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over shingle fps with the affine permutations
    * `(fp*(2i+1) + i*12345 + 1) mod M` (twin of
    * `Dedup.minhashSignature`). */
  /** Left-fold dot product in double — MUST stay a sequential
    * `acc + x_i*y_i` loop (no pairwise/vectorized reassociation) to
    * remain bit-identical with the HOF and SQL fold twins. */
  /** Intersection of two SORTED, duplicate-free long arrays by
    * two-pointer merge — O(|a|+|b|) with zero per-row allocation
    * beyond the result (vs the hash set `array_intersect` builds per
    * row); the triangle-counting hot path. */
  def sortedIntersect(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  def dotFold(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Trigram-profile language ID tables — languages in ascending
    * order; ties in hit count resolve to the first (alphabetically
    * smallest) language, matching the HOF/SQL twins' rank encoding. */
  private val TrigramLangs: Array[UTF8String] =
    Array("de", "en", "es", "fr", "zh").map(UTF8String.fromString)
  private val TrigramProfiles: Array[Array[String]] = Array(
    Array("der", "ein", "ich", "sch", "und", "en ", " ge"),
    Array("the", "ing", "and", "ion", "ent", "er ", " th"),
    Array("que", "ión", "ent", "ar ", " de", "la ", "os "),
    Array("les", "ent", "ion", "de ", " le", "es ", "une"),
    Array("shi", "zho", "ong", "ang", "ian", "eng", "uan"))

  /** Character-trigram language ID in one pass over the lowercased
    * string (twin of `TextAnalysis.langIdTrigramHof` and the DuckDB
    * oracle). A profile trigram "hits" iff it occurs as 3 consecutive
    * characters of `lower(text)` — exactly membership in the
    * document's distinct-trigram set, because profiles are all length
    * 3 (documents shorter than 3 chars produce only sub-3-length
    * grams, which `contains` likewise never matches). Uses
    * `UTF8String.toLowerCase` so case mapping is identical to the
    * `lower()` the HOF twin applies. */
  def trigramLangId(s: UTF8String): UTF8String = {
    val t = s.toLowerCase.toString
    var best = 0
    var bestHits = -1
    var li = 0
    while (li < TrigramProfiles.length) {
      val prof = TrigramProfiles(li)
      var hits = 0
      var pi = 0
      while (pi < prof.length) {
        if (t.contains(prof(pi))) hits += 1
        pi += 1
      }
      if (hits > bestHits) { bestHits = hits; best = li }
      li += 1
    }
    TrigramLangs(best)
  }

  /** Feature-hashed bag of words: token fingerprints bucketed mod
    * `dim`, counts per bucket (the fastText-style featurizer for
    * cheap quality classifiers). One tokenize + hash loop per
    * document; twin of the `sqlFp(token) % dim` SQL oracle. */
  def hashedBow(s: UTF8String, dim: Int): Array[Long] = {
    val toks = tokenize(s)
    val out = new Array[Long](dim)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var h = 0L
      var c = 0
      while (c < w.length) {
        val cp = w.codePointAt(c)
        h = (h * 31 + cp) % Mod
        c += Character.charCount(cp)
      }
      out((h % dim).toInt) += 1
      t += 1
    }
    out
  }

  /** Run-length `(value, count)` pairs over a long array: sort a
    * copy, count runs in one pass — O(n log n) per row with tight
    * primitive loops, replacing both the O(distinct × n)
    * filter-per-distinct-term HOF and the staged sort/bounds HOF
    * chain (whose inferred pushdown filters re-evaluated the chain
    * per element). Output rows are `(value, count)` structs in sorted
    * value order (callers explode; order is immaterial). Null
    * elements in the input are SKIPPED (they carry no term), keeping
    * the declared `containsNull = false` output honest for any
    * upstream tokenizer that emits nullable arrays. */
  def runLengthLong(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val a = new Array[Long](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { a(n) = arr.getLong(i); n += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, n)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      out += InternalRow(a(i), (j - i).toLong)
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  /** [[runLengthLong]] for string arrays (UTF8String binary order —
    * only run EQUALITY matters, the order never surfaces). Null
    * elements are skipped, same contract as the long variant. */
  def runLengthString(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val a = new Array[UTF8String](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { a(n) = arr.getUTF8String(i); n += 1 }
      i += 1
    }
    java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]], 0, n)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j).equals(a(i))) j += 1
      out += InternalRow(a(i), (j - i).toLong)
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  def minhash(fps: Array[Long], numHashes: Int): Array[Long] = {
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var m = Long.MaxValue
      var j = 0
      while (j < fps.length) {
        val h = (fps(j) * (2L * i + 1) + i * 12345L + 1) % Mod
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    out
  }
}

/** `poly_hash(str)` — codegen-friendly rolling hash. */
case class PolyHash(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
}

/** `shingle_fps(str, k)` — distinct word-k-shingle fingerprints. */
case class ShingleFps(child: Expression, k: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashOps.shingleFps(v.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.shingleFps($c, $k))")
  override protected def withNewChildInternal(c: Expression): ShingleFps = copy(child = c)
}

/** `gram_fps(str, k)` — all word-k-gram fingerprints, in order
  * (multiplicities preserved; the repetition-score hot path). */
case class GramFps(child: Expression, k: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashOps.gramFps(v.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.gramFps($c, $k))")
  override protected def withNewChildInternal(c: Expression): GramFps = copy(child = c)
}

/** `simhash30(str)` — 30-bit SimHash of the document's tokens. */
case class SimHash30(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.simHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simHash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash30 = copy(c)
}

/** `simhash60(str)` — 60-bit SimHash of the document's tokens (two
  * independent 30-bit poly-hash votes; see [[HashOps.simHash60]]). */
case class SimHash60(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.simHash60(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simHash60($c)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(c)
}

/** `jl_project(vec, outDims)` — sparse-Achlioptas JL projection of a
  * float vector (see [[HashOps.jlProject]]). */
case class JlProject(child: Expression, outDims: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashOps.jlProject(v.asInstanceOf[ArrayData], outDims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashOps.jlProject($c, $outDims)")
  override protected def withNewChildInternal(c: Expression): JlProject =
    copy(child = c)
}

/** `trigram_lang_id(str)` — codegen'd character-trigram language ID.
  * Replaces an interpreted HOF chain (per-char split + per-trigram
  * array materialization) that cost ~15 ms/document with one JVM
  * substring scan per profile — the t07 hot path. */
case class TrigramLangId(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    HashOps.trigramLangId(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.trigramLangId($c)")
  override protected def withNewChildInternal(c: Expression): TrigramLangId = copy(c)
}

/** `hashed_bow(str, dim)` — codegen'd feature-hashed token counts. */
case class HashedBow(child: Expression, dim: Int)
  extends UnaryExpression {
  require(dim > 0, s"hashed_bow needs dim > 0, got $dim")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashOps.hashedBow(v.asInstanceOf[UTF8String], dim))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.hashedBow($c, $dim))")
  override protected def withNewChildInternal(c: Expression): HashedBow = copy(child = c)
}

/** `minhash_sig(fps, n)` — MinHash signature of a fingerprint array. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(HashOps.minhash(arr, numHashes))
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.minhash($c.toLongArray(), $numHashes))")
}

/** `vec_dot(a, b)` — fixed-order dot product of two float arrays,
  * accumulated in double (left fold, same order as the HOF/SQL
  * twins — bit-exact against the DuckDB oracle). */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    HashOps.dotFold(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashOps.dotFold($a.toFloatArray(), $b.toFloatArray())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `sorted_long_intersect(a, b)` — intersection of two sorted
  * duplicate-free long arrays, two-pointer merge in codegen. */
case class SortedLongIntersect(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(HashOps.sortedIntersect(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray()))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.sortedIntersect(" +
        s"$a.toLongArray(), $b.toLongArray()))")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersect = copy(left = l, right = r)
}

/** Column-level API + SQL registration. */
/** `run_length_longs(arr)` — `(fp, tf)` term-frequency pairs from a
  * fingerprint array in one sorted pass (see
  * [[HashOps.runLengthLong]]); the BM25 standing-index tf step. */
case class RunLengthLongs(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashOps.runLengthLong(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.runLengthLong($c)")
  override protected def withNewChildInternal(c: Expression): RunLengthLongs =
    copy(c)
}

/** `run_length_strings(arr)` — `(term, tf)` pairs from a token array
  * in one sorted pass; the standing TF-IDF tagger's tf step. */
case class RunLengthStrings(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashOps.runLengthString(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.runLengthString($c)")
  override protected def withNewChildInternal(c: Expression): RunLengthStrings =
    copy(c)
}

object hashFunctions {
  import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
  def poly_hash(c: Column): Column = toCol(PolyHash(toExpr(c)))
  def shingle_fps(c: Column, k: Int): Column = toCol(ShingleFps(toExpr(c), k))
  def gram_fps(c: Column, k: Int): Column = toCol(GramFps(toExpr(c), k))
  def simhash30(c: Column): Column = toCol(SimHash30(toExpr(c)))
  def simhash60(c: Column): Column = toCol(SimHash60(toExpr(c)))
  def jl_project(c: Column, outDims: Int): Column =
    toCol(JlProject(toExpr(c), outDims))
  def trigram_lang_id(c: Column): Column = toCol(TrigramLangId(toExpr(c)))
  def minhash_sig(c: Column, n: Int): Column = toCol(MinHashSig(toExpr(c), n))
  def hashed_bow(c: Column, dim: Int): Column = toCol(HashedBow(toExpr(c), dim))
  def vec_dot(a: Column, b: Column): Column = toCol(VecDot(toExpr(a), toExpr(b)))
  def sorted_long_intersect(a: Column, b: Column): Column =
    toCol(SortedLongIntersect(toExpr(a), toExpr(b)))
  def run_length_longs(c: Column): Column = toCol(RunLengthLongs(toExpr(c)))
  def run_length_strings(c: Column): Column =
    toCol(RunLengthStrings(toExpr(c)))

  /** Register `poly_hash`/`simhash30`/`vec_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "poly_hash", exprs => PolyHash(exprs.head))
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "simhash30", exprs => SimHash30(exprs.head))
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "simhash60", exprs => SimHash60(exprs.head))
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "trigram_lang_id", exprs => TrigramLangId(exprs.head))
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)))
    org.apache.spark.sql.GraftBridge.registerFunction(spark,
      "sorted_long_intersect",
      exprs => SortedLongIntersect(exprs(0), exprs(1)))
  }
}
