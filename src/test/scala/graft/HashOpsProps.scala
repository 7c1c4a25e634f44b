package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashOps

/** ScalaCheck properties for the pure-JVM hash kernels — the
  * invariants every engine twin (HOF, SQL oracle) relies on, checked
  * over generated inputs rather than the fixture corpus. */
object HashOpsProps extends Properties("HashOps") {
  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private def u(s: String) = UTF8String.fromString(s)

  property("polyHash equals the BigInt fold reference") =
    forAll(text) { s =>
      val ref = s.codePoints().toArray.foldLeft(BigInt(0)) { (a, cp) =>
        (a * 31 + cp) % HashOps.Mod
      }
      HashOps.polyHash(u(s)) == ref.toLong
    }

  property("polyHash stays in [0, Mod)") = forAll(text) { s =>
    val h = HashOps.polyHash(u(s))
    h >= 0L && h < HashOps.Mod
  }

  property("gramFps emits max(n-k,0)+1 grams") =
    forAll(text, Gen.choose(1, 5)) { (s, k) =>
      val n = HashOps.tokenize(u(s)).length
      HashOps.gramFps(u(s), k).length == math.max(n - k, 0) + 1
    }

  property("shingleFps is gramFps deduplicated, order preserved") =
    forAll(text, Gen.choose(1, 5)) { (s, k) =>
      HashOps.shingleFps(u(s), k).toSeq ==
        HashOps.gramFps(u(s), k).toSeq.distinct
    }

  property("simHash uses only 30 bits") = forAll(text) { s =>
    val h = HashOps.simHash(u(s))
    h >= 0L && h < (1L << 30)
  }

  property("simHash60 uses 60 bits; low 30 equal simHash") = forAll(text) { s =>
    val h60 = HashOps.simHash60(u(s))
    h60 >= 0L && h60 < (1L << 60) &&
      (h60 & ((1L << 30) - 1)) == HashOps.simHash(u(s))
  }

  property("4x15-bit blocks are pigeonhole-complete at Hamming <= 3") =
    forAll(Gen.choose(0L, (1L << 60) - 1),
      Gen.listOfN(3, Gen.choose(0, 59))) { (h, flips) =>
      // flip UP TO 3 (possibly repeated → fewer) bits: some block of
      // the pair must still match — the dd4 candidate-generation
      // completeness guarantee (3 diff bits cannot touch 4 blocks)
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      def block(x: Long, b: Int): Long = (x >>> (b * 15)) & 32767L
      (0 until 4).exists(b => block(h, b) == block(h2, b))
    }

  property("minhash is element-wise monotone under shingle union") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, HashOps.Mod - 1)),
      Gen.listOf(Gen.choose(0L, HashOps.Mod - 1))) { (base, extra) =>
      val a = HashOps.minhash(base.toArray, 8)
      val b = HashOps.minhash((base ++ extra).toArray, 8)
      a.zip(b).forall { case (x, y) => y <= x }
    }

  property("trigramLangId returns a known language") = forAll(text) { s =>
    Set("de", "en", "es", "fr", "zh")
      .contains(HashOps.trigramLangId(u(s)).toString)
  }

  property("hashedBow conserves tokens and buckets by polyHash mod dim") =
    forAll(text, Gen.choose(1, 64)) { (s, dim) =>
      val bow = HashOps.hashedBow(u(s), dim)
      val toks = HashOps.tokenize(u(s))
      val ref = new Array[Long](dim)
      toks.foreach(w => ref((HashOps.polyHash(u(w)) % dim).toInt) += 1)
      bow.length == dim && bow.sum == toks.length && bow.sameElements(ref)
    }

  property("dotFold is the exact sequential double fold") =
    forAll(Gen.listOf(Gen.chooseNum(-1.0f, 1.0f))) { xs =>
      val a = xs.toArray
      val ref = a.foldLeft(0.0)((acc, v) => acc + v.toDouble * v.toDouble)
      HashOps.dotFold(a, a) == ref
    }

  property("sortedIntersect equals set intersection on sorted inputs") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))) {
      (xs, ys) =>
        val a = xs.distinct.sorted.toArray
        val b = ys.distinct.sorted.toArray
        val got = graft.functions.HashOps.sortedIntersect(a, b)
        got.toSeq == (a.toSet intersect b.toSet).toSeq.sorted &&
          got.toSeq == got.toSeq.sorted
    }

  property("zorder reference: interleave is injective on 16-bit pairs") =
    forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (a, b) =>
      def interleave(x: Long, y: Long): Long =
        (0 until 16).map { i =>
          ((x >> i) & 1L) * (1L << (2 * i)) +
            ((y >> i) & 1L) * (1L << (2 * i + 1))
        }.sum
      val z = interleave(a, b)
      def deinterleave(z: Long, off: Int): Long =
        (0 until 16).map(i => ((z >> (2 * i + off)) & 1L) << i).sum
      deinterleave(z, 0) == a && deinterleave(z, 1) == b
    }

}

/** Star contraction vs min-label propagation on random graphs —
  * both must label every vertex with its connected component's
  * minimum id. The union-find reference makes the expected answer
  * independent of either Spark implementation. Separate suite with
  * fewer cases: each case runs two iterative Spark jobs (the pure
  * kernel properties above keep the default 100). */
object ClusterResolveProps extends Properties("ClusterResolve") {
  property("both resolvers agree with union-find on random graphs") = {
    val edgeGen = Gen.listOf(
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
    Prop.forAllNoShrink(edgeGen) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      val spark = SparkTestSession.spark
      import spark.implicits._
      val pairs = edges.toDF("a_id", "b_id")
      def labelsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      labelsOf(graft.operators.Dedup.resolveClustersStars(pairs)) == want &&
        labelsOf(graft.operators.Dedup.resolveClusters(pairs)) == want
    }
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(20)
}
