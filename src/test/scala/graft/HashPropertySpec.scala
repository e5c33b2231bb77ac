package graft

import graft.functions.HashImpls
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties (no Spark session): determinism, invariances,
  * and bounds of the hash kernels under randomized inputs (seeded). */
class HashPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(12345)
  private def randTokens(): Seq[String] =
    Seq.fill(rnd.nextInt(40))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(UTF8String.fromString))

  test("simhash64 is deterministic and order-invariant") {
    (1 to 200).foreach { _ =>
      val toks = randTokens()
      val a = HashImpls.simhash64(arr(toks))
      assert(HashImpls.simhash64(arr(toks)) == a)
      assert(HashImpls.simhash64(arr(rnd.shuffle(toks))) == a)
    }
  }

  test("minhash signature: set semantics, monotone under union") {
    (1 to 200).foreach { _ =>
      val toks = randTokens()
      val s1 = HashImpls.minhashSigs(arr(toks), 16, 42L)
      // duplicates don't change a min-based signature
      assert(HashImpls.minhashSigs(arr(toks ++ toks), 16, 42L).toSeq == s1.toSeq)
      // adding an element can only lower components
      val s3 = HashImpls.minhashSigs(arr(toks :+ "extra-shingle"), 16, 42L)
      s1.zip(s3).foreach { case (o, n) => assert(n <= o) }
    }
  }

  test("minhashNgrams equals minhashSigs over materialized 3-gram shingles") {
    (1 to 200).foreach { _ =>
      val toks = randTokens()
      val shingles =
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      val viaShingles = HashImpls.minhashSigs(arr(shingles), 32, 42L).toSeq
      val streamed = HashImpls.minhashNgrams(arr(toks), 3, 32, 42L).toSeq
      assert(streamed == viaShingles, s"toks=$toks")
    }
  }

  test("winnowFps equals the per-window array-min spelling") {
    (1 to 200).foreach { _ =>
      val text = UTF8String.fromString(
        rnd.alphanumeric.take(rnd.nextInt(200)).mkString + "x") // non-empty
      val (hw, ww) = (1 + rnd.nextInt(20), 1 + rnd.nextInt(12))
      val h = HashImpls.rollingHashes(text, hw)
      val expected =
        (if (h.length >= ww) h.sliding(ww).map(_.min).toSeq else Seq(h.min))
          .distinct.sorted
      val got = HashImpls.winnowFps(text, hw, ww).toSeq
      assert(got == expected, s"hw=$hw ww=$ww len=${h.length}")
    }
  }

  test("ngramHashes jaccard equals string-shingle jaccard") {
    (1 to 200).foreach { _ =>
      val a = randTokens()
      val b = if (rnd.nextBoolean()) a.drop(rnd.nextInt(5)) ++ randTokens() else randTokens()
      def strGrams(t: Seq[String]) =
        (if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
         else Set(t.mkString(" ")))
      val (sa, sb) = (strGrams(a), strGrams(b))
      val strJac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val (ha, hb) = (HashImpls.ngramHashes(arr(a), 3).toSet,
        HashImpls.ngramHashes(arr(b), 3).toSet)
      val hashJac = ha.intersect(hb).size.toDouble / ha.union(hb).size
      assert(hashJac == strJac, s"a=$a b=$b")
      // sorted + distinct invariant
      val h = HashImpls.ngramHashes(arr(a), 3)
      assert(h.toSeq == h.toSeq.sorted && h.toSeq.distinct == h.toSeq)
    }
  }

  test("rh_bucket: in range, deterministic, sign-antisymmetric") {
    (1 to 200).foreach { _ =>
      val v = Array.fill(16)(rnd.nextDouble() * 10 - 5)
      val b = HashImpls.rhBucket(new GenericArrayData(v), 6, 9L)
      assert(b >= 0 && b < 64)
      assert(HashImpls.rhBucket(new GenericArrayData(v.clone()), 6, 9L) == b)
      // flipping the vector flips every decided bit (dot products negate);
      // exact-zero dots are measure-zero with random doubles
      val neg = HashImpls.rhBucket(new GenericArrayData(v.map(-_)), 6, 9L)
      assert((b ^ neg) == 63)
    }
  }

  test("rolling hashes: deterministic, n-w+1 windows, equal windows collide") {
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(4 + rnd.nextInt(60)).mkString
      val hs = HashImpls.rollingHashes(UTF8String.fromString(s), 4)
      assert(hs.length == s.getBytes("UTF-8").length - 3)
      assert(HashImpls.rollingHashes(UTF8String.fromString(s), 4).toSeq == hs.toSeq)
      // windows with identical content collide: duplicate the string with a
      // 4-char bridge and compare the repeated region
      val dup = s + s
      val hd = HashImpls.rollingHashes(UTF8String.fromString(dup), 4)
      assert(hd(0) == hd(s.length))
    }
  }
}
