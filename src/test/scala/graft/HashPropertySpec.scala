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

  test("winnowStats equals (rollingHashes.length, winnowFps.length) on random text") {
    // includes the degenerate shapes: empty, shorter than the hash window,
    // shorter than the winnow window, and long repetitive strings (many
    // duplicate window minima exercising the distinct set)
    val cases = Seq("", "a", "winnow", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "ab" * 50) ++ (1 to 300).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    for (s <- cases; (hw, ww) <- Seq((16, 8), (4, 3), (2, 5))) {
      val u = UTF8String.fromString(s)
      val st = HashImpls.winnowStats(u, hw, ww)
      assert(st.getLong(0) == HashImpls.rollingHashes(u, hw).length.toLong,
        s"n_hashes mismatch on '$s' ($hw,$ww)")
      assert(st.getLong(1) == HashImpls.winnowFps(u, hw, ww).length.toLong,
        s"n_fingerprints mismatch on '$s' ($hw,$ww)")
    }
  }

  test("md5WindowHashes equals the per-window md5 spelling") {
    // the SQL-twin contract: h_i = first 12 hex chars of
    // md5(bytes[i..i+w)) as a non-negative 48-bit long, with the
    // whole-text fallback below the hash window
    def md5Hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val cases = Seq("", "a", "short", "do not copy this winnowing fixture",
      "ab" * 40) ++ (1 to 100).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(80)).mkString)
    for (s <- cases; w <- Seq(16, 4, 2)) {
      val expected =
        if (s.length < w) Seq(java.lang.Long.parseLong(md5Hex(s).take(12), 16))
        else (0 to s.length - w).map(i =>
          java.lang.Long.parseLong(md5Hex(s.substring(i, i + w)).take(12), 16))
      val got = HashImpls.md5WindowHashes(UTF8String.fromString(s), w).toSeq
      assert(got == expected, s"w=$w s='$s'")
      assert(got.forall(_ >= 0L), "48-bit hashes are non-negative")
    }
  }

  test("winnowMd5Fps equals the per-window array-min spelling") {
    (1 to 200).foreach { _ =>
      val text = UTF8String.fromString(
        rnd.alphanumeric.take(rnd.nextInt(200)).mkString + "x") // non-empty
      val (hw, ww) = (1 + rnd.nextInt(20), 1 + rnd.nextInt(12))
      val h = HashImpls.md5WindowHashes(text, hw)
      val expected =
        (if (h.length >= ww) h.sliding(ww).map(_.min).toSeq else Seq(h.min))
          .distinct.sorted
      val got = HashImpls.winnowMd5Fps(text, hw, ww).toSeq
      assert(got == expected, s"hw=$hw ww=$ww len=${h.length}")
    }
  }

  test("winnowMd5Stats equals (md5WindowHashes.length, winnowMd5Fps.length)") {
    val cases = Seq("", "a", "winnow", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "ab" * 50) ++ (1 to 200).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    for (s <- cases; (hw, ww) <- Seq((16, 8), (4, 3), (2, 5))) {
      val u = UTF8String.fromString(s)
      val st = HashImpls.winnowMd5Stats(u, hw, ww)
      assert(st.getLong(0) == HashImpls.md5WindowHashes(u, hw).length.toLong,
        s"n_hashes mismatch on '$s' ($hw,$ww)")
      assert(st.getLong(1) == HashImpls.winnowMd5Fps(u, hw, ww).length.toLong,
        s"n_fingerprints mismatch on '$s' ($hw,$ww)")
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

  // ---- Golden-value fixtures -----------------------------------------
  // Expected values computed by an INDEPENDENT Python reimplementation of
  // the documented algorithms (FNV-1a 64, splitmix64, SimHash voting,
  // MinHash h_j(x)=mix64(fnv64(x)^mix64(seed+j)), Rabin-Karp B=1000003 +
  // mix64 finalizer, winnowing window minima, random-hyperplane signs).
  // The Python oracle itself reproduces the published FNV-1a and
  // splitmix64 test vectors, so these pins are cross-validated, not
  // self-referential: any constant drift (an off-by-one in fnv64, a wrong
  // multiplier, a changed seed derivation) fails here even though every
  // property test above would still pass.

  test("fnv64 matches the published FNV-1a 64 test vectors") {
    def f(s: String) = HashImpls.fnv64(s.getBytes("UTF-8"))
    assert(f("") == 0xcbf29ce484222325L)   // offset basis
    assert(f("a") == 0xaf63dc4c8601ec8cL)
    assert(f("hello") == 0xa430d84680aabd0bL)
  }

  test("mix64 matches the published splitmix64 sequence from seed 0") {
    assert(HashImpls.mix64(0L) == 0xe220a8397b1dcdafL)
    assert(HashImpls.mix64(0x9e3779b97f4a7c15L) == 0x6e789e6aa1b965f4L)
    assert(HashImpls.mix64(0x9e3779b97f4a7c15L * 2) == 0x06c45d188009454fL)
  }

  private val fixToks = Seq("the", "quick", "brown", "fox")

  test("simhash64 golden value on a fixed token list") {
    assert(HashImpls.simhash64(arr(fixToks)) == 5363936793200807308L)
  }

  test("minhash signature golden values (k=4, seed=42)") {
    val expected = Seq(-6064225106290547670L, -8906606055218868636L,
      -3223372162286936807L, 1228260984575542398L)
    val shingles = Seq("the quick brown", "quick brown fox")
    assert(HashImpls.minhashSigs(arr(shingles), 4, 42L).toSeq == expected)
    // the streamed n-gram path must land on the same pinned values
    assert(HashImpls.minhashNgrams(arr(fixToks), 3, 4, 42L).toSeq == expected)
  }

  // ---- md5-derived deterministic kernels (round-7: d02/d03/st14) ------

  private def md5MinhashRef(toks: Seq[String], n: Int, k: Int,
      seed: Long): Seq[Long] = {
    // independent spelling: materialized gram strings, JDK md5, the
    // documented 12-hex-char prefix parse, the affine family
    val grams = if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
                else Seq(toks.mkString(" "))
    val perms = graft.functions.Md5MinHash.perms(k, seed)
    val P = graft.functions.Md5MinHash.P
    perms.toSeq.map { case (a, b) =>
      grams.map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map(x => f"${x & 0xff}%02x").mkString.take(12)
        (a * java.lang.Long.parseLong(hex, 16) + b) % P
      }.min
    }
  }

  test("minhashMd5Ngrams equals the materialized-gram md5+affine spelling") {
    (1 to 200).foreach { _ =>
      val toks = randTokens()
      val perms = graft.functions.Md5MinHash.perms(32, 42L)
      val streamed = HashImpls.minhashMd5Ngrams(arr(toks), 3,
        perms.map(_._1), perms.map(_._2)).toSeq
      assert(streamed == md5MinhashRef(toks, 3, 32, 42L), s"toks=$toks")
    }
  }

  test("md5 minhash golden values (k=4, seed=42) — cross-validated " +
    "against an independent Python implementation AND DuckDB's " +
    "md5+affine SQL spelling (both reproduce these exact values)") {
    assert(graft.functions.Md5MinHash.perms(4, 42L).toSeq == Seq(
      (11926L, 1903312424708075405L), (5204L, 1723176581284776669L),
      (12296L, 1996154960772651912L), (16164L, 2038608524547893592L)))
    val perms = graft.functions.Md5MinHash.perms(4, 42L)
    assert(HashImpls.minhashMd5Ngrams(arr(fixToks), 3,
      perms.map(_._1), perms.map(_._2)).toSeq ==
      Seq(1469682449216261836L, 234287842361931746L,
        1620609743160856433L, 767955394323682774L))
  }

  test("simhashMd5: deterministic, order-invariant, golden value " +
    "cross-validated against the Python md5-vote implementation") {
    (1 to 100).foreach { _ =>
      val toks = randTokens()
      val a = HashImpls.simhashMd5(arr(toks))
      assert(HashImpls.simhashMd5(arr(rnd.shuffle(toks))) == a)
    }
    assert(HashImpls.simhashMd5(arr(fixToks)) == 1140660199213328064L)
  }

  test("sigMatches counts positional agreement") {
    val a = new GenericArrayData(Array(1L, 2L, 3L, 4L))
    val b = new GenericArrayData(Array(1L, 9L, 3L, 8L))
    assert(HashImpls.sigMatches(a, b) == 2L)
    assert(HashImpls.sigMatches(a, a) == 4L)
  }

  test("ngramHashes golden values (sorted signed order)") {
    assert(HashImpls.ngramHashes(arr(fixToks), 3).toSeq ==
      Seq(-8421630478583369269L, 9185940588308658957L))
  }

  test("rollingHashes golden values ('winnowing', w=4)") {
    assert(HashImpls.rollingHashes(UTF8String.fromString("winnowing"), 4).toSeq ==
      Seq(-4694910225844039464L, -1307326639315936142L, -8373744826442844816L,
        -5614326321921721338L, 5383943387697390170L, 8125953172252415221L))
  }

  test("winnowFps golden values (hashWin=4, winnowWin=3)") {
    val fps = HashImpls.winnowFps(
      UTF8String.fromString("do not copy this winnowing fixture"), 4, 3)
    assert(fps.toSeq == Seq(-8963405201042702251L, -8848708780846717404L,
      -8636223019335492605L, -8373744826442844816L, -6845833186229268406L,
      -5852379895635180323L, -5614326321921721338L, -5484934113770802213L,
      -4694910225844039464L, -4534735052127747578L, -4490087559354591539L,
      -2841340504377191227L, -2738637037192758994L, -2361182922449300356L,
      -2122423741283622134L, -890767155884604861L))
  }

  test("rhBucket golden values (8 planes)") {
    assert(HashImpls.rhBucket(
      new GenericArrayData(Array(1.0, 2.0, 3.0)), 8, 7L) == 205)
    assert(HashImpls.rhBucket(
      new GenericArrayData(Array(0.5, -1.25, 2.0, 0.75)), 8, 42L) == 185)
  }

  test("LSH banding on a 3-doc fixture finds the planted pair only") {
    // the same planted corpus the end-to-end fixture specs run on — one
    // definition of the fixture texts (FixtureData; its lazy Spark-backed
    // `tables` is untouched here), through the production banding
    // constants (K=32, 8 bands of 4)
    val byId = FixtureData.docTexts.toMap
    val a = byId(1L).split(" ").toSeq // base doc
    val b = byId(2L).split(" ").toSeq // near-dup: last token differs
    val c = byId(5L).split(" ").toSeq // unrelated
    def sig(t: Seq[String]) = HashImpls.minhashNgrams(arr(t), 3, 32, 42L).toSeq
    def bands(s: Seq[Long]) = s.grouped(4).toSeq
    val (sa, sb, sc) = (sig(a), sig(b), sig(c))
    def sharedBands(x: Seq[Long], y: Seq[Long]) =
      bands(x).zip(bands(y)).count { case (p, q) => p == q }
    assert(sharedBands(sa, sb) >= 1, "near-dup pair must collide in >=1 band")
    assert(sharedBands(sa, sc) == 0 && sharedBands(sb, sc) == 0,
      "unrelated doc must not collide")
    val est = sa.zip(sb).count { case (x, y) => x == y } / 32.0
    assert(est >= 0.5, s"estimated jaccard of the planted pair too low: $est")
    assert(sa.zip(sc).count { case (x, y) => x == y } / 32.0 < 0.2)
  }

  test("kmv_sketch buffer: k-smallest-distinct semantics, merge-order " +
    "invariance, serde round-trip, and estimator error bound") {
    import graft.functions.{KmvBuffer, KmvSketch}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.LongType
    val K = 256
    val agg = KmvSketch(BoundReference(0, LongType, nullable = true), K)
    def evalSeq(b: KmvBuffer): Seq[Long] =
      agg.eval(b).asInstanceOf[ArrayData].toLongArray().toSeq
    def updated(vs: Seq[Long]): KmvBuffer = {
      val b = agg.createAggregationBuffer()
      vs.foreach(v => agg.update(b, InternalRow(v)))
      b
    }
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(2000)
      // duplicates on purpose: KMV is over DISTINCT values
      val vs = Seq.fill(n)(rnd.nextLong(1L << 48))
      val dup = rnd.shuffle(vs ++ vs.take(n / 2))
      val expect = vs.distinct.sorted.take(K)
      assert(evalSeq(updated(dup)) == expect)
      // merge in arbitrary split order must equal the single-pass sketch
      val parts = dup.grouped(1 + rnd.nextInt(200)).map(updated).toSeq
      val merged = rnd.shuffle(parts)
        .reduce { (a, b) => agg.merge(a, b) }
      assert(evalSeq(merged) == expect)
      // serde round-trip preserves the sketch exactly
      assert(evalSeq(agg.deserialize(agg.serialize(merged))) == expect)
    }
    // estimator: 100k uniform 48-bit distinct hashes; KMV RSE ~ 1/sqrt(k-2)
    // (~6.3% at k=256) — gate at 5 sigma
    val big = Seq.fill(100000)(rnd.nextLong(1L << 48)).distinct
    val sk = evalSeq(updated(big))
    assert(sk.size == K)
    val est = (K - 1L) * (1L << 48) / sk.last
    val err = math.abs(est.toDouble - big.size) / big.size
    assert(err < 5.0 / math.sqrt(K - 2.0),
      s"KMV estimate $est vs ${big.size}: error $err beyond 5 sigma")
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
