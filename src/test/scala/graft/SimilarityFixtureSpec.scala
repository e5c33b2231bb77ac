package graft

import graft.functions.HashImpls
import graft.similarity.Similarity
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end VALUE checks of the rows-only ANN operators (s02–s04) on
  * the fixture embeddings: bucket assignment, probe expansion, inverted
  * lists, and ranking are compared against expectations computed directly
  * from the golden-pinned kernels (rhBucket / dot). Complements s01's SQL
  * oracle: a wrong probe bit-flip or centroid argmax would still return
  * plausible row counts but fails these equality assertions.
  */
class SimilarityFixtureSpec extends AnyFunSuite {
  lazy val t = FixtureData.tables
  import FixtureData.round4

  private val dvecs: Map[Long, Array[Double]] =
    FixtureData.vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
  private val vids: Seq[Long] = FixtureData.vecs.map(_._1).sorted
  private val qids: Seq[Long] = vids.filter(_ < 10)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private val norm: Map[Long, Double] =
    dvecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
  private def sim(c: Long, q: Long): Double =
    round4(dot(dvecs(c), dvecs(q)) / (norm(c) * norm(q)))

  /** top-5 by (sim desc, vec_id asc) with row numbers — the s0x ranking. */
  private def top5(q: Long, cands: Iterable[Long]): Seq[(Long, Long, Double, Long)] =
    cands.toSeq.map(c => (c, sim(c, q)))
      .sortBy { case (c, s) => (-s, c) }
      .take(5).zipWithIndex
      .map { case ((c, s), i) => (q, c, s, i + 1L) }

  private def collect4(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("s02 single-probe LSH ANN equals the kernel-computed expectation") {
    val bucket = dvecs.map { case (id, v) =>
      id -> HashImpls.rhBucket(new GenericArrayData(v), 8, 7L)
    }
    val expected = qids.flatMap { q =>
      top5(q, vids.filter(c => bucket(c) == bucket(q)))
    }
    assert(collect4(Similarity.s02(t)) == expected)
  }

  test("s04 multi-probe LSH ANN equals the kernel-computed expectation") {
    val bucket = dvecs.map { case (id, v) =>
      id -> HashImpls.rhBucket(new GenericArrayData(v), 8, 7L)
    }
    val expectedS02 = qids.flatMap { q =>
      top5(q, vids.filter(c => bucket(c) == bucket(q)))
    }
    val expected = qids.flatMap { q =>
      val probes = (bucket(q) +: (0 until 8).map(i => bucket(q) ^ (1 << i))).toSet
      top5(q, vids.filter(c => probes.contains(bucket(c))))
    }
    val got = collect4(Similarity.s04(t))
    assert(got == expected)
    // multi-probe must never return fewer candidates than single-probe
    // (compared on the kernel-side expectations — no extra Spark jobs)
    assert(expected.size >= expectedS02.size)
  }

  test("s03 IVF ANN (sampled codebook) equals the kernel-computed expectation " +
    "(5 lists, 4 probes)") {
    val centIds = vids.filter(id => id % 37 == 0 && id < 37 * 16)
    assert(centIds == Seq(0L, 37L, 74L, 111L, 148L),
      "fixture must exercise probe selection: more lists than NProbe")
    def ccos(v: Long, c: Long): Double =
      dot(dvecs(v), dvecs(c)) / (norm(v) * norm(c))
    // assignment: array_max over struct(ccos, cent_id) = lexicographic max
    val assigned: Map[Long, Long] = vids.map { v =>
      v -> centIds.maxBy(c => (ccos(v, c), c))
    }.toMap
    // probes: top NProbe=4 centroids by (ccos desc, cent_id asc)
    val expected = qids.flatMap { q =>
      val probed = centIds.sortBy(c => (-ccos(q, c), c)).take(4).toSet
      top5(q, vids.filter(v => probed.contains(assigned(v))))
    }
    assert(collect4(Similarity.s03With(t, lloydIters = 0)) == expected)
  }

  test("s06 PQ ANN: identical vectors survive quantization; self is top-1") {
    val rows = collect4(Similarity.s06(t))
    assert(rows.nonEmpty)
    // a query's own vector has identical codes -> max ADC -> exact
    // re-rank must put it first with sim 1.0
    val top1 = rows.filter(_._4 == 1L)
    assert(top1.map(_._1) == qids, s"every query must return a top-1: $top1")
    top1.foreach { case (q, c, s, _) =>
      assert(q == c && math.abs(s - 1.0) < 1e-9,
        s"query $q top-1 must be itself at sim 1.0, got ($c, $s)")
    }
    // the planted identical pair: vec 11 == vec 10, so any sane
    // quantization keeps 11 in 10's top-5 (codes identical, ADC maximal)
    // — fixture queries are ids < 10, so check from query 3's perspective
    // on the pair members' own ranking instead: both 10 and 11 share
    // codes, so whichever candidates reach any query's shortlist, the
    // exact re-rank orders them by true cosine; assert global sanity:
    // every returned sim is within [-1, 1] and rows are 5 per query
    assert(rows.groupBy(_._1).forall(_._2.size == 5))
    assert(rows.forall(r => r._3 >= -1.0001 && r._3 <= 1.0001))
    // recall@5 against kernel-side brute force: the 50-of-149 shortlist
    // with exact re-rank must beat 0.5 by construction unless the ADC
    // indexing is broken (broken indexing ~ random shortlist ~ 0.33)
    val truth: Map[Long, Set[Long]] = qids.map { q =>
      q -> top5(q, vids).map(_._2).toSet
    }.toMap
    val recall = qids.map { q =>
      rows.filter(_._1 == q).map(_._2).toSet.intersect(truth(q)).size / 5.0
    }.sum / qids.size
    assert(recall >= 0.5, s"PQ+re-rank recall@5 $recall below 0.5")
  }

  test("s14 SQ8 ANN equals the kernel-computed grid/ADC/re-rank " +
    "expectation, and the grid bounds per-dim reconstruction error") {
    val live = vids.filter(norm(_) > 0)
    val d = dvecs(live.head).length
    val mins = Array.tabulate(d)(i => live.map(dvecs(_)(i)).min)
    val steps = Array.tabulate(d) { i =>
      val s = (live.map(dvecs(_)(i)).max - mins(i)) / 255.0
      if (s > 0) s else 1.0
    }
    // Spark round() is HALF_UP; operands are >= 0 here so floor(x+0.5)
    def code(v: Array[Double], i: Int): Double =
      math.min(255.0, math.max(0.0,
        math.floor((v(i) - mins(i)) / steps(i) + 0.5)))
    // reconstruction bound: |x̂ - x| <= step/2 (+ eps) on every live dim
    live.foreach { id =>
      (0 until d).foreach { i =>
        val xhat = mins(i) + code(dvecs(id), i) * steps(i)
        assert(math.abs(xhat - dvecs(id)(i)) <= steps(i) / 2 + 1e-9,
          s"vec $id dim $i reconstruction error exceeds step/2")
      }
    }
    // ADC shortlist-50 then exact top-5, same arithmetic order as the
    // fused kernel (sequential dot)
    val expected = qids.flatMap { q =>
      val qv = dvecs(q)
      val w = Array.tabulate(d)(i => qv(i) * steps(i))
      val c0 = (0 until d).map(i => qv(i) * mins(i)).sum
      val adc = live.map { v =>
        var s = 0.0; var i = 0
        while (i < d) { s += code(dvecs(v), i) * w(i); i += 1 }
        v -> (c0 + s)
      }.toMap
      val shortlist = live.sortBy(v => (-adc(v), v)).take(50)
      top5(q, shortlist)
    }
    assert(collect4(Similarity.s14(t)) == expected)
  }

  test("s15 MMR equals the kernel-computed greedy trace and actually " +
    "diversifies: no selected pair exceeds the relevance-only top-k's " +
    "max pairwise sim") {
    val live = vids.filter(norm(_) > 0)
    val expected = qids.flatMap { q =>
      val short = live.map(c => (c, sim(c, q)))
        .sortBy { case (c, s) => (-s, c) }.take(50)
      val bySim = short.toMap
      var selected = Vector.empty[Long]
      (1 to 5).foreach { _ =>
        val remaining = bySim.keys.toSeq.filterNot(selected.contains)
        if (remaining.nonEmpty) {
          val best = remaining.minBy { d =>
            val pen = if (selected.isEmpty) 0.0
              else selected.map(s => sim(d, s)).max
            (-(0.7 * bySim(d) - 0.3 * pen), d)
          }
          selected :+= best
        }
      }
      selected.zipWithIndex.map { case (d, i) => (q, d, bySim(d), i + 1L) }
    }
    val got = collect4(Similarity.s15(t))
    assert(got == expected, s"s15 trace mismatch:\n$got\nvs\n$expected")
    // diversity property: on this fixture the greedy must not pick a
    // pair MORE similar than the most similar pair relevance-only top-5
    // would pick (it may tie when relevance dominates)
    qids.foreach { q =>
      def maxPair(ids: Seq[Long]): Double =
        (for { a <- ids; b <- ids if a < b } yield sim(a, b))
          .foldLeft(-1.0)(math.max)
      val mmrIds = expected.filter(_._1 == q).map(_._2)
      val topIds = top5(q, live).map(_._2)
      assert(maxPair(mmrIds) <= maxPair(topIds) + 1e-9,
        s"query $q: MMR picked a tighter cluster than plain top-5")
    }
  }

  test("s16 probe curve equals the kernel-computed per-budget " +
    "expectation and recall is monotone in the probe budget") {
    val bucket = dvecs.map { case (id, v) =>
      id -> HashImpls.rhBucket(new GenericArrayData(v), 8, 7L)
    }
    val live = vids.filter(norm(_) > 0)
    val truth: Map[Long, Set[Long]] = qids.map { q =>
      q -> top5(q, live).map(_._2).toSet
    }.toMap
    val expected = Seq(1, 3, 5, 9).map { p =>
      val rows = qids.map { q =>
        val bs = (Seq(bucket(q)) ++
          (0 until 8).map(i => bucket(q) ^ (1 << i))).take(p).toSet
        live.filter(c => bs.contains(bucket(c))).toSet
      }
      val total = rows.map(_.size.toLong).sum
      val hits = qids.zip(rows).map { case (q, cs) =>
        cs.intersect(truth(q)).size.toLong }.sum
      (p.toLong, total, hits, (200 * hits + 50) / 100)
    }
    val got = Similarity.s16(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"s16 $got != $expected")
    // prefix-probe monotonicity: more probes never lose recall or
    // candidates
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("s07 radius search equals the kernel-computed threshold set") {
    val live = vids.filter(norm(_) > 0)
    val expected = (for {
      q <- live.filter(_ < 10)
      c <- live if c != q
      s = sim(c, q) if s >= 0.3
    } yield (q, c, s)).sorted
    assert(expected.nonEmpty, "fixture must exercise the τ boundary")
    val got = Similarity.s07(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got == expected)
  }

  test("d10 semantic dedup: planted copies dropped; pair precision vs " +
    "kernel sims; accounting partitions the corpus") {
    import graft.dedup.Dedup
    val pairs = Dedup.semanticPairs(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision: every emitted pair is genuinely ≥ τ under the
    // kernel-side cosine (wrong clustering could only LOSE pairs, never
    // invent one below threshold)
    pairs.foreach { case (a, b, _) =>
      assert(a < b)
      assert(sim(a, b) >= 0.4, s"pair ($a,$b) below τ")
    }
    // planted recall: 11 is an exact copy of 10 (cos 1 → same argmax
    // centroid → same cluster), 12 a near-copy — both must pair with 10
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet((10L, 11L)), "exact copy must be caught")
    assert(pairSet((10L, 12L)), "near copy must be caught")
    val agg = Dedup.d10(t).collect()
    assert(agg.map(_.getLong(1)).sum == vids.size)
    assert(agg.map(_.getLong(2)).sum >= 2L) // at least the planted drops
  }

  test("s08 knn graph: structure bounds hold and graph recall@3 vs the " +
    "exact brute-force graph clears the floor") {
    val rows = Similarity.s08(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, n, s, rk) =>
      assert(v != n && rk >= 1 && rk <= 3)
      assert(s >= -1.0001 && s <= 1.0001)
    }
    val perVec = rows.groupBy(_._1)
    perVec.foreach { case (v, es) =>
      assert(es.length <= 3, s"vec $v has ${es.length} edges")
      assert(es.map(_._4).sorted.toSeq == (1L to es.length).toSeq)
    }
    // exact brute-force top-3 graph on the fixture corpus
    val exact = vids.map { v =>
      v -> vids.filter(_ != v).map(c => (c, sim(c, v)))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1).toSet
    }.toMap
    val hits = rows.count { case (v, n, _, _) => exact(v).contains(n) }
    val possible = vids.map(v => math.min(3, exact(v).size)).sum
    val recall = hits.toDouble / possible
    assert(recall >= 0.5,
      f"knn-graph recall@3 $recall%.3f below floor (within-cluster approx)")
  }

  test("s13 matryoshka two-stage result equals the exact top-5 on the " +
    "fixture (prefix ≡ full at 16 dims, so the 50-shortlist must be " +
    "recall-lossless; prefix<full semantics are the sf0.01 SQL oracle's " +
    "job)") {
    val expected = qids.flatMap(q => top5(q, vids))
    assert(collect4(Similarity.s13(t)) == expected)
  }

  test("s03 trained codebook (Lloyd) has recall@5 >= sampled codebook") {
    // ground truth: kernel-side brute-force top-5 over the whole corpus
    val truth: Map[Long, Set[Long]] = qids.map { q =>
      q -> top5(q, vids).map(_._2).toSet
    }.toMap
    def recall(rows: Seq[(Long, Long, Double, Long)]): Double = {
      val byQ = rows.groupBy(_._1).map { case (q, rs) =>
        rs.map(_._2).toSet.intersect(truth(q)).size.toDouble / truth(q).size
      }
      byQ.sum / qids.size
    }
    val sampled = recall(collect4(Similarity.s03With(t, lloydIters = 0)))
    val trained = recall(collect4(Similarity.s03(t))) // default = trained
    assert(trained >= sampled,
      s"Lloyd-trained codebook recall $trained < sampled-codebook recall $sampled")
  }
}
