#!/usr/bin/env python3
"""Third-engine replay of the trained/quantized ANN paths: s03 (IVF with
the Lloyd-refined coarse codebook), s06 (PQ with sampled sub-codebooks +
ADC LUTs), s08 (cluster-bucketed k-NN graph), and s14 (SQ8 scalar
quantization with ADC shortlist), rebuilt in pure Python from the
documented algorithms and compared against the graft.Verify dumps.

Why these are replayable outside the JVM:
 - s06/s14 are deterministic end to end: the PQ codebook is a sampled
   id-set (no training), the SQ8 per-dim [min,max] grid is
   order-independent, and every float reduction (sub-scores, ADC dots,
   cosines) is a FIXED-ORDER per-row loop over dims — bit-identical in
   any IEEE-754 double implementation. Exact equality required.
 - s03/s08's Lloyd means are the one order-sensitive float reduction
   (Spark sums partials in partition order; Python sums sequentially).
   The low-bit wobble only matters if a vector sits at an EXACT cosine
   tie between two trained centroids, or a probe ranking ties — with
   real-valued data that has never been observed; the final sims are
   computed from RAW vectors (bit-exact), so any wobble would surface
   as a candidate-set diff, loudly.

Rounding: Spark's round(x, s) on doubles is HALF_UP over
Double.toString(x) (shortest round-trip decimal); Python's repr() is the
same shortest representation, so Decimal(repr(x)) half-up reproduces it.

Usage: codebook_oracle.py <sfDir> <verifyOutDir>
Exits nonzero on any mismatch with the s03/s14 dumps.
"""
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb

C = 16
LLOYD_ITERS = 3
NPROBE = 4
NQUERIES = 10
TOPK = 5
SHORTLIST = 50


def half_up(x, digits):
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def dot(a, b):
    s = 0.0
    for i in range(min(len(a), len(b))):
        s += a[i] * b[i]
    return s


def load_corpus(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    corpus = []
    for vid, emb in rows:
        vec = [float(x) for x in emb]  # float32 -> double, like the cast
        norm = dot(vec, vec) ** 0.5
        if norm > 0:
            corpus.append((vid, vec, norm))
    return corpus


def nearest(vec, norm, cb):
    """Argmax cosine, >= comparison over id-ascending codebook
    (HashImpls.nearestCentroid: last wins ties)."""
    best, best_id = float("-inf"), -1
    for cid, cvec, cnorm in cb:
        cos = dot(vec, cvec) / (norm * cnorm)
        if cos >= best:
            best, best_id = cos, cid
    return best_id


M64 = (1 << 64) - 1


def mix64(x):
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)


def rh_bucket(vec, planes, seed):
    bucket = 0
    for p in range(planes):
        s = 0.0
        for d, v in enumerate(vec):
            w = (mix64((seed + p * 65536 + d) & M64) >> 11) \
                * (1.0 / (1 << 53)) * 2.0 - 1.0
            s += v * w
        if s > 0:
            bucket |= 1 << p
    return bucket


def sem_cluster_knobs(n):
    """Dedup.semClusterKnobs: C = clamp(n/32, 16, 512); hyperplane
    sub-banding engages only past the C cap."""
    import math
    c = int(max(16, min(512, n // 32)))
    planes = 0 if c < 512 else min(
        30, max(0, math.ceil(math.log(n / (512.0 * 32)) / math.log(2.0))))
    return c, planes


def build_codebook(corpus, c=C):
    cb = sorted(
        [(int(v), list(vec), n) for v, vec, n in corpus
         if v % 37 == 0 and v < 37 * c],
        key=lambda t: t[0])
    assert cb, "empty seed codebook"
    dim = len(cb[0][1])
    for _ in range(LLOYD_ITERS):
        sums, counts = {}, {}
        for vid, vec, norm in corpus:
            cid = nearest(vec, norm, cb)
            if cid not in sums:
                sums[cid] = [0.0] * dim
            s = sums[cid]
            for i in range(dim):
                s[i] += vec[i]
            counts[cid] = counts.get(cid, 0) + 1
        nxt = []
        for cid in sorted(sums):
            v = [sums[cid][i] / counts[cid] for i in range(dim)]
            n = dot(v, v) ** 0.5
            if n > 0:
                nxt.append((cid, v, n))
        cb = nxt
    return cb


def rank_topk(cands, k):
    """(q_id, vec_id, sim) -> rows (q_id, vec_id, sim, rn), rn<=k by
    (sim desc, vec_id asc) per q_id."""
    out = []
    by_q = {}
    for q, v, s in cands:
        by_q.setdefault(q, []).append((v, s))
    for q in sorted(by_q):
        ranked = sorted(by_q[q], key=lambda t: (-t[1], t[0]))
        for rn, (v, s) in enumerate(ranked[:k], 1):
            out.append((q, v, s, rn))
    return out


def s03_expected(corpus):
    cb = build_codebook(corpus)
    assign = {vid: nearest(vec, norm, cb) for vid, vec, norm in corpus}
    cands = []
    for qid, qvec, qnorm in corpus:
        if qid >= NQUERIES:
            continue
        # probes: NPROBE best centroids by (ccos desc, cent_id asc)
        scored = sorted(
            [(-(dot(qvec, cvec) / (qnorm * cnorm)), cid)
             for cid, cvec, cnorm in cb])
        probes = {cid for _, cid in scored[:NPROBE]}
        for vid, vec, norm in corpus:
            if assign[vid] in probes:
                cands.append((qid, vid,
                              half_up(dot(vec, qvec) / (norm * qnorm), 4)))
    return rank_topk(cands, TOPK)


def s14_expected(corpus):
    dim = len(corpus[0][1])
    mins = [min(vec[i] for _, vec, _ in corpus) for i in range(dim)]
    maxs = [max(vec[i] for _, vec, _ in corpus) for i in range(dim)]
    steps = [(maxs[i] - mins[i]) / 255.0 for i in range(dim)]
    steps = [s if s > 0 else 1.0 for s in steps]
    codes = {
        vid: [min(255.0, max(0.0, half_up((vec[i] - mins[i]) / steps[i], 0)))
              for i in range(dim)]
        for vid, vec, _ in corpus}
    queries = [(v, vec, n) for v, vec, n in corpus if v < NQUERIES]
    cands = []
    for qid, qvec, qnorm in queries:
        w = [qvec[i] * steps[i] for i in range(dim)]
        c = sum(qvec[i] * mins[i] for i in range(dim))
        adc = sorted(
            ((-(c + dot(codes[vid], w)), vid) for vid, _, _ in corpus))
        short = {vid for _, vid in adc[:SHORTLIST]}
        for vid, vec, norm in corpus:
            if vid in short:
                cands.append((qid, vid,
                              half_up(dot(vec, qvec) / (norm * qnorm), 4)))
    return rank_topk(cands, TOPK)


def s06_expected(corpus):
    """PQ: M=8 sub-codebooks from the SAMPLED seed rows (collect order =
    vec_id order on the generated single-file table), L2-argmin encode
    spelled argmax(x.c - |c|^2/2) with array_max's (score, j) lex max
    (ties -> larger j), left-fold ADC sum over LUT entries."""
    M_SUB, KS_CAP = 8, 16
    seeds = [list(vec) for vid, vec, _ in corpus
             if vid % 37 == 0 and vid < 37 * KS_CAP]
    dim = len(seeds[0])
    sub = dim // M_SUB
    cb = [[s[m * sub:(m + 1) * sub] for s in seeds] for m in range(M_SUB)]
    ks = len(seeds)
    half_sq = [[sum(x * x for x in c) / 2 for c in cb[m]]
               for m in range(M_SUB)]

    def encode(vec):
        code = []
        for m in range(M_SUB):
            sv = vec[m * sub:(m + 1) * sub]
            best, best_j = float("-inf"), -1
            for j in range(ks):
                sc = dot(sv, cb[m][j]) - half_sq[m][j]
                if (sc, j) >= (best, best_j):
                    best, best_j = sc, j
            code.append(best_j)
        return code

    codes = {vid: encode(vec) for vid, vec, _ in corpus}
    cands = []
    for qid, qvec, qnorm in corpus:
        if qid >= NQUERIES:
            continue
        lut = [[dot(qvec[m * sub:(m + 1) * sub], cb[m][j])
                for j in range(ks)] for m in range(M_SUB)]
        adc_scores = []
        for vid, _, _ in corpus:
            a = 0.0
            for m in range(M_SUB):  # left fold, like reduce(_ + _)
                a += lut[m][codes[vid][m]]
            adc_scores.append((-a, vid))
        short = {vid for _, vid in sorted(adc_scores)[:SHORTLIST]}
        for vid, vec, norm in corpus:
            if vid in short:
                cands.append((qid, vid,
                              half_up(dot(vec, qvec) / (norm * qnorm), 4)))
    return rank_topk(cands, TOPK)


def sem_buckets(corpus):
    """The (cent_id, sub-bucket) frame s08 and d10 share: Lloyd codebook
    at semClusterKnobs' C, optional rh_bucket(planes, seed=77) sub-band."""
    c, planes = sem_cluster_knobs(len(corpus))
    cb = build_codebook(corpus, c)
    buckets = {}
    for vid, vec, norm in corpus:
        key = (nearest(vec, norm, cb),
               rh_bucket(vec, planes, 77) if planes else 0)
        buckets.setdefault(key, []).append((vid, vec, norm))
    return buckets


def s08_expected(buckets):
    """k-NN graph over trained-cluster (+ optional hyperplane sub-band)
    buckets: K=3 neighbors per vector, (sim desc, nn_id) tie-break."""
    K = 3
    out = []
    for members in buckets.values():
        for vid, vec, norm in members:
            sims = sorted(
                (-half_up(dot(vec, nvec) / (norm * nnorm), 4), nid)
                for nid, nvec, nnorm in members if nid != vid)
            for rank, (negs, nid) in enumerate(sims[:K], 1):
                out.append((vid, nid, -negs, rank))
    return sorted(out)


SEM_TAU = 0.4
MAX_BUCKET = 64
HOT_ROUNDS = 3


def d10_expected(buckets):
    """SemDeDup accounting: within-bucket near-dup pairs at cos >= 0.4
    (unrounded — raw-vector doubles, tie-free), oversized buckets resolved
    by Dedup.resolveHotBuckets' min-id rep election (3 rounds: the rep
    pairs with every member it matches and EXITS the bucket with them;
    the unmatched remnant re-elects; a remnant still > MaxBucket after
    round 3 falls to bucketPairs' n <= MaxBucket filter and is dropped).
    Output: per cent_id, (n_vecs, n_dropped) with dropped = distinct
    higher-id member of any pair (min-id survivorship)."""
    def cos(a, b):
        return dot(a[1], b[1]) / (a[2] * b[2])

    n_vecs, dropped = {}, set()
    for (cent, _sub), members in buckets.items():
        n_vecs[cent] = n_vecs.get(cent, 0) + len(members)
        pending = sorted(members)  # doc_id ascending
        for _ in range(HOT_ROUNDS):
            if len(pending) <= MAX_BUCKET:
                break
            rep, rest = pending[0], pending[1:]
            pending = []
            for m in rest:
                if cos(rep, m) >= SEM_TAU:
                    dropped.add((cent, m[0]))  # doc_b = member > rep
                else:
                    pending.append(m)
        if 2 <= len(pending) <= MAX_BUCKET:
            for i in range(len(pending)):
                for j in range(i + 1, len(pending)):
                    if cos(pending[i], pending[j]) >= SEM_TAU:
                        dropped.add((cent, pending[j][0]))
    return sorted((cent, n, sum(1 for c, _ in dropped if c == cent))
                  for cent, n in n_vecs.items())


def s15_expected(corpus):
    """MMR diversified top-k: exact top-50 shortlist per query (round-4
    sims, vec_id tie-break), round-4 pairwise sims within the shortlist,
    then the sequential greedy argmax of 0.7*sim - (1-0.7)*max-sim-to-
    selected (ties -> smaller vec_id). (1-0.7) is the same IEEE double
    0.30000000000000004 on both sides; the lambda arithmetic is identical
    fixed-order float ops, so equality is exact."""
    LAM = 0.7
    queries = [(v, vec, n) for v, vec, n in corpus if v < NQUERIES]
    out = []
    for qid, qvec, qnorm in queries:
        scored = sorted(
            (-half_up(dot(vec, qvec) / (norm * qnorm), 4), vid, vec, norm)
            for vid, vec, norm in corpus)
        short = [(vid, -negs, vec, norm)
                 for negs, vid, vec, norm in scored[:SHORTLIST]]
        psim = {}
        for i, (va, _, veca, norma) in enumerate(short):
            for vb, _, vecb, normb in short:
                if va != vb:
                    psim[(va, vb)] = half_up(
                        dot(veca, vecb) / (norma * normb), 4)
        by_sim = {vid: s for vid, s, _, _ in short}
        selected = []
        for _ in range(TOPK):
            remaining = [d for d in by_sim if d not in selected]
            if not remaining:
                break
            best = min(
                remaining,
                key=lambda d: (-(LAM * by_sim[d] - (1 - LAM) *
                                 (max(psim[(d, s)] for s in selected)
                                  if selected else 0.0)), d))
            selected.append(best)
        for i, d in enumerate(selected, 1):
            out.append((qid, d, by_sim[d], i))
    return out


def compare(name, expected, out_dir, failures,
            cols="q_id, vec_id, sim, rn"):
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT {cols} FROM '{out_dir}/{name}/*.parquet'").fetchall()
    got = sorted(
        tuple(float(x) if isinstance(x, float) else int(x) for x in r)
        for r in raw)
    expected = sorted(expected)
    if got != expected:
        gs, es = set(got), set(expected)
        failures.append(
            f"{name}: {len(es - gs)} rows only in python, "
            f"{len(gs - es)} only in dump; e.g. {sorted(es ^ gs)[:4]}")
    print(f"{name}: {len(expected)} ranked rows vs python replay: "
          f"{'OK' if got == expected else 'MISMATCH'}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_check_all"
    corpus = load_corpus(sf_dir)
    failures = []
    buckets = sem_buckets(corpus)  # shared by s08 and d10
    compare("s03_ivf_ann", s03_expected(corpus), out_dir, failures)
    compare("s06_pq_ann", s06_expected(corpus), out_dir, failures)
    compare("s08_knn_graph", s08_expected(buckets), out_dir, failures,
            cols="vec_id, nn_id, sim, rank")
    compare("s14_sq8_ann", s14_expected(corpus), out_dir, failures)
    compare("d10_semantic_dedup", d10_expected(buckets), out_dir, failures,
            cols="cent_id, n_vecs, n_dropped")
    compare("s15_mmr_diversify", s15_expected(corpus), out_dir, failures,
            cols="q_id, vec_id, sim, mmr_rank")
    if failures:
        print("codebook_oracle: FAIL")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    print("codebook_oracle: s03 (IVF), s06 (PQ), s08 (kNN graph), "
          "s14 (SQ8), d10 (SemDeDup), s15 (MMR) all match")


if __name__ == "__main__":
    main()
