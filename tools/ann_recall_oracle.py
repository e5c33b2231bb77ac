#!/usr/bin/env python3
"""Cross-engine recomputation of the ANN recall audits (round-6 verdict
item 7): s02's LSH result, s09's per-query recall@5, and s16's full
probe-budget curve, rebuilt OUTSIDE the JVM and compared against the
graft.Verify dumps.

The split of labor mirrors what each engine can check honestly:
 - the rh_bucket LSH kernel (sign of vec . w(plane) with splitmix64-
   derived hyperplanes) is reimplemented here in pure Python from the
   documented algorithm (HashPropertySpec pins the same kernel against
   published splitmix64 vectors, so this is a third implementation);
 - the exact-similarity legs — ground-truth top-5 per query and the
   in-bucket candidate rankings — run in DuckDB (round(sim, 4),
   vec_id tie-break: the s01 oracle spelling already proven bit-stable
   cross-engine);
 - the recall percentages are the same exact half-up integer arithmetic
   both sides compute.
So the recall DENOMINATORS (the exact ground truth) and the percentages
are cross-engine-checked even though the s02/s16 driver entries stay
rows-only.

Usage: ann_recall_oracle.py <sfDir> <verifyOutDir>
Exits nonzero on any mismatch with the s02/s09/s16 dumps.
"""
import sys

import duckdb

M64 = (1 << 64) - 1
PLANES = 8
SEED = 7
NQUERIES = 10
TOPK = 5
BUDGETS = [1, 3, 5, 9]


def mix64(x):
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return (x ^ (x >> 31)) & M64


def rh_bucket(vec, planes=PLANES, seed=SEED):
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


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'")
    # prepped corpus: double vectors, zero-norm filtered (Similarity's rule)
    con.sql("""CREATE TEMP TABLE c AS
        SELECT vec_id, embedding::DOUBLE[] AS vec
        FROM embeddings
        WHERE sqrt(list_dot_product(embedding::DOUBLE[],
                                    embedding::DOUBLE[])) > 0""")
    rows = con.sql("SELECT vec_id, vec FROM c ORDER BY vec_id").fetchall()
    buckets = [(vid, rh_bucket(vec)) for vid, vec in rows]
    con.sql("CREATE TEMP TABLE b (vec_id BIGINT, bucket INT)")
    con.executemany("INSERT INTO b VALUES (?, ?)", buckets)

    # exact ground truth: per-query top-5 (self included), s01 spelling
    con.sql(f"""CREATE TEMP TABLE truth AS
        SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(v.vec, q.vec), 4) DESC,
                       v.vec_id) AS rn
          FROM c v, c q WHERE q.vec_id < {NQUERIES})
        WHERE rn <= {TOPK}""")

    failures = 0

    # --- s02: single-bucket LSH top-5, ranked in DuckDB over Python
    # buckets, vs the Spark dump -----------------------------------
    s02 = con.sql(f"""
        SELECT q_id, vec_id, sim, rn FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS vec_id,
            round(list_cosine_similarity(cv.vec, cq.vec), 4) AS sim,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(cv.vec, cq.vec), 4)
                DESC, v.vec_id) AS rn
          FROM b v JOIN b q ON v.bucket = q.bucket
          JOIN c cv ON cv.vec_id = v.vec_id
          JOIN c cq ON cq.vec_id = q.vec_id
          WHERE q.vec_id < {NQUERIES})
        WHERE rn <= {TOPK} ORDER BY q_id, rn""").fetchall()
    spark_s02 = con.sql(
        f"SELECT q_id, vec_id, sim, rn FROM '{out_dir}/s02_lsh_ann/*.parquet' "
        f"ORDER BY q_id, rn").fetchall()
    if s02 != spark_s02:
        failures += 1
        print(f"FAIL s02: {len(s02)} recomputed vs {len(spark_s02)} spark")
    else:
        print(f"OK   s02_lsh_ann fully recomputed ({len(s02)} rows)")

    # --- s09: recall@5 of the s02 result vs the DuckDB truth --------
    con.sql("CREATE TEMP TABLE s02r (q_id BIGINT, vec_id BIGINT)")
    con.executemany("INSERT INTO s02r VALUES (?, ?)",
                    [(r[0], r[1]) for r in s02])
    s09 = con.sql("""
        SELECT t.q_id, count(*) AS k,
          count(s.vec_id) AS n_hit,
          (200 * count(s.vec_id) + count(*)) // (2 * count(*)) AS recall_x100
        FROM truth t LEFT JOIN s02r s USING (q_id, vec_id)
        GROUP BY t.q_id ORDER BY t.q_id""").fetchall()
    spark_s09 = con.sql(
        f"SELECT q_id, k, n_hit, recall_x100 FROM "
        f"'{out_dir}/s09_recall_eval/*.parquet' ORDER BY q_id").fetchall()
    if s09 != spark_s09:
        failures += 1
        print(f"FAIL s09: recomputed {s09} vs spark {spark_s09}")
    else:
        print(f"OK   s09_recall_eval recomputed ({len(s09)} queries, "
              f"denominators from DuckDB truth)")

    # --- s16: full probe-budget curve ------------------------------
    qb = {vid: bk for vid, bk in buckets if vid < NQUERIES}
    curve = []
    for p in BUDGETS:
        probes = []
        for q, bk in qb.items():
            seq = [bk] + [bk ^ (1 << i) for i in range(PLANES)]
            probes += [(q, pb) for pb in seq[:p]]
        con.sql("CREATE OR REPLACE TEMP TABLE probes (q_id BIGINT, bucket INT)")
        con.executemany("INSERT INTO probes VALUES (?, ?)", probes)
        row = con.sql(f"""
            WITH cand AS (
              SELECT DISTINCT p.q_id, b.vec_id
              FROM probes p JOIN b ON b.bucket = p.bucket)
            SELECT {p}::BIGINT,
              count(*) AS total_candidates,
              count(t.vec_id) AS n_hits,
              (200 * count(t.vec_id) + {NQUERIES * TOPK})
                // (2 * {NQUERIES * TOPK}) AS recall_pct
            FROM cand LEFT JOIN truth t USING (q_id, vec_id)""").fetchall()[0]
        curve.append(tuple(row))
    spark_s16 = [tuple(r) for r in con.sql(
        f"SELECT n_probes, total_candidates, n_hits, recall_pct FROM "
        f"'{out_dir}/s16_probe_curve/*.parquet' ORDER BY n_probes").fetchall()]
    if curve != spark_s16:
        failures += 1
        print(f"FAIL s16: recomputed {curve} vs spark {spark_s16}")
    else:
        print(f"OK   s16_probe_curve fully recomputed ({curve})")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
