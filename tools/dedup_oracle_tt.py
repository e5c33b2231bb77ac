#!/usr/bin/env python3
"""Exact-pair dedup-family DuckDB oracle for LARGE SFs (sf3+ audit path).

The driver-graded twins for d04/d06/d12/d15/d16 each inline the exact
all-pairs 3-gram Jaccard relation as a `WITH nd_pairs AS MATERIALIZED
(...)` CTE — correct and single-statement (the driver protocol), but the
relation is O(n²) by construction and each of the five queries
RE-MATERIALIZES it. At sf3 that's 5 × ~217M pre-aggregation pair-rows
(427 CPU-min, past the round-11 compare budget); at sf6 one
materialization alone hit 112 GB RSS + 67 GB spill (SURVEY §8j item 10).

This tool is the round-5 temp-table remedy applied ACROSS queries: the
pair relation materializes ONCE as a DuckDB temp table shared by all
five twins, and the min-label connected-components run as a Python
fixpoint loop over temp tables (exact for ANY cluster diameter, vs the
in-query 16-round unroll that is exact only up to diameter 16 — both
exceed any real cluster here). 1 expensive build + 5 cheap
re-aggregations instead of 5 expensive builds.

Independence note, stated honestly (the g03_oracle_tt precedent): this
path shares the pair-relation RECIPE with the driver-graded twins (which
stay the independent single-statement oracles at their SFs); it remains
an independent engine and an independent execution strategy, so it still
cross-checks the gram derivation, join/group arithmetic, survivorship
windows, and rollups at SFs the single-statement protocol cannot reach.

Usage: dedup_oracle_tt.py <sfDir> <verifyOutDir> [query ...]
Compares against <verifyOutDir>/<query>/ parquet written by graft.Verify
at the same SF. Default: all five. Exits nonzero on any mismatch.
"""
import sys
import time

import duckdb

# mirrors Dedup.D16Thresholds
D16_THRESHOLDS = [3, 5, 7, 9]
MAX_CC_ROUNDS = 64  # loud-failure bound, far above any cluster diameter

# the d04 exact all-pairs relation (string 3-grams, short-doc fallback),
# J >= 0.3 in exact rationals — the same recipe as Dedup.D04PairsSql
PAIRS_SQL = r"""
WITH toks AS (SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS tk FROM documents),
g AS (SELECT DISTINCT doc_id, g FROM (
   SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
   FROM toks, UNNEST(range(1, len(tk) - 1)) AS t(i)
   WHERE len(tk) >= 3
   UNION ALL
   SELECT doc_id, array_to_string(tk, ' ') FROM toks
   WHERE len(tk) < 3)),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    count(*) AS s
  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, n_shared, n_union,
  (20000 * n_shared + n_union) // (2 * n_union) AS jaccard_x1e4
FROM (
  SELECT doc_a, doc_b, s AS n_shared,
    sa.n + sb.n - s AS n_union
  FROM shared JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b)
WHERE n_shared * 10 >= n_union * 3"""

QUAL_SQL = r"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntk
FROM documents"""


def min_label_cc(con, pairs_where, tag):
    """Converged min-label (node, l) temp table `lbl_<tag>` over the
    undirected pair graph `nd_pairs WHERE <pairs_where>` — the Python
    fixpoint twin of Dedup.minLabelCteSql's unrolled rounds."""
    con.sql(f"""CREATE OR REPLACE TEMP TABLE edges_{tag} AS
        SELECT doc_a AS src, doc_b AS dst FROM nd_pairs WHERE {pairs_where}
        UNION ALL
        SELECT doc_b, doc_a FROM nd_pairs WHERE {pairs_where}
        UNION ALL
        SELECT DISTINCT src, src FROM (
          SELECT doc_a AS src FROM nd_pairs WHERE {pairs_where}
          UNION ALL SELECT doc_b FROM nd_pairs WHERE {pairs_where})""")
    con.sql(f"""CREATE OR REPLACE TEMP TABLE lbl_{tag} AS
        SELECT DISTINCT src AS node, src AS l FROM edges_{tag}""")
    for rnd in range(MAX_CC_ROUNDS):
        con.sql(f"""CREATE OR REPLACE TEMP TABLE lbl_next_{tag} AS
            SELECT e.dst AS node, min(r.l) AS l
            FROM edges_{tag} e JOIN lbl_{tag} r ON e.src = r.node
            GROUP BY e.dst""")
        changed = con.sql(f"""SELECT count(*) FROM lbl_next_{tag} n
            JOIN lbl_{tag} o USING (node)
            WHERE n.l <> o.l""").fetchone()[0]
        con.sql(f"CREATE OR REPLACE TEMP TABLE lbl_{tag} AS "
                f"SELECT * FROM lbl_next_{tag}")
        if changed == 0:
            print(f"  cc[{tag}] converged after {rnd + 1} rounds")
            return
    sys.exit(f"cc[{tag}] did NOT converge in {MAX_CC_ROUNDS} rounds — "
             "graph larger-diameter than any expected cluster; failing loud")


def oracle_queries(con):
    """query name -> SQL over the shared temp tables (built lazily)."""
    return {
        "d04_ngram_jaccard":
            "SELECT doc_a, doc_b, n_shared, n_union, jaccard_x1e4 "
            "FROM nd_pairs ORDER BY doc_a, doc_b",
        "d12_threshold_curve": """
            WITH th AS (SELECT CAST(UNNEST(range(3, 10)) AS BIGINT)
                          AS threshold_x10),
            at AS (SELECT threshold_x10, doc_a, doc_b FROM nd_pairs, th
                   WHERE n_shared * 10 >= n_union * threshold_x10)
            SELECT threshold_x10, n_pairs, n_docs FROM
              (SELECT threshold_x10, count(*) AS n_pairs FROM at
               GROUP BY 1) a
              JOIN
              (SELECT threshold_x10, CAST(count(DISTINCT d) AS BIGINT)
                 AS n_docs
               FROM (SELECT threshold_x10, UNNEST([doc_a, doc_b]) AS d
                     FROM at) GROUP BY 1) b
              USING (threshold_x10)
            ORDER BY threshold_x10""",
        "d06_dup_clusters": """
            SELECT l AS cluster_id, count(*) AS n_members,
              string_agg(CAST(node AS VARCHAR), ',' ORDER BY node)
                AS members
            FROM lbl_t3 GROUP BY l ORDER BY cluster_id""",
        "d15_neardup_survivor": """
            WITH ranked AS (
              SELECT lbl.l, lbl.node, qual.ntk,
                row_number() OVER (PARTITION BY lbl.l
                  ORDER BY qual.ntk DESC, lbl.node) AS q_rn,
                row_number() OVER (PARTITION BY lbl.l ORDER BY lbl.node)
                  AS n_rn,
                count(*) OVER (PARTITION BY lbl.l) AS n_members
              FROM lbl_t3 lbl JOIN qual ON lbl.node = qual.doc_id)
            SELECT b.l AS cluster_id,
              CAST(b.n_members AS BIGINT) AS n_members,
              b.node AS survivor_id, n.node AS naive_id,
              CAST(CASE WHEN b.node <> n.node THEN 1 ELSE 0 END AS BIGINT)
                AS changed,
              b.ntk AS survivor_ntk, n.ntk AS naive_ntk
            FROM (SELECT * FROM ranked WHERE q_rn = 1) b
            JOIN (SELECT * FROM ranked WHERE n_rn = 1) n ON b.l = n.l
            ORDER BY cluster_id""",
        "d16_threshold_dedup": """
            WITH all_lbl AS ({unions}),
            ranked AS (
              SELECT threshold_x10, all_lbl.l, all_lbl.node, qual.ntk,
                row_number() OVER (PARTITION BY threshold_x10, all_lbl.l
                  ORDER BY qual.ntk DESC, all_lbl.node) AS q_rn,
                row_number() OVER (PARTITION BY threshold_x10, all_lbl.l
                  ORDER BY all_lbl.node) AS n_rn,
                count(*) OVER (PARTITION BY threshold_x10, all_lbl.l)
                  AS n_members
              FROM all_lbl JOIN qual ON all_lbl.node = qual.doc_id)
            SELECT b.threshold_x10,
              CAST(count(*) AS BIGINT) AS n_clusters,
              CAST(sum(b.n_members) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN b.node <> n.node THEN 1 ELSE 0 END)
                AS BIGINT) AS changed_survivors,
              CAST(sum(b.ntk) AS BIGINT) AS survivor_tokens,
              CAST(sum(n.ntk) AS BIGINT) AS naive_tokens,
              CAST(sum(CASE WHEN b.n_members = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS h_2,
              CAST(sum(CASE WHEN b.n_members BETWEEN 3 AND 4
                THEN 1 ELSE 0 END) AS BIGINT) AS h_3_4,
              CAST(sum(CASE WHEN b.n_members BETWEEN 5 AND 8
                THEN 1 ELSE 0 END) AS BIGINT) AS h_5_8,
              CAST(sum(CASE WHEN b.n_members BETWEEN 9 AND 16
                THEN 1 ELSE 0 END) AS BIGINT) AS h_9_16,
              CAST(sum(CASE WHEN b.n_members >= 17 THEN 1 ELSE 0 END)
                AS BIGINT) AS h_17p
            FROM (SELECT * FROM ranked WHERE q_rn = 1) b
            JOIN (SELECT * FROM ranked WHERE n_rn = 1) n
              ON b.threshold_x10 = n.threshold_x10 AND b.l = n.l
            GROUP BY b.threshold_x10 ORDER BY b.threshold_x10""".format(
            unions="\n  UNION ALL ".join(
                f"SELECT CAST({t} AS BIGINT) AS threshold_x10, node, l "
                f"FROM lbl_t{t}" for t in D16_THRESHOLDS)),
    }


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = oracle_queries(None)
    names = sys.argv[3:] or list(queries)
    unknown = set(names) - set(queries)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}")

    con = duckdb.connect()
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")

    t0 = time.time()
    print("building nd_pairs (the ONE expensive materialization)...")
    con.sql(f"CREATE TEMP TABLE nd_pairs AS {PAIRS_SQL}")
    n_pairs = con.sql("SELECT count(*) FROM nd_pairs").fetchone()[0]
    print(f"  nd_pairs: {n_pairs} rows in {time.time() - t0:.1f}s")
    con.sql(f"CREATE TEMP TABLE qual AS {QUAL_SQL}")

    # labelings: τ=3 serves d06/d15 and d16's first leg; 5/7/9 are d16's
    need_cc = [3] if any(n in names for n in
                         ("d06_dup_clusters", "d15_neardup_survivor")) else []
    if "d16_threshold_dedup" in names:
        need_cc = sorted(set(need_cc) | set(D16_THRESHOLDS))
    for tau in need_cc:
        min_label_cc(con, f"n_shared * 10 >= n_union * {tau}", f"t{tau}")

    failures = []
    for name in names:
        tq = time.time()
        oracle = con.sql(queries[name])
        cols = oracle.columns
        orows = oracle.fetchall()
        srows = con.sql(
            "SELECT " + ", ".join(cols) +
            f" FROM '{out_dir}/{name}/*.parquet' ORDER BY 1"
        ).fetchall()
        # oracle SQL already ORDER BYs its first column(s); normalize both
        orows = sorted(orows, key=lambda r: tuple(str(x) for x in r))
        srows = sorted(srows, key=lambda r: tuple(str(x) for x in r))
        if orows == srows:
            print(f"OK    {name} ({len(orows)} rows, "
                  f"{time.time() - tq:.1f}s)")
        else:
            diff = set(orows) ^ set(srows)
            failures.append(name)
            print(f"FAIL  {name}: oracle={len(orows)} spark={len(srows)} "
                  f"rows; first differing: {sorted(diff, key=str)[:3]}")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match "
          f"(total {time.time() - t0:.1f}s)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
