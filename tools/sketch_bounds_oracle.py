#!/usr/bin/env python3
"""Property-based cross-engine bound compare for the three engine-internal
sketches (round-8 verdict item 2) — the only queries with no DuckDB oracle
because their OUTPUT is a sketch estimate no second engine reproduces
bit-for-bit. What a second engine CAN check is the published accuracy
contract, against its own exact computation:

 - q34_percentile_approx: Spark's ApproximatePercentile (Greenwald-Khanna
   variant) guarantees the returned value's exact rank r satisfies
   |r - p*N| <= N/accuracy (accuracy=10000 in the query). DuckDB computes
   the exact order statistics at the window edges; the Spark estimate must
   lie between them (±0.005 for the round(.,2) in the query).
 - q42_approx_distinct: HLL++ with rsd=0.02. DuckDB computes the exact
   per-group distinct counts; the estimate must sit within 3.5*rsd (a 3.5σ
   bound on the published standard error — deterministic here since the
   hash is fixed, so a pass is stable run-to-run).
 - q91_sketch_union: Datasketches HLL, default lgK=12 → rsd ≈ 1.04/2^6 ≈
   1.625%. est_union and est_direct must sit within 3.5*rsd of DuckDB's
   exact total distinct; the three EXACT output columns (n_groups,
   exact_total, max_group_exact) must match DuckDB exactly — they are
   countDistinct results, not estimates.

Usage: sketch_bounds_oracle.py <sfDir> <verifyOutDir>
Exits nonzero if any estimate falls outside its published bound or any
exact column mismatches.
"""
import math
import sys

import duckdb

Q34_ACCURACY = 10000
Q42_RSD = 0.02
Q91_RSD = 1.04 / math.sqrt(2 ** 12)  # Datasketches HLL default lgK=12
SIGMA = 3.5


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    failures = 0

    # --- q34: GK rank-error window ---------------------------------
    n = con.sql(f"SELECT count(*) FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    eps_ranks = n / Q34_ACCURACY
    spark34 = con.sql(
        f"SELECT p25, p50, p75 FROM "
        f"'{out_dir}/q34_percentile_approx/*.parquet'").fetchone()
    for (p, est) in zip((0.25, 0.5, 0.75), spark34):
        # ±2 extra ranks absorb the rank-definition ambiguity (floor vs
        # ceil of p*N) across GK implementations; the guarantee itself
        # is the eps_ranks term.
        lo_rank = max(1, math.floor(p * n - eps_ranks) - 2)
        hi_rank = min(n, math.ceil(p * n + eps_ranks) + 2)
        lo, hi = [con.sql(
            f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet' "
            f"ORDER BY o_totalprice LIMIT 1 OFFSET {r - 1}").fetchone()[0]
            for r in (lo_rank, hi_rank)]
        if lo - 0.005 <= est <= hi + 0.005:
            print(f"OK   q34 p{int(p*100)}: {est} within exact-rank window "
                  f"[{lo}, {hi}] (ranks {lo_rank}..{hi_rank} of {n})")
        else:
            failures += 1
            print(f"FAIL q34 p{int(p*100)}: {est} outside [{lo}, {hi}]")

    # --- q42: HLL++ rsd bound per group ----------------------------
    exact42 = {r[0]: (r[1], r[2]) for r in con.sql(
        f"SELECT l_returnflag, count(DISTINCT l_partkey), "
        f"count(DISTINCT l_suppkey) FROM '{sf_dir}/lineitem.parquet' "
        f"GROUP BY 1").fetchall()}
    spark42 = con.sql(
        f"SELECT grp, approx_parts, approx_supps FROM "
        f"'{out_dir}/q42_approx_distinct/*.parquet' ORDER BY grp").fetchall()
    for grp, ap, asup in spark42:
        for est, exact, what in ((ap, exact42[grp][0], "parts"),
                                 (asup, exact42[grp][1], "supps")):
            rel = abs(est - exact) / exact
            if rel <= SIGMA * Q42_RSD:
                print(f"OK   q42 {grp}/{what}: est {est} vs exact {exact} "
                      f"(rel err {rel:.4f} <= {SIGMA * Q42_RSD:.4f})")
            else:
                failures += 1
                print(f"FAIL q42 {grp}/{what}: est {est} vs exact {exact} "
                      f"(rel err {rel:.4f} > {SIGMA * Q42_RSD:.4f})")

    # --- q91: exact columns equal, estimates within rsd bound ------
    n_groups, exact_total = con.sql(
        f"SELECT count(DISTINCT l_returnflag), count(DISTINCT l_partkey) "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchone()
    max_group = con.sql(
        f"SELECT max(d) FROM (SELECT count(DISTINCT l_partkey) AS d "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY l_returnflag)").fetchone()[0]
    s91 = con.sql(
        f"SELECT n_groups, est_union, est_direct, exact_total, "
        f"max_group_exact FROM "
        f"'{out_dir}/q91_sketch_union/*.parquet'").fetchone()
    exacts = ((s91[0], n_groups, "n_groups"),
              (s91[3], exact_total, "exact_total"),
              (s91[4], max_group, "max_group_exact"))
    for got, want, what in exacts:
        if got == want:
            print(f"OK   q91 {what}: {got} == DuckDB exact")
        else:
            failures += 1
            print(f"FAIL q91 {what}: spark {got} vs DuckDB exact {want}")
    for est, what in ((s91[1], "est_union"), (s91[2], "est_direct")):
        rel = abs(est - exact_total) / exact_total
        if rel <= SIGMA * Q91_RSD:
            print(f"OK   q91 {what}: {est} vs exact {exact_total} "
                  f"(rel err {rel:.4f} <= {SIGMA * Q91_RSD:.4f})")
        else:
            failures += 1
            print(f"FAIL q91 {what}: {est} vs exact {exact_total} "
                  f"(rel err {rel:.4f} > {SIGMA * Q91_RSD:.4f})")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
