#!/usr/bin/env python3
"""g04/g05 DuckDB oracle via MATERIALIZED per-round temp tables.

The driver-shaped single-query oracles unroll the g04/g05 fixed-point
rounds as nested CTEs; at sf10 DuckDB plans the whole unroll as one
pipeline and its intermediate state spills past this box's disk (the
round-5 documented boundary). This tool executes the SAME integer
arithmetic round by round, materializing each round's label/distance
relation as a temp table and dropping the previous one — peak footprint
is ONE round's O(nodes) relation plus the edge list, so the
recomputation fits where the nested unroll could not. Semantically
identical: each CREATE TABLE is the exact CTE body of the corresponding
round.

Usage: graph_oracle_tt.py <sfDir> <verifyOutDir>
Compares against the <verifyOutDir>/g04_label_propagation and
<verifyOutDir>/g05_bfs_hops parquet dumps written by graft.Verify at the
same SF. Exits nonzero on any mismatch.
"""
import os
import sys

import duckdb

LPA_ROUNDS = 4
BFS_ROUNDS = 8


def canon(rows):
    return sorted(tuple(r) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")

    con.sql("""CREATE TEMP TABLE pairs AS
        SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey""")
    con.sql("""CREATE TEMP TABLE edges AS
        SELECT src, dst FROM pairs
        UNION ALL SELECT dst AS src, src AS dst FROM pairs""")
    con.sql("DROP TABLE pairs")
    con.sql("""CREATE TEMP TABLE edges_cc AS
        SELECT src, dst FROM edges
        UNION ALL SELECT DISTINCT src, src AS dst FROM edges""")

    failures = 0

    # ---- g04: synchronous LPA, argmax by (count desc, label) ----
    con.sql("CREATE TEMP TABLE l_prev AS "
            "SELECT DISTINCT src AS node, src AS l FROM edges")
    for i in range(LPA_ROUNDS):
        con.sql("""CREATE TEMP TABLE l_next AS
            SELECT dst AS node, l FROM (
              SELECT e.dst, r.l, count(*) AS c,
                row_number() OVER (PARTITION BY e.dst
                  ORDER BY count(*) DESC, r.l) AS rn
              FROM edges_cc e JOIN l_prev r ON e.src = r.node
              GROUP BY e.dst, r.l)
            WHERE rn = 1""")
        con.sql("DROP TABLE l_prev")
        con.sql("ALTER TABLE l_next RENAME TO l_prev")
        print(f"[g04] round {i + 1}/{LPA_ROUNDS} materialized", flush=True)
    got = canon(con.sql(
        """SELECT l AS community, count(*) AS n_members,
             CAST(sum(node) AS BIGINT) AS members_sum
           FROM l_prev GROUP BY l ORDER BY community""").fetchall())
    want = canon(con.sql(
        f"SELECT community, n_members, members_sum FROM "
        f"'{out_dir}/g04_label_propagation/*.parquet'").fetchall())
    ok = got == want
    print(f"{'OK  ' if ok else 'FAIL'}  g04_label_propagation "
          f"({len(got)} rows)", flush=True)
    failures += 0 if ok else 1
    con.sql("DROP TABLE l_prev")

    # ---- g05: multi-source BFS min-plus over weighted edges ----
    con.sql("""CREATE TEMP TABLE edges_w AS
        SELECT src, dst, 1 AS w FROM edges
        UNION ALL SELECT DISTINCT src, src AS dst, 0 AS w FROM edges""")
    con.sql("""CREATE TEMP TABLE d_prev AS
        SELECT DISTINCT src AS node, 0 AS d FROM edges
        WHERE src % 2 = 0 AND src <= 10""")
    for i in range(BFS_ROUNDS):
        con.sql("""CREATE TEMP TABLE d_next AS
            SELECT e.dst AS node, min(r.d + e.w) AS d
            FROM edges_w e JOIN d_prev r ON e.src = r.node
            GROUP BY e.dst""")
        con.sql("DROP TABLE d_prev")
        con.sql("ALTER TABLE d_next RENAME TO d_prev")
        print(f"[g05] round {i + 1}/{BFS_ROUNDS} materialized", flush=True)
    got = canon(con.sql(
        """SELECT CAST(d AS BIGINT) AS hops, count(*) AS n_nodes,
             CAST(sum(node) AS BIGINT) AS nodes_sum
           FROM d_prev GROUP BY d ORDER BY hops""").fetchall())
    want = canon(con.sql(
        f"SELECT hops, n_nodes, nodes_sum FROM "
        f"'{out_dir}/g05_bfs_hops/*.parquet'").fetchall())
    ok = got == want
    print(f"{'OK  ' if ok else 'FAIL'}  g05_bfs_hops ({len(got)} rows)",
          flush=True)
    failures += 0 if ok else 1

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
