#!/usr/bin/env python3
"""g03 triangle-count DuckDB oracle for LARGE SFs (sf1/sf10 audit path).

The driver-graded g03 oracle is the naive a<b<c 3-join — deliberately a
different enumeration than the engine's. At sf10 its wedge mass (~4.1 B
rows) exceeds this box's disk when DuckDB picks a plan that buffers the
two-edge join (the round-5 documented boundary). This tool is the
round-6 MATERIALIZED-stage recipe applied to g03: every relation that is
safe to materialize (distinct items, undirected edge set, degrees, the
(deg, id) total-order rank, the ORIENTED edge list, the triangle list)
becomes a temp table, and the only large intermediate — the oriented
wedge stream — is bounded by construction: orientation caps out-degree
at O(sqrt(m)) (Cohen / Suri-Vassilvitskii), so the wedge mass is
O(m^1.5) instead of sum(deg^2).

Independence note, stated honestly: this path shares the ORIENTATION
IDEA with the engine (the driver-graded naive 3-join stays the
independent-algorithm oracle at its SFs); it remains an independent
ENGINE and an independent implementation (rank-space edges via a window
function, closure by rank join), so it still cross-checks arithmetic,
joins, and aggregation — only the asymptotic trick is shared.

Usage: g03_oracle_tt.py <sfDir> <verifyOutDir>
Compares against <verifyOutDir>/g03_triangle_count written by
graft.Verify at the same SF. Exits nonzero on any mismatch.
"""
import sys

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")

    con.sql("""CREATE TEMP TABLE items AS
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem""")
    con.sql("""CREATE TEMP TABLE e AS
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM items x JOIN items y USING (l_orderkey)
        WHERE x.l_partkey < y.l_partkey""")
    con.sql("""CREATE TEMP TABLE deg AS
        SELECT node, count(*) AS d FROM (
          SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node""")
    # dense (deg, id) total-order rank: the orientation's vertex order
    con.sql("""CREATE TEMP TABLE rk AS
        SELECT node, row_number() OVER (ORDER BY d, node) AS r FROM deg""")
    # oriented edges in RANK space: low rank -> high rank
    con.sql("""CREATE TEMP TABLE o AS
        SELECT CASE WHEN ra.r < rb.r THEN ra.r ELSE rb.r END AS src,
               CASE WHEN ra.r < rb.r THEN rb.r ELSE ra.r END AS dst
        FROM e JOIN rk ra ON ra.node = e.a JOIN rk rb ON rb.node = e.b""")
    # each triangle enumerated exactly once at its rank-minimum vertex:
    # edges x->y, x->z (y before z), closed by the oriented edge y->z
    con.sql("""CREATE TEMP TABLE tri AS
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM o e1
        JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst""")
    rows = con.sql("""
        SELECT rk.node AS part_key, count(*) AS n_triangles FROM (
          SELECT x AS r FROM tri
          UNION ALL SELECT y AS r FROM tri
          UNION ALL SELECT z AS r FROM tri) t
        JOIN rk ON rk.r = t.r
        GROUP BY 1 ORDER BY 1""").fetchall()
    spark = con.sql(
        f"SELECT part_key, n_triangles FROM "
        f"'{out_dir}/g03_triangle_count/*.parquet' ORDER BY 1").fetchall()
    ok = rows == spark
    print(("OK  " if ok else "FAIL") +
          f" g03 oriented-oracle nodes={len(rows)} spark={len(spark)} " +
          f"triangles_x3={sum(r[1] for r in rows)}")
    if not ok:
        diff = set(rows) ^ set(spark)
        print(f"  first differing rows: {sorted(diff)[:5]}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
