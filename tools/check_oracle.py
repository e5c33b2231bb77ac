#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views named
after the tables in <sfDir>, then compares: columns sorted by name, COLUMN
TYPES (exact DuckDB type string — BIGINT vs HUGEINT and DECIMAL widths
matter, replicating the driver's type-sensitive hash), rows sorted, exact
value equality (floats compared exactly — queries are expected to round on
both sides). Exits nonzero on any mismatch.
"""
import json
import math
import os
import re
import sys

import duckdb

# Widest decimal that parquet stores as int64 in both engines. Wider
# decimals are physically decimal128 fixed-len byte arrays in Spark but
# HUGEINT-backed in DuckDB, and the driver's typed hash diverges on that
# representation even when every value is identical (round-2 q59/q62).
# Policy: result schemas must not carry a DECIMAL wider than this —
# scale to BIGINT (cents) or round to DOUBLE instead.
MAX_DECIMAL_PRECISION = 18

DECIMAL_RE = re.compile(r"DECIMAL\((\d+),\s*(\d+)\)")


def wide_decimals(cols, types):
    out = {}
    for c, t in zip(cols, types):
        m = DECIMAL_RE.search(str(t))
        if m and int(m.group(1)) > MAX_DECIMAL_PRECISION:
            out[c] = str(t)
    return out

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # spill outside the repo: DuckDB's default temp dir is ./.tmp, which
    # lands in the checkout (a large-SF oracle once spilled 46 GB there)
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Optional 3rd arg: comma-separated query names for targeted iteration
    # (pairs with Verify's SPARK_GRAFT_VERIFY_ONLY filter). Unknown names
    # are an error — a typo'd filter must not produce a vacuous all-pass.
    if len(sys.argv) > 3:
        only = {n.strip() for n in sys.argv[3].split(",") if n.strip()}
        unknown = only - set(oracles)
        if unknown:
            sys.exit(f"unknown query name(s) in filter: {sorted(unknown)}")
        oracles = {k: v for k, v in oracles.items() if k in only}

    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            failures.append((name, "spark output missing"))
            continue
        try:
            duck = con.sql(sql)
            dcols, dtypes = duck.columns, [str(t) for t in duck.types]
            drows = duck.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
            scols, stypes = sp.columns, [str(t) for t in sp.types]
            srows = sp.fetchall()
        except Exception as e:
            failures.append((name, f"spark result read error: {e}"))
            continue
        wide = wide_decimals(scols, stypes)
        if wide:
            failures.append((name, "result schema carries a driver-hash-unstable "
                             f"DECIMAL wider than ({MAX_DECIMAL_PRECISION},x): " +
                             ", ".join(f"{c}={t}" for c, t in sorted(wide.items())) +
                             " — emit BIGINT cents or DOUBLE instead"))
            continue
        if sorted(dcols) != sorted(scols):
            failures.append((name, f"columns differ: spark={sorted(scols)} oracle={sorted(dcols)}"))
            continue
        # Type gate: the driver hashes a typed serialization, so value-equal
        # results with different physical types (DuckDB HUGEINT vs Spark
        # BIGINT, DECIMAL(38,x) vs (28,x)) are driver failures. Compare the
        # exact DuckDB type string per column name on both sides.
        dtype_by = dict(zip(dcols, dtypes))
        stype_by = dict(zip(scols, stypes))
        type_diff = {c: (stype_by[c], dtype_by[c]) for c in dtype_by
                     if stype_by[c] != dtype_by[c]}
        if type_diff:
            failures.append((name, "column types differ (spark, oracle): " +
                             ", ".join(f"{c}=({s}, {d})" for c, (s, d)
                                       in sorted(type_diff.items()))))
            continue
        dc, cols = canon(drows, dcols)
        sc, _ = canon(srows, scols)
        if len(dc) != len(sc):
            failures.append((name, f"row count differs: spark={len(sc)} oracle={len(dc)}"))
            continue
        bad = [(i, s, d) for i, (s, d) in enumerate(zip(sc, dc)) if s != d]
        if bad:
            i, s, d = bad[0]
            failures.append((name, f"{len(bad)}/{len(dc)} rows differ; first at {i} cols={cols}:\n  spark : {s}\n  oracle: {d}"))
        else:
            print(f"OK    {name} ({len(dc)} rows)")

    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
