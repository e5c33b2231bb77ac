#!/usr/bin/env python3
"""d17 fuzzy-join DuckDB oracle for LARGE SFs (sf1/sf3+ audit path).

The driver-graded d17 twin is the BRUTE length-banded all-pairs
levenshtein join — deliberately a different enumeration than the
engine's PassJoin blocking, and the recall gate at sf0.01/sf1. Its cost
is O(n²·L²) by construction: measured 13.9 s per 1.59M banded pairs in
DuckDB ⇒ ~67 min at sf1's 459M, ~40 h at sf6 (SURVEY §8j item 7) — the
only thing stopping d17 decade coverage past sf1.

This tool is the SCALED second oracle: the SAME PassJoin segment
blocking (Li/Deng/Feng/Wang, PVLDB 2011) spelled in DuckDB SQL over
temp tables. Recall is EXACT by pigeonhole (any ED≤2 pair shares one of
3 contiguous segments verbatim within a ±2 position window), so the
blocked enumeration provably returns the same relation as the brute
one — the brute twin stays the recall gate at the small SFs, and this
twin extends the decade sweep to SFs the brute cannot reach.

Independence note, stated honestly (the g03_oracle_tt precedent): this
path shares the BLOCKING IDEA with the engine; it remains an
independent engine (DuckDB vs Spark) and an independent implementation
(range-UNNEST key generation, temp-table staging vs Catalyst
higher-order functions), so it cross-checks the title derivation,
segment arithmetic, candidate join, and verify threshold — only the
asymptotic trick is shared.

Usage: d17_oracle_blocked.py <sfDir> <verifyOutDir>
Compares against <verifyOutDir>/d17_fuzzy_join written by graft.Verify
at the same SF. Exits nonzero on any mismatch.
"""
import sys
import time

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    t0 = time.time()

    # 8-token lowercase title key, 9-char minimum — the operator's exact
    # derivation (whitespace split of trimmed text, first 8, single-space
    # join, lower)
    con.sql(r"""CREATE TEMP TABLE f AS
        SELECT doc_id, title FROM (
          SELECT doc_id, lower(array_to_string(
            (string_split_regex(trim(text), '\s+'))[1:8], ' ')) AS title
          FROM documents)
        WHERE length(title) >= 9""")

    # index side: each title's 3 exact contiguous segments, keyed
    # (slot i, title length m, segment string s). Segment i starts at
    # 1 + i*(m div 3) + max(0, i - (3 - m mod 3)) and is (m div 3)
    # (+1 for the last (m mod 3) slots) long — shorter segments first,
    # the PassJoin convention the engine uses.
    con.sql("""CREATE TEMP TABLE idx AS
        SELECT doc_id AS doc_a, i, length(title) AS m,
          substring(title,
            CAST(1 + i * (length(title) // 3)
              + greatest(0, i - (3 - length(title) % 3)) AS INT),
            CAST((length(title) // 3)
              + CASE WHEN i >= 3 - length(title) % 3 THEN 1 ELSE 0 END
              AS INT)) AS s
        FROM f, UNNEST(range(0, 3)) AS u(i)""")

    # probe side: for every indexed length m within ±2 and every slot,
    # all substrings of the indexed segment's length starting within ±2
    # of its indexed position (the PassJoin position bound), distinct per
    # (doc, key)
    con.sql("""CREATE TEMP TABLE probe AS
        SELECT DISTINCT doc_b, i, m, substring(title,
            CAST(st + 1 AS INT), CAST(ln AS INT)) AS s
        FROM (
          SELECT doc_id AS doc_b, title, i,
            length(title) + dm AS m,
            i * ((length(title) + dm) // 3)
              + greatest(0, i - (3 - (length(title) + dm) % 3)) + sh AS st,
            ((length(title) + dm) // 3)
              + CASE WHEN i >= 3 - (length(title) + dm) % 3
                THEN 1 ELSE 0 END AS ln
          FROM f,
            UNNEST(range(-2, 3)) AS d(dm),
            UNNEST(range(0, 3)) AS u(i),
            UNNEST(range(-2, 3)) AS v(sh))
        WHERE m >= 9 AND st >= 0 AND st + ln <= length(title)""")

    # ONE equi-join on (slot, len, segment); probe side is the larger id
    # so each unordered pair appears once in its guaranteed direction
    con.sql("""CREATE TEMP TABLE cand AS
        SELECT DISTINCT idx.doc_a, probe.doc_b
        FROM idx JOIN probe
          ON idx.i = probe.i AND idx.m = probe.m AND idx.s = probe.s
        WHERE probe.doc_b > idx.doc_a""")
    n_cand = con.sql("SELECT count(*) FROM cand").fetchone()[0]

    rows = con.sql("""
        SELECT c.doc_a, c.doc_b,
          CAST(levenshtein(a.title, b.title) AS BIGINT) AS edit_dist
        FROM cand c
        JOIN f a ON a.doc_id = c.doc_a
        JOIN f b ON b.doc_id = c.doc_b
        WHERE levenshtein(a.title, b.title) <= 2
        ORDER BY doc_a, doc_b""").fetchall()
    spark = con.sql(
        f"SELECT doc_a, doc_b, edit_dist FROM "
        f"'{out_dir}/d17_fuzzy_join/*.parquet' "
        f"ORDER BY doc_a, doc_b").fetchall()
    ok = rows == spark
    print(("OK  " if ok else "FAIL") +
          f" d17 blocked-oracle pairs={len(rows)} spark={len(spark)} "
          f"candidates={n_cand} ({time.time() - t0:.1f}s)")
    if not ok:
        diff = set(rows) ^ set(spark)
        print(f"  first differing rows: {sorted(diff)[:5]}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
