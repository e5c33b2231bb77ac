#!/usr/bin/env python3
"""Exact-pair dedup-family DuckDB oracle for LARGE SFs (sf3+ audit path).

The driver-graded twins for d04/d06/d12/d15/d16 each inline the exact
all-pairs 3-gram Jaccard relation as a `WITH nd_pairs AS MATERIALIZED
(...)` CTE — correct and single-statement (the driver protocol), but the
relation is O(n²) by construction and each of the five queries
RE-MATERIALIZES it. At sf3 that's 5 × ~217M pre-aggregation pair-rows
(427 CPU-min, past the round-11 compare budget); at sf6 one
materialization alone hit 112 GB RSS + 67 GB spill (SURVEY §8j item 10).

This tool is the round-5 temp-table remedy applied ACROSS queries, with
two additions measured necessary by the first sf3 run (round 12):

1. FACTORIZED build. The scaled corpora replicate documents
   BYTE-IDENTICALLY (the sf3 corpus is 30 copies of each sf0.1 doc), so
   identical texts have identical gram sets and the pair relation
   FACTORIZES exactly: compute it once over DISTINCT texts (md5-grouped)
   and expand — cross-family pairs become a·b copies of one distinct
   pair, within-family pairs are C(a,2) rows at J=1. Pure algebra, no
   approximation; the unfactorized brute build (--brute) cross-validates
   it at small SFs. Measured: the sf3 build drops from 3068 s (brute,
   41 GB RSS) to seconds.

2. LAYERED compare honoring the operator's DECLARED domain. The d04
   scaladoc states the all-pairs compare applies where dup-group sizes
   ≤ MaxBucket (=64): above that, the engine's banding suppresses hot
   buckets BY CONTRACT (web-scale boilerplate protection). At sf3 the
   cross-family near-dup clusters reach 90 members, so the first run
   measured exactly that divergence (oracle 2,404,104 pairs vs Spark
   2,376,384 — every miss inside a >64-member component). The compare
   is therefore:
     (a) d04 ⊆ exact (no false pairs, any SF),
     (b) d04 ≡ exact restricted to components ≤ MaxBucket (the
         declared domain — the FULL relation at sf0.01/sf1),
     (c) every missing pair lies in a >MaxBucket component (the miss
         is the contract, nothing else),
     (d) d06/d12/d15/d16 ≡ independent DuckDB recomputation from the
         (a–c)-verified d04 relation — the downstream clustering /
         survivorship / rollup logic gated at full scale.

Independence note, stated honestly (the g03_oracle_tt precedent): this
path shares the pair-relation RECIPE with the driver-graded twins (which
stay the independent single-statement oracles at their SFs); it remains
an independent engine and an independent execution strategy, so it still
cross-checks the gram derivation, join/group arithmetic, survivorship
windows, and rollups at SFs the single-statement protocol cannot reach.

Usage: dedup_oracle_tt.py <sfDir> <verifyOutDir> [--brute]
       dedup_oracle_tt.py --selftest
Compares against <verifyOutDir>/<query>/ parquet written by graft.Verify
at the same SF. Exits nonzero on any mismatch.

GUARD (round-12 verdict task 3 / carry-forward 2): the factorized
path's PREMISE is byte-identical replication — true of every scale_up
corpus (factor 10/30/100), where it turns the sf3 build from 3068 s
into seconds. On a corpus WITHOUT replication (unreplicated base, or a
future generator that adds jitter so every near-dup is textually
unique) the factorization buys nothing: every md5 family is a
singleton, rep_pairs IS the full O(n²) brute relation, and the
"seconds" fast-path label silently carries the 41-GB brute cost (or
worse at sf10). The tool now measures the replication factor
(docs / md5-families) up front and REFUSES the factorized path when
it is under {MIN_FACTOR}x, telling the operator to opt into --brute
consciously. It also asserts count(DISTINCT md5(text)) ==
count(DISTINCT text) — an md5 collision would silently merge two
distinct texts into one family and corrupt the algebra; failing loud
beats a one-in-2^64 wrong answer. --selftest exercises both paths:
a replicated corpus (guard admits, factorized ≡ brute bit-for-bit)
and a jittered one (guard refuses, --brute proceeds).
"""
import sys
import time

import duckdb

MAX_BUCKET = 64  # mirrors Dedup.MaxBucket
D16_THRESHOLDS = [3, 5, 7, 9]  # mirrors Dedup.D16Thresholds
MAX_CC_ROUNDS = 64  # loud-failure bound, far above any cluster diameter

# the d04 gram derivation (string 3-grams, short-doc fallback) over a
# relation named `src(doc_id, text)` — the same recipe as
# Dedup.D04PairsSql, parameterized so it can run over distinct texts
GRAMS_SQL = r"""
WITH toks AS (SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS tk FROM src)
SELECT DISTINCT doc_id, g FROM (
   SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
   FROM toks, UNNEST(range(1, len(tk) - 1)) AS t(i)
   WHERE len(tk) >= 3
   UNION ALL
   SELECT doc_id, array_to_string(tk, ' ') FROM toks
   WHERE len(tk) < 3)"""

PAIRS_FROM_GRAMS_SQL = """
WITH sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, n_shared, n_union,
  (20000 * n_shared + n_union) // (2 * n_union) AS jaccard_x1e4
FROM (
  SELECT doc_a, doc_b, s AS n_shared, sa.n + sb.n - s AS n_union
  FROM shared JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b)
WHERE n_shared * 10 >= n_union * 3"""

QUAL_SQL = r"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntk
FROM documents"""


MIN_FACTOR = 2.0  # replication factor below which factorization buys nothing


def guard_factorized(con):
    """Refuse the factorized path when its replication premise fails.

    Returns the measured (n_docs, n_families) on success; exits loudly
    when the corpus is unreplicated/jittered (factor < MIN_FACTOR — the
    scale_up corpora run at 10/30/100x, a jittered or base corpus at
    ~1.0x) or when an md5 collision would corrupt the family algebra.
    """
    n_docs, n_fam, n_txt = con.sql(
        "SELECT count(*), count(DISTINCT md5(text)), count(DISTINCT text) "
        "FROM documents").fetchone()
    if n_fam != n_txt:
        sys.exit(f"guard: md5 collision — {n_fam} md5 families vs {n_txt} "
                 "distinct texts; the factorized family algebra would merge "
                 "distinct documents. Use --brute.")
    factor = n_docs / n_fam if n_fam else 0.0
    if factor < MIN_FACTOR:
        sys.exit(
            f"guard: corpus is not byte-identically replicated "
            f"({n_docs} docs / {n_fam} md5 families = {factor:.2f}x < "
            f"{MIN_FACTOR}x) — the factorized path would silently run the "
            "full O(n^2) brute build under its fast-path label. Re-run "
            "with --brute to opt into that cost consciously.")
    print(f"  guard: replication factor {factor:.1f}x "
          f"({n_docs} docs / {n_fam} families) — factorized path valid")
    return n_docs, n_fam


def build_pairs_brute(con):
    """The unfactorized O(n²) build — the original recipe, kept as the
    cross-validation path (and the only path for a corpus WITHOUT
    byte-identical replication)."""
    con.sql("CREATE OR REPLACE TEMP VIEW src AS "
            "SELECT doc_id, text FROM documents")
    con.sql(f"CREATE OR REPLACE TEMP TABLE g AS {GRAMS_SQL}")
    con.sql(f"CREATE TEMP TABLE nd_pairs AS {PAIRS_FROM_GRAMS_SQL}")


def build_pairs_factorized(con):
    """Exact factorized build: the pair relation over DISTINCT texts
    (md5-grouped), expanded by family membership. Identical texts have
    identical gram sets, so this is algebra, not approximation —
    --brute cross-validates it bit-for-bit at small SFs."""
    # families of byte-identical texts; rep = the family's min doc_id
    con.sql("""CREATE TEMP TABLE fam AS
        SELECT md5(text) AS fp, min(doc_id) AS rep, count(*) AS sz
        FROM documents GROUP BY md5(text)""")
    con.sql("""CREATE TEMP TABLE mem AS
        SELECT f.rep, d.doc_id FROM documents d
        JOIN fam f ON md5(d.text) = f.fp""")
    con.sql("""CREATE OR REPLACE TEMP VIEW src AS
        SELECT f.rep AS doc_id, d.text FROM fam f
        JOIN documents d ON d.doc_id = f.rep""")
    con.sql(f"CREATE OR REPLACE TEMP TABLE g AS {GRAMS_SQL}")
    con.sql(f"CREATE TEMP TABLE rep_pairs AS {PAIRS_FROM_GRAMS_SQL}")
    # gram-set size per representative (for the within-family J=1 rows)
    con.sql("""CREATE TEMP TABLE gsz AS
        SELECT doc_id AS rep, count(*) AS n FROM g GROUP BY doc_id""")
    # expand: cross-family near-dup pairs (one distinct pair -> a·b
    # member pairs) plus within-family exact-dup pairs (C(sz,2) at
    # n_shared = n_union, jaccard 10000)
    con.sql("""CREATE TEMP TABLE nd_pairs AS
        SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
               greatest(ma.doc_id, mb.doc_id) AS doc_b,
               p.n_shared, p.n_union, p.jaccard_x1e4
        FROM rep_pairs p
        JOIN mem ma ON ma.rep = p.doc_a
        JOIN mem mb ON mb.rep = p.doc_b
        UNION ALL
        SELECT ma.doc_id AS doc_a, mb.doc_id AS doc_b,
               gsz.n AS n_shared, gsz.n AS n_union,
               CAST(10000 AS BIGINT) AS jaccard_x1e4
        FROM fam f
        JOIN gsz ON gsz.rep = f.rep
        JOIN mem ma ON ma.rep = f.rep
        JOIN mem mb ON mb.rep = f.rep AND ma.doc_id < mb.doc_id
        WHERE f.sz >= 2""")


def min_label_cc(con, pairs_table, pairs_where, tag):
    """Converged min-label (node, l) temp table `lbl_<tag>` over the
    undirected pair graph `<pairs_table> WHERE <pairs_where>` — the
    Python fixpoint twin of Dedup.minLabelCteSql's unrolled rounds."""
    con.sql(f"""CREATE OR REPLACE TEMP TABLE edges_{tag} AS
        SELECT doc_a AS src, doc_b AS dst FROM {pairs_table}
        WHERE {pairs_where}
        UNION ALL
        SELECT doc_b, doc_a FROM {pairs_table} WHERE {pairs_where}
        UNION ALL
        SELECT DISTINCT src, src FROM (
          SELECT doc_a AS src FROM {pairs_table} WHERE {pairs_where}
          UNION ALL
          SELECT doc_b FROM {pairs_table} WHERE {pairs_where})""")
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


def downstream_queries():
    """query name -> SQL over `eff_pairs` (the layer-(a-c)-verified d04
    relation), `qual`, and the `lbl_e<tau>` labelings built from it."""
    return {
        "d12_threshold_curve": """
            WITH th AS (SELECT CAST(UNNEST(range(3, 10)) AS BIGINT)
                          AS threshold_x10),
            at AS (SELECT threshold_x10, doc_a, doc_b FROM eff_pairs, th
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
            FROM lbl_e3 GROUP BY l ORDER BY cluster_id""",
        "d15_neardup_survivor": """
            WITH ranked AS (
              SELECT lbl.l, lbl.node, qual.ntk,
                row_number() OVER (PARTITION BY lbl.l
                  ORDER BY qual.ntk DESC, lbl.node) AS q_rn,
                row_number() OVER (PARTITION BY lbl.l ORDER BY lbl.node)
                  AS n_rn,
                count(*) OVER (PARTITION BY lbl.l) AS n_members
              FROM lbl_e3 lbl JOIN qual ON lbl.node = qual.doc_id)
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
                f"FROM lbl_e{t}" for t in D16_THRESHOLDS)),
    }


def selftest():
    """Guard + factorization invariants over synthetic corpora:
    1. replicated corpus -> guard ADMITS; factorized == brute pair-set;
    2. jittered corpus (every near-dup textually unique) -> guard
       REFUSES the factorized path; brute still builds.
    """
    texts = ["alpha beta gamma delta epsilon", "alpha beta gamma delta zeta",
             "one two three four five six", "totally unrelated words here now",
             "red green blue cyan magenta yellow"]

    def corpus(con, rows):
        con.sql("CREATE OR REPLACE TEMP TABLE documents AS SELECT * FROM ("
                + " UNION ALL ".join(
                    f"SELECT CAST({i} AS BIGINT) AS doc_id, '{t}' AS text"
                    for i, t in rows) + ")")

    def pairset(con, builder):
        for t in ("nd_pairs", "fam", "mem", "rep_pairs", "gsz", "g"):
            con.sql(f"DROP TABLE IF EXISTS {t}")
        builder(con)
        return set(con.sql("SELECT * FROM nd_pairs").fetchall())

    # 1. replicated: 5 distinct texts x 5 byte-identical copies
    con = duckdb.connect()
    corpus(con, [(f * 5 + i, t) for i, t in enumerate(texts)
                 for f in range(5)])
    guard_factorized(con)  # must admit at factor 5.0
    fact = pairset(con, build_pairs_factorized)
    brute = pairset(con, build_pairs_brute)
    assert fact == brute, (
        f"factorized != brute on replicated corpus: "
        f"only-fact={sorted(fact - brute)[:3]} "
        f"only-brute={sorted(brute - fact)[:3]}")
    assert fact, "replicated corpus produced no pairs (near-dup seed broken)"
    print(f"OK    selftest replicated: guard admits at 5.0x, "
          f"factorized == brute ({len(fact)} pairs)")

    # 2. jittered: same families but every member textually unique
    con2 = duckdb.connect()
    corpus(con2, [(f * 5 + i, f"{t} jitter{f}") for i, t in enumerate(texts)
                  for f in range(5)])
    try:
        guard_factorized(con2)
        sys.exit("FAIL  selftest: guard ADMITTED a jittered corpus")
    except SystemExit as e:
        if "not byte-identically replicated" not in str(e.code):
            raise
        print("OK    selftest jittered: guard refuses the factorized path "
              f"({str(e.code).split(' — ')[0]})")
    jb = pairset(con2, build_pairs_brute)
    assert jb, "brute build over the jittered corpus produced no pairs"
    print(f"OK    selftest jittered: --brute proceeds ({len(jb)} pairs)")
    print("\nALL GREEN (selftest)")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
    brute = "--brute" in sys.argv

    con = duckdb.connect()
    con.sql("PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    con.sql(f"CREATE TEMP TABLE qual AS {QUAL_SQL}")

    t0 = time.time()
    print(f"building nd_pairs ({'brute' if brute else 'factorized'})...")
    if not brute:
        guard_factorized(con)
    (build_pairs_brute if brute else build_pairs_factorized)(con)
    n_exact = con.sql("SELECT count(*) FROM nd_pairs").fetchone()[0]
    print(f"  nd_pairs: {n_exact} exact pairs in {time.time() - t0:.1f}s")

    failures = []

    # ---- layer (a-c): d04 vs the exact relation on its declared domain
    con.sql(f"""CREATE TEMP TABLE spark_d04 AS
        SELECT doc_a, doc_b, n_shared, n_union, jaccard_x1e4
        FROM '{out_dir}/d04_ngram_jaccard/*.parquet'""")
    n_spark = con.sql("SELECT count(*) FROM spark_d04").fetchone()[0]
    false_pairs = con.sql("""SELECT count(*) FROM spark_d04 s
        LEFT JOIN nd_pairs e USING (doc_a, doc_b, n_shared, n_union,
                                    jaccard_x1e4)
        WHERE e.doc_a IS NULL""").fetchone()[0]
    if false_pairs:
        failures.append(f"d04: {false_pairs} Spark pairs absent from the "
                        "exact relation (false positives)")
    # oracle components over the FULL exact relation -> per-node comp size
    min_label_cc(con, "nd_pairs", "TRUE", "full")
    con.sql("""CREATE TEMP TABLE csize AS
        SELECT node, count(*) OVER (PARTITION BY l) AS comp_sz
        FROM lbl_full""")
    missing = con.sql("""SELECT e.doc_a, e.doc_b FROM nd_pairs e
        LEFT JOIN spark_d04 s USING (doc_a, doc_b)
        WHERE s.doc_a IS NULL""").fetchall()
    miss_outside = con.sql(f"""SELECT count(*) FROM nd_pairs e
        LEFT JOIN spark_d04 s USING (doc_a, doc_b)
        JOIN csize c ON c.node = e.doc_a
        WHERE s.doc_a IS NULL AND c.comp_sz <= {MAX_BUCKET}""").fetchone()[0]
    if miss_outside:
        failures.append(f"d04: {miss_outside} pairs missing INSIDE the "
                        f"declared (comp<= {MAX_BUCKET}) domain — a real "
                        "recall bug, not the hot-bucket contract")
    hot_comps = con.sql(f"""SELECT count(DISTINCT l) FROM (
        SELECT l, count(*) AS n FROM lbl_full GROUP BY l) WHERE n >
        {MAX_BUCKET}""").fetchone()[0]
    # the declared domain's MASS: a sweep where this is ~0 (every
    # replication family over the cap, e.g. factor-100 sf10) proves the
    # contract holds but carries little exact-recall signal — say so
    # instead of letting "ALL GREEN" read as full coverage
    in_domain = con.sql(f"""SELECT count(*) FROM nd_pairs e
        JOIN csize c ON c.node = e.doc_a
        WHERE c.comp_sz <= {MAX_BUCKET}""").fetchone()[0]
    print((f"OK    d04 layered: spark={n_spark} exact={n_exact} "
           f"in-domain={in_domain} missing={len(missing)} (all inside the "
           f"{hot_comps} >{MAX_BUCKET}-member components = the documented "
           f"MaxBucket contract), 0 false pairs, 0 in-domain misses"
           if not failures else
           f"FAIL  d04 layered: {failures[-1]}"))
    if in_domain < n_exact // 10:
        print(f"NOTE  d04 declared domain holds only {in_domain} of "
              f"{n_exact} exact pairs at this replication factor — the "
              "contract checks (containment, no false pairs) still bite, "
              "but exact-recall signal here is thin; sf3 is the deepest "
              "SF where the domain carries the bulk of the relation")

    # ---- layer (d): downstream twins recomputed from the VERIFIED d04
    # relation (d06/d15/d16 engine-side all derive from the same
    # verified-pair checkpoint, so this gates the clustering /
    # survivorship / rollup logic at full scale)
    con.sql("CREATE TEMP TABLE eff_pairs AS SELECT * FROM spark_d04")
    for tau in D16_THRESHOLDS:
        min_label_cc(con, "eff_pairs",
                     f"n_shared * 10 >= n_union * {tau}", f"e{tau}")
    for name, sql in downstream_queries().items():
        tq = time.time()
        oracle = con.sql(sql)
        cols = oracle.columns
        orows = sorted(oracle.fetchall(), key=lambda r: tuple(map(str, r)))
        srows = sorted(con.sql(
            "SELECT " + ", ".join(cols) +
            f" FROM '{out_dir}/{name}/*.parquet'").fetchall(),
            key=lambda r: tuple(map(str, r)))
        if orows == srows:
            print(f"OK    {name} ({len(orows)} rows, {time.time() - tq:.1f}s)")
        else:
            diff = set(orows) ^ set(srows)
            failures.append(name)
            print(f"FAIL  {name}: oracle={len(orows)} spark={len(srows)} "
                  f"rows; first differing: {sorted(diff, key=str)[:3]}")

    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + str(failures)}"
          f" (total {time.time() - t0:.1f}s)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
