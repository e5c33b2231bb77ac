#!/usr/bin/env python3
"""Scale a graft testdata dir by an integer factor with referential
integrity preserved: every copy shifts each key space (custkey, orderkey,
partkey, suppkey, event_id, doc_id, vec_id) by copy_index * (max_key + 1),
consistently across the tables that reference it, so joins behave exactly
as at the base SF while fact volume grows by the factor. The dimension
tables (region, nation) are NOT replicated — copies keep referencing the
original 25 nations / 5 regions, matching how a warehouse actually grows
(facts scale, dims don't). Payload columns (text, embeddings, timestamps)
are byte-identical across copies: exact-duplicate documents/vectors are
the realistic web-scale duplication load for the dedup/ANN operators.

Round 10: PLANTED NEAR-DUPS. Byte-identical document copies are d01's
(exact-dup) load; at factor >= 65 every LSH bucket of an exact-dup
family exceeds the engines' MaxBucket=64 hot-bucket gate and is
(correctly) dropped, which made the sf10 d02/d07 pair-mass compare
vacuous (0 pairs, round-9 verdict item 5). So for a deterministic set
of base docs (doc_id % 100 == 7 AND >= 60 tokens; 21 docs at sf0.1),
copies 0 and 1 are rewritten as a pure function of the base doc_id:
  - every 3rd token (positions 2, 5, 8, ...) becomes the salt
    nd<doc>, so no token trigram survives against the UNCHANGED
    copies (>= 2..factor-1) -> the pair is far from the exact-dup
    family and lands in its own size-2 buckets at any factor;
  - position 0 becomes m0 in copy 0 and m1 in copy 1, so the pair
    differs in exactly ONE token -> exact 3-gram Jaccard
    (n-5)/(n+1) >= 0.9 at n >= 60: a genuine HIGH-J near-dup the
    banded candidate paths must recover.
J >= 0.9 is deliberate: it keeps the d04/d12/d16 exact-all-pairs
oracles inside the documented banding-recall class (miss odds
(1-J^4)^8 <= 2e-4/pair; a first attempt with mid-J 4-member groups
measurably broke d04 at sf1 with 2 missed pairs). The >= 0.9 pairs
also survive every d16 threshold leg ((n-5)*10 >= (n+1)*9 iff
n >= 59). Both engines read the same parquet, so every oracle
recomputes over the planted corpus; nothing downstream assumes
copy-0 text equals the base corpus.

Round 13: CAPPED-CLUSTER documents mode (--dedup-domain). At factor
> MaxBucket=64 every exact-dup family exceeds the engines' hot-bucket
gate, so d04's declared domain (components <= 64) collapses — at
factor 100 it holds 21 pairs and the full-decade exact-recall signal
for the d04 family is thin (round-12 verdict task 5). With
--dedup-domain the documents copies are partitioned into text groups
of GROUP_CAP=50: group g = copy_index // 50, and every copy in group
g >= 1 has its every-3rd token (positions 2, 5, 8, ...) replaced by
the per-(group, base-doc) salt g<g>d<doc>. Every 3-gram contains one
position = 2 mod 3, so a salted copy shares ZERO trigrams with other
groups of the same doc, with its own group-0 original, and with every
other doc's salted copies (the salt is doc-unique) — groups are
byte-identical 50-member families in their own <= 64 components, the
declared domain covers the whole relation at ANY factor, and the
factorized oracle build stays valid (50x replication within groups).
Only the documents table changes; every other table scales as before.
This corpus is for the dedup-family oracle sweep, NOT a replacement
for the standard scaled corpus.

Usage: scale_up.py SRC_DIR DST_DIR FACTOR [--dedup-domain]
e.g.:  python3 tools/scale_up.py /root/testdata/sf0.1 /tmp/testdata/sf1 10

Schema fidelity matters (the driver's oracle hashes typed values):
timestamp[ns] (events.ts) and timestamp[ms] (orders/lineitem dates) are
preserved via parquet format 2.6 with no timestamp coercion. Row groups
cap at 1M rows so scaled tables exercise multi-row-group scan paths.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# table -> {key column -> key space}
OFFSETS = {
    "customer":   {"c_custkey": "cust"},
    "supplier":   {"s_suppkey": "supp"},
    "part":       {"p_partkey": "part"},
    "orders":     {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem":   {"l_orderkey": "ord", "l_partkey": "part",
                   "l_suppkey": "supp"},
    "events":     {"event_id": "event", "user_id": "cust"},
    "documents":  {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


PLANT_MOD = 100
PLANT_RESIDUE = 7
PLANT_MIN_TOKENS = 60

# --dedup-domain: byte-identical replication caps at GROUP_CAP members
# per text group, keeping every exact-dup component inside the engines'
# MaxBucket=64 declared domain at any factor (margin for the planted
# copies detaching from group 0)
GROUP_CAP = 50


def group_salt_text(text, base_doc_id, group):
    """Rewrite one --dedup-domain copy for text group `group` (>= 1):
    every 3rd token becomes the per-(group, doc) salt, so the copy
    shares no 3-gram with any other group or any other document."""
    toks = text.split()
    if not toks:
        return f"g{group}d{base_doc_id}"
    out = list(toks)
    for p in range(2, len(out), 3):
        out[p] = f"g{group}d{base_doc_id}"
    if len(out) < 3:
        # short-doc gram fallback is the whole text: salt it directly
        out[0] = f"g{group}d{base_doc_id}"
    return " ".join(out)


def group_salt_documents(tbl, copy):
    """Apply the --dedup-domain group salt to one copy (after the
    near-dup plant, before key offsetting). Group 0 keeps the original
    (plus planted) texts."""
    group = copy // GROUP_CAP
    if group == 0:
        return tbl
    idx = tbl.schema.get_field_index("text")
    field = tbl.schema.field("text")
    new_text = pa.array(
        [group_salt_text(t, d, group)
         for d, t in zip(tbl["doc_id"].to_pylist(),
                         tbl["text"].to_pylist())],
        type=field.type)
    return tbl.set_column(idx, field, new_text)


def plant_text(text, base_doc_id, copy):
    """Deterministic near-dup rewrite of one planted doc copy (see module
    docstring). Only copies 0 and 1 are rewritten; the pair differs in
    exactly one token (position 0), giving exact 3-gram Jaccard
    (n-5)/(n+1) >= 0.9 at the >= 60-token eligibility floor."""
    toks = text.split()
    if copy > 1 or len(toks) < PLANT_MIN_TOKENS:
        return text
    out = list(toks)
    for p in range(2, len(out), 3):
        out[p] = f"nd{base_doc_id}"
    out[0] = f"m{copy}"
    return " ".join(out)


def plant_documents(tbl, copy):
    """Apply the near-dup plant to one copy of the base documents table
    (before key offsetting). Planted rows move to the end of the copy --
    parquet row order carries no semantics here."""
    if copy > 1:
        return tbl
    doc_ids = tbl["doc_id"]
    mask = pc.equal(
        pc.subtract(doc_ids,
                    pc.multiply(pc.divide(doc_ids, PLANT_MOD), PLANT_MOD)),
        PLANT_RESIDUE)
    planted = tbl.filter(mask)
    rest = tbl.filter(pc.invert(mask))
    if planted.num_rows == 0:
        return tbl
    idx = planted.schema.get_field_index("text")
    field = planted.schema.field("text")
    new_text = pa.array(
        [plant_text(t, d, copy)
         for d, t in zip(planted["doc_id"].to_pylist(),
                         planted["text"].to_pylist())],
        type=field.type)
    planted = planted.set_column(idx, field, new_text)
    return pa.concat_tables([rest, planted])


def main(src, dst, factor, dedup_domain=False):
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet"))
              for t in TABLES}
    stride = {
        "cust": pc.max(tables["customer"]["c_custkey"]).as_py() + 1,
        "ord": pc.max(tables["orders"]["o_orderkey"]).as_py() + 1,
        "part": pc.max(tables["part"]["p_partkey"]).as_py() + 1,
        "supp": pc.max(tables["supplier"]["s_suppkey"]).as_py() + 1,
        "event": pc.max(tables["events"]["event_id"]).as_py() + 1,
        "doc": pc.max(tables["documents"]["doc_id"]).as_py() + 1,
        "vec": pc.max(tables["embeddings"]["vec_id"]).as_py() + 1,
    }
    for t in TABLES:
        tbl = tables[t]
        if t in ("region", "nation"):
            out = tbl
        else:
            copies = []
            for i in range(factor):
                c = plant_documents(tbl, i) if t == "documents" else tbl
                if t == "documents" and dedup_domain:
                    c = group_salt_documents(c, i)
                for col, space in OFFSETS[t].items():
                    idx = c.schema.get_field_index(col)
                    field = c.schema.field(col)
                    shifted = pc.add(c[col], i * stride[space]).cast(field.type)
                    c = c.set_column(idx, field, shifted)
                copies.append(c)
            out = pa.concat_tables(copies)
        pq.write_table(
            out, os.path.join(dst, f"{t}.parquet"),
            compression="snappy", version="2.6", coerce_timestamps=None,
            row_group_size=1_000_000)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 3 or set(flags) - {"--dedup-domain"}:
        sys.exit(__doc__)
    main(args[0], args[1], int(args[2]), "--dedup-domain" in flags)
