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

Usage: scale_up.py SRC_DIR DST_DIR FACTOR
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


def main(src, dst, factor):
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
                c = tbl
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
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
