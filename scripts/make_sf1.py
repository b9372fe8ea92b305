#!/usr/bin/env python3
"""Synthesize a ~sf1 dataset as 10 id-remapped copies of sf0.1 (driver-side
tooling, not engine code). Key columns shift by k*(max+1) per copy so key
cardinalities, per-key group sizes, and join fanouts scale like real data
(naive row duplication would multiply per-key fanout instead). Dimension
tables (region, nation) stay as-is — they are referenced by key.

Usage: make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [copies=10]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to shift by k*(max+1) of THAT column
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for name, cols in SHIFT.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if not cols:
            pq.write_table(t, f"{DST}/{name}.parquet")
            print(f"{name}: copied ({t.num_rows})")
            continue
        strides = {c: pc.max(t[c]).as_py() + 1 for c in cols}
        parts = []
        for k in range(K):
            if k == 0:
                parts.append(t)
                continue
            arrays = []
            for c in t.column_names:
                if c in cols:
                    arrays.append(pc.add(t[c], k * strides[c]))
                else:
                    arrays.append(t[c])
            parts.append(pa.table(arrays, names=t.column_names))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
