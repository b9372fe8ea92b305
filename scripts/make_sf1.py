#!/usr/bin/env python3
"""Synthesize a ~sf1 dataset as 10 id-remapped copies of sf0.1 (driver-side
tooling, not engine code). Key columns shift by k*(max+1) per copy so key
cardinalities, per-key group sizes, and join fanouts scale like real data
(naive row duplication would multiply per-key fanout instead). Dimension
tables (region, nation) stay as-is — they are referenced by key.

CONTENT VARIATION: verbatim-copied text made every similarity operator see
a 10-exact-duplicate corpus — true pairs grew ~100x under 10x rows, which
no real corpus does. Copies k >= 1 now get deterministic perturbation:
 - documents.text: ~5% of words dropped, seeded by (doc_id, k), so copies
   form NEAR-duplicate families (J ~ 0.9) with a realistic mix;
   n_chars is recomputed to keep the n_chars == len(text) invariant.
 - supplier/customer/part name columns: HALF the copies keep the exact
   name, half get one char deleted at a key-dependent position — the
   exact-copy + typo-twin mix an entity-resolution pass sees in practice.
Seeding is numpy default_rng(key*31 + k) / pure-arithmetic positions: the
same invocation always rebuilds the identical dataset.

Usage: make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [copies=10]
"""
import sys
import numpy as np
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

# table -> (key column, name column) for the typo perturbation
NAME_PERTURB = {
    "supplier": ("s_suppkey", "s_name"),
    "customer": ("c_custkey", "c_name"),
    "part": ("p_partkey", "p_name"),
}


def perturb_doc_text(texts, keys, k):
    """Drop ~5% of words per text, seeded by (original doc_id, copy k)."""
    out = []
    for key, t in zip(keys, texts):
        words = t.split(" ")
        if len(words) < 4:
            out.append(t)
            continue
        rng = np.random.default_rng(int(key) * 31 + k)
        keep = rng.random(len(words)) >= 0.05
        kept = [w for w, m in zip(words, keep) if m]
        out.append(" ".join(kept) if kept else t)
    return out


def perturb_name(names, keys, k):
    """Half the copies exact, half one-char-deleted at a key-seeded pos."""
    out = []
    for key, nm in zip(keys, names):
        if (int(key) + k) % 2 == 0 or len(nm) < 3:
            out.append(nm)
        else:
            pos = (int(key) * 7 + k) % (len(nm) - 2) + 1
            out.append(nm[:pos] + nm[pos + 1:])
    return out


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
            data = {}
            for c in t.column_names:
                if c in cols:
                    data[c] = pc.add(t[c], k * strides[c])
                else:
                    data[c] = t[c]
            if name == "documents":
                keys = t["doc_id"].to_pylist()
                texts = perturb_doc_text(t["text"].to_pylist(), keys, k)
                data["text"] = pa.array(texts, type=pa.string())
                data["n_chars"] = pa.array(
                    [len(x) for x in texts],
                    type=t.schema.field("n_chars").type)
            elif name in NAME_PERTURB:
                kc, nc = NAME_PERTURB[name]
                data[nc] = pa.array(
                    perturb_name(t[nc].to_pylist(), t[kc].to_pylist(), k),
                    type=pa.string())
            parts.append(pa.table([data[c] for c in t.column_names],
                                  names=t.column_names))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
