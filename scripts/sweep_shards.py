#!/usr/bin/env python3
"""Shard-parallel wrapper around sweep_sf01.py (driver-side tooling).

The sf1 oracle sweep is DuckDB-bound and serial per connection; the five
doc-pair twins each take minutes at 10x sf0.1 while the other ~300 oracles
take seconds. Sharding heavy twins into their own processes overlaps them
with the cheap tail instead of serializing ~30 min of lambda-heavy SQL.

Usage: sweep_shards.py <sfDir> <outDir> <artifact.json> [nCheap]
Shards: one process per HEAVY gate + nCheap processes for the rest,
then merges the per-shard artifacts into <artifact.json>.
"""
import json, os, subprocess, sys, tempfile

HEAVY = ["q_doc_fuzzy_keep", "q_label_spread", "q_set_sim_join",
         "q_doc_incremental_neardup", "q_doc_ngram_jaccard",
         "q_doc_containment"]

def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    n_cheap = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    here = os.path.dirname(os.path.abspath(__file__))
    sweep = os.path.join(here, "sweep_sf01.py")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    heavy = [n for n in HEAVY if n in names]
    cheap = [n for n in names if n not in HEAVY]
    shards = [[n] for n in heavy]
    for i in range(n_cheap):
        shards.append(cheap[i::n_cheap])
    tmp = tempfile.mkdtemp(prefix="sweep_shards_")
    procs = []
    for i, qs in enumerate(shards):
        if not qs:
            continue
        art = f"{tmp}/shard_{i}.json"
        log = open(f"{tmp}/shard_{i}.log", "w")
        procs.append((art, subprocess.Popen(
            [sys.executable, sweep, sf_dir, out_dir, art] + qs,
            stdout=log, stderr=subprocess.STDOUT)))
    merged, rc = {}, 0
    for art, p in procs:
        p.wait()
        try:
            merged.update(json.load(open(art)))
        except FileNotFoundError:
            print(f"shard died without artifact: {art} (rc={p.returncode})")
            rc = 1
    # a shard exits 1 on any FAIL; surface it after merging everything
    rc = max([rc] + [min(p.returncode, 1) for _, p in procs])
    missing = [n for n in names if n not in merged]
    if missing:
        print(f"MISSING from merge: {missing}")
        rc = 1
    n_pass = sum(1 for r in merged.values()
                 if r.get("rows_match") and r.get("schema_match")
                 and r.get("hash_match"))
    with open(artifact, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"{n_pass} pass / {len(merged)} total -> {artifact} "
          f"(shard logs in {tmp})")
    sys.exit(rc)

if __name__ == "__main__":
    main()
