#!/usr/bin/env python3
"""Full-suite 10x-scale oracle sweep: replay every gate's oracle SQL in
DuckDB at sf0.1 and hash-compare against the engine output written by
`graft.Verify /root/testdata/sf0.1 <outDir>`.

Several sf0.01 oracles are DELIBERATE brute force (all-pairs levenshtein,
recursive-CTE closures) and quadratic in DuckDB by design; at sf0.1 those
get a scale-safe twin from scripts/oracle_sf01_overrides.json — a
block-restricted / invariant-checking replay that verifies the same engine
output without the cross product. Overridden gates are marked
`"oracle": "sf01-twin"` in the artifact so the evidence self-describes.

Every oracle runs under a wall-clock timeout (DuckDB interrupt): a
timed-out ORIGINAL oracle is a finding ("needs a twin"), recorded as
`err: timeout`, never a silent skip.

Usage: sweep_sf01.py <sfDir> <outDir> [artifact.json] [query ...]
"""
import sys, json, glob, hashlib, threading, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
TIMEOUT_S = float(__import__("os").environ.get("SWEEP_TIMEOUT_S", "120"))


def _cell(v) -> str:
    if isinstance(v, float):
        return "%.10g" % v
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return ",".join(str(x) for x in v)
    return str(v)


def canon(df: pd.DataFrame) -> str:
    # ROW-SORTED multiset hash: multi-part engine outputs arrive in
    # arbitrary glob/concat order, so row-order-sensitive hashing would
    # false-FAIL a correct result. Both sides canon the same way.
    df = df.reindex(sorted(df.columns), axis=1)
    rows = ["\x00".join(_cell(v) for v in rec)
            for rec in df.itertuples(index=False, name=None)]
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(r.encode())
        h.update(b"\x01")
    return h.hexdigest()


def run_with_timeout(con, sql, timeout_s):
    done = threading.Event()

    def interrupter():
        if not done.wait(timeout_s):
            try:
                con.interrupt()
            except Exception:
                pass

    t = threading.Thread(target=interrupter, daemon=True)
    t.start()
    try:
        return con.execute(sql).df(), None
    except Exception as e:
        msg = str(e)
        if "INTERRUPT" in msg.upper():
            return None, "timeout"
        return None, msg[:300]
    finally:
        done.set()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    artifact = sys.argv[3] if len(sys.argv) > 3 else None
    only = set(sys.argv[4:])
    con = duckdb.connect()
    # bound DuckDB so a heavy twin spills to temp instead of OOM-killing
    # the shard (SWEEP_MEM, e.g. "48GB"), and pin the spill location
    mem = __import__("os").environ.get("SWEEP_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        overrides = json.load(
            open(f"{__import__('os').path.dirname(__file__)}/oracle_sf01_overrides.json"))
    except FileNotFoundError:
        overrides = {}
    results = {}
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING  {name} (no engine output)")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": "no engine output"}
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        sql = overrides.get(name, oracle[name])
        src = "sf01-twin" if name in overrides else "original"
        if name in overrides:
            # the twin may address aux files; resolve the tag like Verify does
            sql = sql.replace("{SF}", sf_dir.rstrip("/").split("/")[-1])
        t0 = time.time()
        odf, err = run_with_timeout(con, sql, TIMEOUT_S)
        dt = time.time() - t0
        if err:
            print(f"ERR      {name} [{src}] {dt:.1f}s: {err}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "oracle": src,
                             "sec": round(dt, 1), "err": err}
            n_fail += 1
            continue
        rows_match = len(spark_df) == len(odf)
        schema_match = sorted(spark_df.columns) == sorted(odf.columns)
        hash_match = rows_match and schema_match and canon(spark_df) == canon(odf)
        ok = rows_match and schema_match and hash_match
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(spark_df),
            "oracle_rows": len(odf), "oracle": src, "sec": round(dt, 1),
            "err": None}
        if ok:
            n_pass += 1
            print(f"PASS     {name} [{src}] ({len(spark_df)} rows, {dt:.1f}s)")
        else:
            n_fail += 1
            if not rows_match:
                print(f"FAIL     {name} [{src}] rows {len(spark_df)} vs {len(odf)}")
            elif not schema_match:
                print(f"FAIL     {name} [{src}] schema "
                      f"{sorted(spark_df.columns)} vs {sorted(odf.columns)}")
            else:
                # locate first differing cell for debugging
                def _sorted_rows(d):
                    d = d.reindex(sorted(d.columns), axis=1)
                    key = ["\x00".join(_cell(v) for v in rec)
                           for rec in d.itertuples(index=False, name=None)]
                    return d.iloc[pd.Series(key).argsort(kind="stable")] \
                        .reset_index(drop=True)
                a = _sorted_rows(spark_df)
                b = _sorted_rows(odf)
                diff = None
                for c in a.columns:
                    for i in range(min(len(a), 50000)):
                        va, vb = a[c].iloc[i], b[c].iloc[i]
                        sa = "%.10g" % va if isinstance(va, float) else str(va)
                        sb = "%.10g" % vb if isinstance(vb, float) else str(vb)
                        if sa != sb:
                            diff = (c, i, sa, sb)
                            break
                    if diff:
                        break
                print(f"FAIL     {name} [{src}] hash; first diff {diff}")
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({sum(1 for r in results.values() if r.get('oracle') == 'sf01-twin')} twins)")
    if artifact:
        with open(artifact, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
