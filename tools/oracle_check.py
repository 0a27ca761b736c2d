#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [timeout_sec] [workers]

For each <name> dir in verifyOutDir: load spark result parquet, run
oracle_sql.json[name] in DuckDB over the sfDir tables, sort columns by
name, sort rows, compare values.

Each oracle runs under a per-query wall-clock timeout (default 180 s —
the slowest legitimate oracle, q_curation_funnel's composed-pipeline
replay, runs ~45 s idle and must survive a contended box): a hanging
oracle (e.g. an exponentially-inlined CTE chain) produces ONE printed
FAIL and the worker moves on with a fresh connection — it can never
zero out the whole run.

Queries shard across a PROCESS pool (default 8 workers, each with its
own DuckDB connection over the same parquet views) — the full compare
is embarrassingly parallel and was the slowest gate stage serial.
Results print in sorted-name order regardless of completion order, so
logs stay diffable.
"""
import sys, json, glob, os, threading
from concurrent.futures import ProcessPoolExecutor

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TIMEOUT = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8

_con = None


def fresh_con():
    import duckdb
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def run_bounded(sql):
    """Run sql with a wall-clock bound on this worker's connection.
    Returns (df, err). On timeout, interrupt; if the thread still
    doesn't return (e.g. stuck in planning), abandon it and swap in a
    fresh connection so the worker's later queries are unaffected."""
    global _con
    if _con is None:
        _con = fresh_con()
    box = {}
    my_con = _con

    def work():
        try:
            box["df"] = my_con.execute(sql).df()
        except Exception as e:
            box["err"] = str(e)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(TIMEOUT)
    if th.is_alive():
        try:
            my_con.interrupt()
        except Exception:
            pass
        th.join(10)
        if th.is_alive():
            _con = fresh_con()  # abandon the stuck thread + connection
        return None, f"timeout after {TIMEOUT:.0f}s"
    if "err" in box:
        return None, box["err"]
    return box.get("df"), None


def check_one(item):
    """(name, sql) -> (name, ok, lines_to_print)."""
    import pandas as pd
    name, sql = item
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        return name, False, [f"FAIL {name}: no spark result dir"]
    files = glob.glob(f"{res_dir}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    duck_df, err = run_bounded(sql)
    if err is not None:
        return name, False, [f"FAIL {name}: duckdb error: {err}"]

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        return name, False, [
            f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return name, False, [f"FAIL {name}: rows spark={len(s)} duck={len(d)}"]
    out = []
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if str(sv.dtype).startswith(("float", "Float")) or \
               str(dv.dtype).startswith(("float", "Float")):
                import numpy as np
                eq = np.allclose(sv.astype(float), dv.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
            else:
                eq = sv.astype(str).equals(dv.astype(str))
        except Exception as e:
            out.append(f"  col {c} compare error: {e}")
            eq = False
        if not eq:
            out.append(f"FAIL {name}: col {c} differs")
            out.append(f"   spark: {sv.head(5).tolist()}")
            out.append(f"   duck:  {dv.head(5).tolist()}")
    if out:
        return name, False, out
    return name, True, [f"OK   {name} ({len(s)} rows)"]


def main():
    oracles = sorted(json.load(open(f"{out_dir}/oracle_sql.json")).items())
    results = {}
    if WORKERS <= 1:
        for item in oracles:
            name, ok, lines = check_one(item)
            results[name] = (ok, lines)
    else:
        with ProcessPoolExecutor(max_workers=WORKERS) as pool:
            for name, ok, lines in pool.map(check_one, oracles):
                results[name] = (ok, lines)
    fails = 0
    for name, _ in oracles:
        ok, lines = results[name]
        print("\n".join(lines))
        if not ok:
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
