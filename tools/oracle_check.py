#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [timeout_sec]

For each <name> dir in verifyOutDir: load spark result parquet, run
oracle_sql.json[name] in DuckDB over the sfDir tables, sort columns by
name, sort rows, compare values.

Each oracle runs under a per-query wall-clock timeout (default 180 s —
the slowest legitimate oracle, q_curation_funnel's composed-pipeline
replay, runs ~45 s idle and must survive a contended box): a hanging
oracle (e.g. an exponentially-inlined CTE chain) produces ONE printed
FAIL and the harness moves on with a fresh connection — it can never
zero out the whole run.
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TIMEOUT = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0

def fresh_con():
    c = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c

con = fresh_con()

def run_bounded(sql):
    """Run sql with a wall-clock bound. Returns (df, err). On timeout,
    interrupt the connection; if the worker still doesn't return
    (e.g. stuck in planning), abandon the daemon thread and swap in a
    fresh connection so later queries are unaffected."""
    global con
    box = {}
    my_con = con
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
            con = fresh_con()  # abandon the stuck thread + connection
        return None, f"timeout after {TIMEOUT:.0f}s"
    if "err" in box:
        return None, box["err"]
    return box.get("df"), None

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    files = glob.glob(f"{res_dir}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    duck_df, err = run_bounded(sql)
    if err is not None:
        print(f"FAIL {name}: duckdb error: {err}"); fails += 1; continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        return df
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fails += 1; continue
    mismatch = False
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if str(sv.dtype).startswith(("float", "Float")) or str(dv.dtype).startswith(("float", "Float")):
                import numpy as np
                eq = np.allclose(sv.astype(float), dv.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                eq = sv.astype(str).equals(dv.astype(str))
        except Exception as e:
            print(f"  col {c} compare error: {e}"); eq = False
        if not eq:
            mismatch = True
            print(f"FAIL {name}: col {c} differs")
            print("   spark:", sv.head(5).tolist())
            print("   duck: ", dv.head(5).tolist())
    if not mismatch:
        print(f"OK   {name} ({len(s)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
